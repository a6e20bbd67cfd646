"""Multimodal plumbing: frame sampling (1→N mapInPandas fan-out),
payload resize (media-layout-preserving transform), decode stub."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from timebox_spark.operators import multimodal
from timebox_spark.plans.tables import load


def _media(spark):
    return multimodal.to_media_table(load(spark, SF_SMOKE, "documents"))


def test_sample_frames_reconstructs_payload(spark):
    media = _media(spark).filter("doc_id < 5")
    src = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    frames = multimodal.sample_frames(media, frame_bytes=64, every_n=1).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        b = src[doc_id]
        rows.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
        assert sum(r["n_bytes"] for r in rows) == len(b)
        assert rows[0]["byte_sum_mod"] == sum(b[:64]) % 2147483647


def test_sample_frames_every_n_skips(spark):
    media = _media(spark).filter("doc_id < 5")
    every4 = multimodal.sample_frames(media, frame_bytes=64, every_n=4).collect()
    assert every4 and all(r["frame_idx"] % 4 == 0 for r in every4)


def test_resize_payload_keeps_media_layout(spark):
    media = _media(spark).filter("doc_id < 20")
    resized = multimodal.resize_payload(media, target_bytes=128)
    assert resized.schema == multimodal.MEDIA_SCHEMA
    for r in resized.collect():
        n = len(bytes(r["payload"]))
        assert n <= 128
        assert r["meta"]["n_bytes"] == n
        assert r["meta"]["format"] == "text/plain"
    # resize composes with downstream feature extraction
    feats = multimodal.fake_decode_features(resized)
    assert feats.count() == media.count()


def test_compressed_codecs_still_raise():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_bmp_ppm_roundtrip_exact():
    import numpy as np

    rng = np.random.default_rng(7)
    # odd widths exercise BMP row padding; 1-pixel edge cases too
    for h, w in [(1, 1), (3, 5), (16, 7), (9, 16)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(multimodal.decode_image(multimodal.encode_bmp(px)), px)
        assert np.array_equal(multimodal.decode_image(multimodal.encode_ppm(px)), px)


def test_ppm_header_comments():
    import numpy as np

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    raw = multimodal.encode_ppm(px)
    commented = b"P6\n# a comment\n3 2\n# another\n255\n" + raw.split(b"\n255\n", 1)[1]
    assert np.array_equal(multimodal.decode_image(commented), px)


def test_synth_decode_matches_formula(spark):
    """decode(encode(synth(doc_id))) must reproduce the closed-form
    dims and pixel sums the oracle derives from doc_id."""
    import numpy as np

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = multimodal.synth_media_table(docs)
    out = {r["doc_id"]: r for r in multimodal.decode_features(media).collect()}
    assert len(out) == 40
    for doc_id in range(40):
        h, w = multimodal.synth_dims(doc_id)
        px = multimodal.synth_pixels(doc_id)
        r = out[doc_id]
        assert (r["height"], r["width"]) == (h, w)
        assert r["fmt"] == ("bmp" if doc_id % 2 == 0 else "ppm")
        assert r["pixel_sum"] == int(px.astype(np.int64).sum())
