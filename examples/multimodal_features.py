"""Multimodal training-data walkthrough: the engine's three REAL
container codecs (image BMP/PPM/PNG/JPEG, audio WAV, video Y4M) on
the standard binary-payload + typed-metadata column layout.

    documents ──synth──▶ media(payload, meta) ──decode──▶ features
                          (Arrow mapInPandas, pure-numpy codecs)

Run: python examples/multimodal_features.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from timebox_spark.operators import audio, multimodal
    from timebox_spark.plans.tables import load
    from timebox_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="multimodal-example")
    docs = load(spark, sf_dir, "documents").limit(40)

    print("image decode (BMP/PPM/PNG/JPEG cycling, real byte parsing):")
    media = multimodal.synth_media_table(docs)
    multimodal.decode_features(media).orderBy("doc_id").show(8)

    print("audio decode (RIFF/WAVE PCM chunk walk):")
    wav = audio.synth_audio_table(docs)
    audio.audio_features(wav).orderBy("doc_id").show(8)

    print("video parse + every-2nd-frame sampling (YUV4MPEG2):")
    vid = audio.synth_video_table(docs)
    audio.video_features(vid).orderBy("doc_id").show(8)

    print("REAL bilinear image resize (decode → resample → BMP):")
    multimodal.decode_features(
        multimodal.resize_images(media, out_h=5, out_w=6)
    ).orderBy("doc_id").show(4)

    print("REAL audio resampling (8 kHz → 16 kHz linear):")
    audio.audio_features(audio.resample_audio(wav, 16000)).orderBy(
        "doc_id"
    ).show(4)

    print("perceptual image dHash (near-dup fingerprint, two 32-bit halves):")
    multimodal.image_dhash(media).orderBy("doc_id").show(4)

    print("audio energy-envelope fingerprint (16 comparison bits):")
    audio.audio_fingerprint(wav).orderBy("doc_id").show(4)

    spark.stop()


if __name__ == "__main__":
    main()
