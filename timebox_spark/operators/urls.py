"""URL curation operators: canonicalization, URL-level dedup, and
domain blocklist filtering — the web-crawl curation stages that run
BEFORE text ever loads (C4 and RefinedWeb both dedup and filter by
URL first; the reference has no URL surface at all, so this is part
of the SURVEY §2.7 LLM-pipeline extension).

Everything is JVM-side `pyspark.sql.functions` regex/string built-ins
— map-only per row, no UDFs — and every regex constant is shared with
a DuckDB renderer (:func:`duckdb_canonical_sql` /
:func:`duckdb_canonical_host_sql`) so the q54 'url_*' members drive
the exact canonical strings bit-for-bit against the oracle. Patterns
stay in the RE2-safe subset (no lookaround/backrefs) per the repo's
cross-engine regex rule; DuckDB's `regexp_replace` replaces only the
first match by default, so the renderer passes ``'g'`` explicitly
where Spark's replace-all semantics are assumed.

Canonicalization (conservative, structure-preserving):

- fragment stripped (never sent to servers);
- scheme and host lowercased (path/query case preserved — they are
  case-significant on real servers);
- default port stripped (``:80`` for http, ``:443`` for https; any
  other port kept);
- leading ``www.`` stripped from the host;
- tracking query parameters removed (``utm_*``, ``gclid``,
  ``fbclid``, ``ref``) with separators repaired; remaining parameter
  ORDER is preserved (reordering changes semantics on some servers —
  deliberately not done);
- trailing slashes collapsed; an empty path becomes ``/``.

A value that does not parse as ``scheme://...`` passes through
unchanged (a filter can drop non-URLs explicitly; silent mutation of
unknown strings would corrupt joins against the raw column).

100 TB posture: every operator here is a map-only column expression;
`url_dedup`'s window and count are keyed by the canonical URL (never
unkeyed), and `domain_blocklist_filter` is a literal `isin` for small
lists or a broadcast anti-join for large ones — no data-sized shuffle
beyond the keyed dedup window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# scheme://host[:port] + path?query, group 3 stops at '#' so the
# fragment never survives extraction
URL_PARTS_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^#]*)"
# tracking params, matched WITH their leading separator against a
# query string that has been prefixed with '&' (so the first param
# needs no special case); applied replace-ALL
TRACKING_PARAM_RE = r"&(utm_[a-zA-Z0-9_]+|gclid|fbclid|ref)=[^&]*"
# last two dot-labels — a documented heuristic, not a public-suffix
# list: 'a.b.co.uk' yields 'co.uk'. Swap in a PSL join where correct
# eTLD+1 grouping matters.
REGISTRABLE_DOMAIN_RE = r"([^.]+\.[^.]+)$"


def _col(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _canon_pieces(col) -> tuple[Column, Column, Column, Column]:
    """(raw_scheme_match, scheme, canonical_authority, canonical_rest)
    — the shared decomposition behind canonicalize_url/url_host. The
    authority is host[:port] (non-default port kept — it is part of
    the canonical identity); ``url_host`` strips the port."""
    c = _col(col)
    g1 = F.regexp_extract(c, URL_PARTS_RE, 1)
    scheme = F.lower(g1)
    hp = F.lower(F.regexp_extract(c, URL_PARTS_RE, 2))
    hp = (
        F.when(scheme == "http", F.regexp_replace(hp, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hp, ":443$", ""))
        .otherwise(hp)
    )
    host = F.regexp_replace(hp, r"^www\.", "")
    g3 = F.regexp_extract(c, URL_PARTS_RE, 3)
    path = F.regexp_replace(
        F.regexp_extract(g3, r"^([^?]*)", 1), "/+$", ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(g3, r"\?(.*)$", 1)
    q = F.regexp_replace(F.concat(F.lit("&"), q), TRACKING_PARAM_RE, "")
    q = F.regexp_replace(F.regexp_replace(q, "^&+", ""), "&+$", "")
    rest = F.concat(
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return g1, scheme, host, rest


def canonicalize_url(col) -> Column:
    """Canonical form of a URL column (rules in the module docstring);
    non-URL values pass through unchanged."""
    g1, scheme, host, rest = _canon_pieces(col)
    return F.when(g1 == "", _col(col)).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def url_host(col) -> Column:
    """Canonical host of a URL column (lowercased, ANY port and
    leading www. stripped); '' for non-URL values. The port belongs to
    the canonical URL's authority, not to the host — blocklists and
    domain grouping must not split on it."""
    _, _, authority, _ = _canon_pieces(col)
    return F.regexp_replace(authority, ":[0-9]+$", "")


def registrable_domain(host_col) -> Column:
    """Last two dot-labels of a host — the blocklist/grouping key
    (heuristic; see REGISTRABLE_DOMAIN_RE). '' when the host has no
    dot."""
    return F.regexp_extract(_col(host_col), REGISTRABLE_DOMAIN_RE, 1)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup: one row per CANONICAL URL (smallest ``id_col``
    wins — same keep-one convention as the text dedups), with
    ``canonical_url`` and the group's ``n_dups`` attached. Runs before
    any text is read: at crawl scale this is the cheapest dedup tier
    (C4 §2.2 dedups by URL before content). Both windows are keyed by
    the canonical URL — no unkeyed data-sized window."""
    wk = Window.partitionBy("__curl")
    w = wk.orderBy(id_col)
    return (
        df.withColumn("__curl", canonicalize_url(url_col))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(wk))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("__curl", "canonical_url")
    )


def domain_blocklist_filter(
    df: DataFrame,
    url_col: str = "url",
    blocked: Sequence[str] = (),
    max_literal: int = 64,
) -> DataFrame:
    """Drop rows whose canonical host's registrable domain is in
    ``blocked`` (lowercased). Small lists become a literal ``isin``
    (pure map-side filter); larger ones a broadcast LEFT ANTI join —
    either way zero data-sized shuffle. A NULL url (or one with no
    extractable domain) is KEPT on both paths: the anti-join keeps it
    naturally (NULL never matches a join key), and the isin path
    keeps it explicitly — ``~isin`` alone evaluates NULL and filter()
    would silently drop the row, flipping the outcome with blocklist
    SIZE (round-14 review)."""
    dom = registrable_domain(url_host(url_col))
    norm = [b.lower() for b in blocked]
    if not norm:
        return df
    if len(norm) <= max_literal:
        return df.filter(dom.isNull() | ~dom.isin(norm))
    bl = df.sparkSession.createDataFrame(
        [(b,) for b in norm], "__dom string"
    )
    return (
        df.withColumn("__dom", dom)
        .join(F.broadcast(bl), "__dom", "left_anti")
        .drop("__dom")
    )


# ------------------------------------------------------ DuckDB renderers
# The oracle side is RENDERED from the same regex constants above, so
# the q54 'url_*' members compare the canonicalization bit-for-bit.
# DuckDB divergences handled here: regexp_replace needs 'g' for
# replace-all (Spark replaces all by default), backreference syntax
# differs (none used), and CAST(x AS STRING) is the portable spelling.


def _dd_rr(e: str, pat: str, rep: str = "") -> str:
    return f"regexp_replace({e}, '{pat}', '{rep}', 'g')"


def duckdb_canonical_authority_sql(e: str) -> str:
    """DuckDB SQL for the canonical authority (host[:non-default
    port]) over expression ``e`` — the piece canonicalize_url
    reassembles."""
    g1 = f"lower(regexp_extract({e}, '{URL_PARTS_RE}', 1))"
    hp = f"lower(regexp_extract({e}, '{URL_PARTS_RE}', 2))"
    hp2 = (
        f"CASE WHEN {g1} = 'http' THEN {_dd_rr(hp, ':80$')} "
        f"WHEN {g1} = 'https' THEN {_dd_rr(hp, ':443$')} "
        f"ELSE {hp} END"
    )
    return _dd_rr(hp2, r"^www\.")


def duckdb_canonical_host_sql(e: str) -> str:
    """DuckDB SQL for ``url_host`` (authority with any port stripped)
    over expression ``e``."""
    return _dd_rr(duckdb_canonical_authority_sql(e), ":[0-9]+$")


def duckdb_canonical_sql(e: str) -> str:
    """DuckDB SQL for ``canonicalize_url`` over expression ``e``."""
    g1 = f"regexp_extract({e}, '{URL_PARTS_RE}', 1)"
    g3 = f"regexp_extract({e}, '{URL_PARTS_RE}', 3)"
    path = _dd_rr(f"regexp_extract({g3}, '^([^?]*)', 1)", "/+$")
    path2 = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    q = f"'&' || regexp_extract({g3}, '\\?(.*)$', 1)"
    q2 = _dd_rr(_dd_rr(_dd_rr(q, TRACKING_PARAM_RE), "^&+"), "&+$")
    rest = f"{path2} || CASE WHEN {q2} = '' THEN '' ELSE '?' || {q2} END"
    canon = (
        f"lower({g1}) || '://' || {duckdb_canonical_authority_sql(e)} "
        f"|| {rest}"
    )
    return f"CASE WHEN {g1} = '' THEN {e} ELSE {canon} END"


def duckdb_registrable_domain_sql(host_e: str) -> str:
    """DuckDB SQL for ``registrable_domain`` over host expression."""
    return f"regexp_extract({host_e}, '{REGISTRABLE_DOMAIN_RE}', 1)"
