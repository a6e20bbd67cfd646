"""Every declared query vs the DuckDB oracle at sf0.001 (the driver
reruns the same comparison at sf0.01). Mirrors the driver's check:
row count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

import __spark_entry__ as _entry

QUERIES = _entry.queries()
ORACLE_SQL = _entry.oracle_sql()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            s = pd.to_datetime(out[c])
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            out[c] = s.astype("datetime64[ns]")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].round(9)
        elif pd.api.types.is_bool_dtype(out[c]):
            out[c] = out[c].astype(bool)
        else:
            try:
                out[c] = pd.to_numeric(out[c])
            except (ValueError, TypeError):
                pass
    return out.sort_values(list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_SMOKE).toPandas()
    oracle_df = duck.execute(ORACLE_SQL[name]).fetchdf()

    assert sorted(spark_df.columns) == sorted(oracle_df.columns), name
    assert len(spark_df) == len(oracle_df), name

    a, b = _normalize(spark_df), _normalize(oracle_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_queries_oracle_keys_align():
    assert set(ORACLE_SQL) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only_queries_run_and_are_deterministic(name, spark):
    """Non-SQL-expressible queries must still run and return the same
    result twice (deterministic hashing, no RNG)."""
    a = QUERIES[name](spark, SF_SMOKE).toPandas()
    b = QUERIES[name](spark, SF_SMOKE).toPandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
