"""Driver-emulating comparison: run queries()[name] under Ray and
oracle_sql()[name] under DuckDB on the same sf_dir, compare row count,
schema (column names) and values (column-name-sorted, row-sorted)."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_result, sql: str, con) -> None:
    got = normalize(to_pandas(ray_result))
    want = normalize(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for col in got.columns:
        g = got[col]
        w = want[col]
        # Strict dtype equality: the driver's hash check is sensitive to the
        # physical type (e.g. DuckDB SUM(BIGINT)→HUGEINT surfacing as float64
        # vs Ray int64 failed 3 queries in round 1 while the old coercing
        # compare passed them).  Only normalize storage-identical spellings.
        gk, wk = g.dtype.kind, w.dtype.kind
        assert (gk, g.dtype.itemsize) == (wk, w.dtype.itemsize) or (
            gk == wk == "O"
        ), f"{name}.{col}: dtype {g.dtype} != oracle dtype {w.dtype}"
        pd.testing.assert_series_equal(
            g, w, check_names=False, check_exact=True, check_dtype=False,
            obj=f"{name}.{col}",
        )
