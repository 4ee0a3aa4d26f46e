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
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            pd.testing.assert_series_equal(
                g.astype(float), w.astype(float), check_names=False, check_exact=True,
                obj=f"{name}.{col}",
            )
        else:
            pd.testing.assert_series_equal(
                g.astype(w.dtype) if g.dtype != w.dtype else g, w,
                check_names=False, obj=f"{name}.{col}",
            )
