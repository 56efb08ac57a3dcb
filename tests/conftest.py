"""Shared test fixtures: one SparkSession per test run, a DuckDB oracle
connection with the fixture tables pre-registered, and a comparator that
mirrors the driver's convention (order-insensitive, columns sorted by
name, floats rounded to 6 decimals)."""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("TEZ_SPARK_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from tez_spark.session import get_spark

    s = get_spark(app_name="tez_spark_tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canon(value):
    """Canonicalize one cell the way the driver's hash does."""
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 6)
    if isinstance(value, _dt.datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, (list, tuple)):
        return tuple(canon(v) for v in value)
    return value


def canon_rows(columns, rows):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [columns[i] for i in order], out


def assert_df_matches_sql(df, con, sql):
    """Spark DataFrame vs DuckDB SQL: row count, column names, values."""
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={spark_cols} duck={duck_cols}"
    )
    sc, srows = canon_rows(spark_cols, spark_rows)
    dc, drows = canon_rows(duck_cols, duck_rows)
    assert len(srows) == len(drows), (
        f"row count mismatch: spark={len(srows)} duck={len(drows)}"
    )
    for i, (a, b) in enumerate(zip(srows, drows)):
        assert a == b, f"row {i} mismatch:\n spark={a}\n duck ={b}"
