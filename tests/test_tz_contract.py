"""Session-timezone matrix over a fast contract subset.

The r3 self-review caught a bug visible only under a non-UTC Spark session
timezone (UTC-pinned tests masked it). This runs three timestamp-sensitive
contract queries under two non-UTC session timezones and compares the full
value multiset against the DuckDB oracle — so tz-dependence regressions
surface in pytest, not in the driver's correctness gate.

Fast subset only: the full 43-query matrix belongs to
scripts/check_contract.py, which accepts a query list.
"""

import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
#: timestamp-sensitive, fixture-free (fast) queries
QUERIES = [
    "expand_ts_json_catalyst",
    "sessionize_events",
    "streaming_windowed_agg",
]
TIMEZONES = ["America/New_York", "Asia/Tokyo"]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    return str(v)


def _key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.mark.parametrize("tz", TIMEZONES)
@pytest.mark.parametrize("qname", QUERIES)
def test_query_matches_oracle_under_session_tz(spark, oracle, tz, qname):
    import __spark_entry__ as S

    fn = S.queries()[qname]
    sql = S.oracle_sql()[qname]
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    res = oracle.sql(sql)
    ocols = list(res.columns)
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert _key(srows, scols) == _key(orows, ocols), (
        f"{qname} diverges under session tz {tz}"
    )
