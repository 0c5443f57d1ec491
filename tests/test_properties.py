"""Property tests (hypothesis) for the two invariants the whole oracle
strategy rests on:

1. ``hash60`` — every deterministic split/sample/shingle/band key — must
   produce bit-identical values in Spark and DuckDB for arbitrary
   strings, or silently different corpora pass different rows through
   "the same" pipeline.
2. ``dsum`` fixed-point summation must be exactly partition-order
   insensitive and equal the scalar Python computation, or float sums
   diverge between partitionings (and engines) in the last decimal.

A handful of examples each: every example is a full Spark job, so the
budget goes to adversarial generation (unicode, signs, magnitudes), not
volume.
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from nrg_etl_airflow_spark_emr_spark.functions.hashing import hash60, sql_hash60
from nrg_etl_airflow_spark_emr_spark.operators._util import FACTOR, dsum

# Strings: printable + general unicode (no surrogates — not encodable);
# md5 in both engines hashes the UTF-8 bytes.
_texts = st.lists(
    st.text(min_size=0, max_size=40),
    min_size=1,
    max_size=20,
    unique=True,
)

# Money-scale doubles: the fixed-point contract holds for |x|·1e4 < 2^63/n.
_moneys = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    min_size=1,
    max_size=50,
)


@given(_texts)
@settings(max_examples=15, deadline=None)
def test_hash60_matches_duckdb(spark, texts):
    sdf = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = {
        r.s: r.h for r in sdf.select("s", hash60("s").alias("h")).collect()
    }
    con = duckdb.connect()
    want = {
        t: con.execute(f"SELECT {sql_hash60('?')}", [t]).fetchone()[0]
        for t in texts
    }
    assert got == want


@given(_moneys, st.integers(min_value=1, max_value=7))
@settings(max_examples=15, deadline=None)
def test_dsum_is_partition_order_insensitive_and_exact(spark, values, nparts):
    sdf = spark.createDataFrame([(v,) for v in values], ["x"]).repartition(nparts)
    got = sdf.agg(dsum("x", "s")).collect()[0].s
    want = sum(math.floor(v * FACTOR) for v in values) / FACTOR
    assert got == want
