"""Unit + property pins for the from-spec Avro OCF codec
(sources/avro_ocf.py) — the multimodal-codec discipline applied to the
interchange format: the byte-level encoder round-trips against its own
decoder on adversarial values, the container layout hard-fails on
corruption, and the Spark plumbing preserves nulls and types end-to-end.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nrg_etl_airflow_spark_emr_spark.sources.avro_ocf import (
    _decode_container,
    _encode_container,
    _zigzag_decode,
    _zigzag_encode,
    read_avro,
    write_avro,
)

from pyspark.sql import types as T

SYNC = bytes(range(16))


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_zigzag_roundtrip_whole_long_range(n):
    v, pos = _zigzag_decode(memoryview(_zigzag_encode(n)), 0)
    assert v == n and pos == len(_zigzag_encode(n))


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=True, width=64),
            ),
        ),
        max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_container_roundtrip_adversarial_values(rows):
    """Nulls in every position, full long range, ±inf doubles, unicode
    strings — container decode(encode(x)) == x, including multi-block
    files (block_rows=7 forces several blocks for longer inputs)."""
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    data = _encode_container(schema, iter(rows), SYNC, block_rows=7)
    assert _decode_container(data, schema) == rows


def test_container_rejects_corruption():
    schema = T.StructType([T.StructField("a", T.LongType())])
    data = _encode_container(schema, iter([(1,), (2,)]), SYNC)
    with pytest.raises(ValueError, match="bad magic"):
        _decode_container(b"PAR1" + data[4:], schema)
    # Flip a byte inside the trailing sync marker: block boundary check.
    broken = data[:-1] + bytes([data[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="sync marker"):
        _decode_container(broken, schema)
    other = T.StructType([T.StructField("zz", T.LongType())])
    with pytest.raises(ValueError, match="schema field mismatch"):
        _decode_container(data, other)


def test_spark_roundtrip_preserves_nulls_and_types(spark, tmp_path):
    """End-to-end through the Spark plumbing: nullable longs/strings/
    doubles/timestamps survive the distributed write + binaryFile read,
    and the reader emits the EXPLICIT schema, not an inferred one."""
    import datetime

    rows = [
        (1, "a", 1.5, datetime.datetime(1995, 3, 14, 12, 0, 1)),
        (2, None, None, None),
        (None, "πλ", -0.0, datetime.datetime(1970, 1, 1, 0, 0, 0)),
    ]
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = spark.createDataFrame(rows, schema).repartition(2)
    path = str(tmp_path / "avro_rt")
    n_files = write_avro(src, path)
    assert n_files == 2, "one container file per partition"
    back = read_avro(spark, path, schema)
    assert back.schema == schema
    assert sorted(
        map(tuple, back.collect()), key=lambda r: (r[0] is None, r[0])
    ) == sorted(rows, key=lambda r: (r[0] is None, r[0]))


@given(
    st.integers(min_value=1, max_value=9),  # block_rows: many small blocks
    st.lists(st.integers(min_value=1, max_value=4000), min_size=0, max_size=6),
)
@settings(max_examples=60, deadline=None)
def test_split_slices_partition_every_record_exactly_once(
    tmp_path_factory, block_rows, cut_sizes
):
    """Any byte-range partition of a container file — including cuts in
    the middle of the header, of a sync marker, and of record data —
    decodes to exactly the whole-file rows, each once (the boundary
    ownership rule of _split_slice)."""
    import os

    from nrg_etl_airflow_spark_emr_spark.sources.avro_ocf import _split_slice

    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )
    rows = [(i, f"row-{i}-" + "x" * (i % 11)) for i in range(57)]
    data = _encode_container(schema, iter(rows), SYNC, block_rows=block_rows)
    d = tmp_path_factory.mktemp("avro_split")
    path = os.path.join(str(d), "f.avro")
    with open(path, "wb") as fh:
        fh.write(data)
    size = len(data)
    # Build a partition of [0, size) from the drawn cut sizes.
    bounds = [0]
    for c in cut_sizes:
        if bounds[-1] + c < size:
            bounds.append(bounds[-1] + c)
    bounds.append(size)
    got = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        outs, total = _split_slice(path, s, e, schema)
        got.extend((int(outs[0][i]), outs[1][i]) for i in range(total))
    assert sorted(got) == rows


def test_read_avro_split_equals_whole_file_read(spark, tmp_path):
    """Spark-level: the splittable reader with many more splits than
    files (and than blocks) returns exactly the rows write_avro wrote,
    types intact."""
    import datetime

    from nrg_etl_airflow_spark_emr_spark.sources.avro_ocf import (
        read_avro_split,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("d", T.DateType()),
        ]
    )
    rows = [
        (i, f"s{i}", i / 7.0, datetime.date(1995, 1 + i % 12, 1 + i % 28))
        for i in range(1000)
    ]
    src = spark.createDataFrame(rows, schema).repartition(2)
    path = str(tmp_path / "avro_split_rt")
    write_avro(src, path)
    back = read_avro_split(spark, path, schema, num_splits=16)
    assert back.schema == schema
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_spark_roundtrip_exact_beyond_float53(spark, tmp_path):
    """Round-9 advice pin: a NULLABLE long column whose non-null values
    exceed 2^53 must round-trip bit-exactly. Arrow hands nullable ints
    to pandas as NaN-filled float64, which rounds above 2^53 — the sink
    ships coalesce(x,0) plus an explicit bool null-mask instead, so the
    value column crosses the boundary as exact int64."""
    big = 2**53 + 1          # first integer float64 cannot represent
    huge = 2**62 + 12345     # deep into the lossy range
    rows = [(1, big), (2, None), (3, huge), (4, -big)]
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    src = spark.createDataFrame(rows, schema).repartition(2)
    path = str(tmp_path / "avro_big")
    write_avro(src, path)
    back = read_avro(spark, path, schema)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
