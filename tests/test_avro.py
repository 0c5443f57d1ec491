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
