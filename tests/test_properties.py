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


# ASCII only: Spark's levenshtein is CODEPOINT-level but DuckDB's is
# BYTE-level, so they diverge on multi-byte UTF-8 (e.g. '' vs '\x80' is
# 1 in Spark, 2 in DuckDB — pinned below). The fixture text and the
# text_fuzzy_pairs oracle live in the single-byte regime where the two
# agree; this strategy pins exactly that contract.
_ascii_pairs = st.lists(
    st.tuples(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30),
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30),
    ),
    min_size=1,
    max_size=15,
)


@given(_ascii_pairs)
@settings(max_examples=15, deadline=None)
def test_levenshtein_matches_duckdb_on_ascii(spark, pairs):
    """text_fuzzy_pairs' oracle parity: identical edit distances in the
    single-byte (ASCII) regime both engines agree on."""
    sdf = spark.createDataFrame(pairs, ["a", "b"])
    got = sorted(
        (r.a, r.b, r.d)
        for r in sdf.select("a", "b", F.levenshtein("a", "b").alias("d")).collect()
    )
    con = duckdb.connect()
    want = sorted(
        (a, b, con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0])
        for a, b in pairs
    )
    assert got == want


def test_levenshtein_unicode_divergence_documented(spark):
    """Known cross-engine divergence, pinned so a silent change in either
    engine is noticed: Spark counts codepoints, DuckDB counts UTF-8
    bytes. Any operator comparing non-ASCII text across engines must
    normalize first (e.g. compare on a hex/byte representation)."""
    spark_d = (
        spark.createDataFrame([("", "\x80")], ["a", "b"])
        .select(F.levenshtein("a", "b").alias("d"))
        .collect()[0]
        .d
    )
    duck_d = duckdb.connect().execute("SELECT levenshtein('', chr(128))").fetchone()[0]
    assert spark_d == 1, "Spark: one codepoint edit"
    assert duck_d == 2, "DuckDB: two UTF-8 byte edits"


@given(
    st.integers(min_value=1, max_value=6),   # frames
    st.integers(min_value=1, max_value=7),   # height
    st.integers(min_value=1, max_value=7),   # width
    st.integers(min_value=1, max_value=60),  # fps
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_avi_roundtrip_property(n, h, w, fps, seed):
    """encode_avi/decode_avi roundtrip across arbitrary tiny geometries —
    odd widths exercise the 4-byte DIB row padding every time."""
    import numpy as np

    from nrg_etl_airflow_spark_emr_spark.operators import multimodal as mm

    frames = np.random.default_rng(seed).integers(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )
    gw, gh, gn, gfps, decoded = mm.decode_avi(mm.encode_avi(frames, fps=fps))
    assert (gw, gh, gn, gfps) == (w, h, n, fps)
    assert np.array_equal(decoded, frames)


# ---------------------------------------------------------------------------
# Temporal-kernel properties: the bucket-quantized interval join and the
# single-pass nearest as-of must equal their brute-force specifications on
# ARBITRARY inputs — and for the interval join, for ARBITRARY bucket
# widths, since bucket width is a pure performance knob that must never
# change the answer.
# ---------------------------------------------------------------------------

_interval_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # key
        st.integers(min_value=0, max_value=500),      # start
        st.integers(min_value=0, max_value=300),      # length
    ),
    min_size=1,
    max_size=12,
)


@given(_interval_rows, _interval_rows, st.integers(min_value=1, max_value=700))
@settings(max_examples=12, deadline=None)
def test_interval_overlap_matches_bruteforce_for_any_bucket(spark, lrows, rrows, bucket):
    from nrg_etl_airflow_spark_emr_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(i, k, s, s + n) for i, (k, s, n) in enumerate(lrows)],
        "a_id long, user_id long, as_ long, ae long",
    )
    right = spark.createDataFrame(
        [(i, k, s, s + n) for i, (k, s, n) in enumerate(rrows)],
        "b_id long, user_id long, bs long, be long",
    )
    got = {
        (r.a_id, r.b_id): r.overlap_us
        for r in interval_overlap_join(left, right, bucket).collect()
    }
    want = {
        (i, j): min(ls + ln, rs + rn) - max(ls, rs)
        for i, (lk, ls, ln) in enumerate(lrows)
        for j, (rk, rs, rn) in enumerate(rrows)
        if lk == rk and ls <= rs + rn and rs <= ls + ln
    }
    assert got == want


_event_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # key
        st.integers(min_value=0, max_value=120),   # ts (seconds)
        st.booleans(),                             # is_probe
    ),
    min_size=1,
    max_size=14,
)


@given(_event_rows, st.integers(min_value=1, max_value=90))
@settings(max_examples=12, deadline=None)
def test_nearest_asof_matches_bruteforce_spec(spark, rows, tol_s):
    """Brute-force the spec per probe: backward = latest ref at-or-before
    (ties: max id), forward = earliest ref strictly after (ties: min id),
    nearest within tolerance, equidistant prefers backward."""
    import datetime

    from nrg_etl_airflow_spark_emr_spark.operators.temporal import nearest_asof_join

    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, k, "p" if isp else "r", base + datetime.timedelta(seconds=ts))
            for i, (k, ts, isp) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {
        r.purchase_id: (r.view_id, r.delta_us, r.direction)
        for r in nearest_asof_join(
            ev.filter(F.col("event_type") == "p"),
            ev.filter(F.col("event_type") == "r"),
            tol_us=tol_s * 1_000_000,
        ).collect()
    }
    tol_us = tol_s * 1_000_000
    want = {}
    for i, (k, ts, isp) in enumerate(rows):
        if not isp:
            continue
        us = ts * 1_000_000
        refs = [
            (j, rts * 1_000_000)
            for j, (rk, rts, risp) in enumerate(rows)
            if not risp and rk == k
        ]
        back = max(
            ((v, j) for j, v in refs if v <= us), default=None
        )  # (vts, id): max ts then max id
        fwd = min(
            ((v, j) for j, v in refs if v > us), default=None
        )  # min ts then min id
        bok = back is not None and us - back[0] <= tol_us
        fok = fwd is not None and fwd[0] - us <= tol_us
        if bok and (not fok or us - back[0] <= fwd[0] - us):
            want[i] = (back[1], back[0] - us, "b")
        elif fok:
            want[i] = (fwd[1], fwd[0] - us, "f")
        else:
            want[i] = (None, None, None)
    assert got == want


# --- Exact-substring span dedup vs brute-force reference ---------------------

from collections import Counter  # noqa: E402

from nrg_etl_airflow_spark_emr_spark.operators.dedup import (  # noqa: E402
    SPAN_DF_CAP,
    SPAN_MIN,
    SPAN_W,
    substring_spans,
)


def _ref_spans(docs: dict[int, list[str]]):
    """Brute force: per doc pair and diagonal, maximal runs of matching
    W-token windows (windows occurring > SPAN_DF_CAP times excluded),
    reported when the merged span reaches SPAN_MIN tokens."""
    wins, cnt = {}, Counter()
    for did, toks in docs.items():
        ws = [
            tuple(toks[p : p + SPAN_W]) for p in range(len(toks) - SPAN_W + 1)
        ]
        wins[did] = ws
        cnt.update(ws)
    out = []
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            bydiag: dict[int, list[int]] = {}
            for pa, w1 in enumerate(wins[a]):
                if cnt[w1] > SPAN_DF_CAP:
                    continue
                for pb, w2 in enumerate(wins[b]):
                    if w1 == w2:
                        bydiag.setdefault(pa - pb, []).append(pa)
            for d, pas in bydiag.items():
                pas.sort()
                start = prev = pas[0]
                for p in pas[1:] + [None]:
                    if p is not None and p == prev + 1:
                        prev = p
                        continue
                    span = prev - start + SPAN_W
                    if span >= SPAN_MIN:
                        out.append((a, b, start + 1, start + 1 - d, span))
                    if p is not None:
                        start = prev = p
    return sorted(out)


_span_tok = st.sampled_from(["x", "y", "z"])
_span_passage = st.lists(_span_tok, min_size=0, max_size=24)
_span_filler = st.lists(_span_tok, min_size=8, max_size=16)


@given(
    passage=_span_passage,
    pre_a=_span_filler,
    post_a=_span_filler,
    pre_b=_span_filler,
    post_b=_span_filler,
    extra=st.lists(st.lists(_span_tok, min_size=8, max_size=30), max_size=2),
)
@settings(max_examples=12, deadline=None)
def test_substring_spans_match_bruteforce(
    spark, passage, pre_a, post_a, pre_b, post_b, extra
):
    docs = {
        0: pre_a + passage + post_a,
        1: pre_b + passage + post_b,
    }
    for j, toks in enumerate(extra):
        docs[2 + j] = toks
    sdf = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in docs.items()], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in substring_spans(sdf).collect()
    )
    assert got == _ref_spans(docs)


# --- Streaming bitmap state vs direct computation ----------------------------


@given(
    days=st.lists(st.integers(min_value=0, max_value=80), min_size=1, max_size=25),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=50, deadline=None)
def test_bitmap_kernel_is_arrival_order_invariant(days, seed):
    """The streaming kernel's final (cohort, mask) must equal the batch
    definition — bit d-cohort for every active day within 32 of the
    FIRST-SEEN day — for any arrival order and batching, because the
    rebase shifts bits and drops the ones past the window exactly as
    the batch datediff < 32 cut does."""
    import random

    import pandas as pd

    from nrg_etl_airflow_spark_emr_spark.streaming.jobs import _user_bitmap_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.get, self.exists = v, True

    rng = random.Random(seed)
    arrival = days[:]
    rng.shuffle(arrival)
    state = FakeState()
    # Random batching: one kernel call per chunk, like micro-batches.
    i = 0
    while i < len(arrival):
        j = i + rng.randint(1, 4)
        chunk = arrival[i:j]
        i = j
        pdf = pd.DataFrame(
            {"ts": [pd.Timestamp("1970-01-01") + pd.Timedelta(days=d) for d in chunk]}
        )
        list(_user_bitmap_fn((1,), iter([pdf]), state))
    cohort, mask = state.get
    want_cohort = min(days)
    want_mask = 0
    for d in set(days):
        if d - want_cohort < 32:
            want_mask |= 1 << (d - want_cohort)
    assert (cohort, mask) == (want_cohort, want_mask)
