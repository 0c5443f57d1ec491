"""Hash/shingle expression builders vs pure-Python references on random
inputs — one Spark job per test, not per example."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from nrg_etl_airflow_spark_emr_spark.functions.hashing import (
    P57,
    P61,
    hash60,
    hash_pair,
    shingles_from_words,
)


def _py_shingles(text: str, k: int = 3) -> list[str]:
    w = text.split(" ")
    if len(w) < k:
        return []
    seen: dict[str, None] = {}
    for i in range(len(w) - k + 1):
        seen.setdefault(" ".join(w[i : i + k]), None)
    return list(seen)


def _random_texts(rng: random.Random, n: int) -> list[str]:
    texts = []
    for _ in range(n):
        n_words = rng.randrange(0, 12)
        words = [
            "".join(rng.choices(string.ascii_lowercase, k=rng.randrange(1, 6)))
            for _ in range(n_words)
        ]
        texts.append(" ".join(words))
    return texts


def test_shingles_match_python_reference(spark):
    rng = random.Random(7)
    texts = _random_texts(rng, 300) + ["", "one", "one two", "a a a a a"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    out = df.select(
        "id", shingles_from_words(F.split("text", " "), 3).alias("sh")
    ).collect()
    got = {r.id: list(r.sh) for r in out}
    for i, t in enumerate(texts):
        assert got[i] == _py_shingles(t), (i, t)


def test_hash_pair_ranges_and_determinism(spark):
    rng = random.Random(11)
    vals = ["".join(rng.choices(string.printable[:80], k=rng.randrange(1, 30))) for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    h1, h2 = hash_pair("s")
    rows = df.select(hash60("s").alias("h"), h1.alias("h1"), h2.alias("h2")).collect()
    for r in rows:
        assert 0 <= r.h < 1 << 60
        assert 0 <= r.h1 < 1 << 60
        assert 0 <= r.h2 < P57
        # the j-th permutation stays within signed-64 for all j used
        assert r.h1 + 31 * r.h2 < 1 << 63
    # determinism: same inputs → same hashes on a re-run
    again = df.select(hash60("s").alias("h")).collect()
    assert [r.h for r in rows] == [r.h for r in again]


def test_hash60_cross_engine_adversarial_unicode(spark):
    """hash60 (Spark) must equal sql_hash60 (DuckDB) byte-for-byte on
    adversarial inputs — the portability contract every dedup/similarity
    oracle rests on. Both engines md5 the UTF-8 bytes, so any divergence
    would come from string normalization/encoding differences."""
    import duckdb

    from nrg_etl_airflow_spark_emr_spark.functions.hashing import sql_hash60

    adversarial = [
        "",                               # empty string
        " ",                              # lone space
        "\t\n\r",                         # control whitespace
        "a" * 10_000,                     # long ASCII
        "na\u00efve caf\u00e9",             # latin-1 range accents
        "e\u0301 vs \u00e9",               # combining acute vs precomposed
        "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8",  # CJK
        "\U0001f980\U0001f680\U0001f389",  # emoji (4-byte UTF-8)
        "\U0001f469\u200d\U0001f469\u200d\U0001f467\u200d\U0001f467",  # ZWJ family
        "\u202eRTL override\u202c",        # bidi control characters
        "\u05e2\u05d1\u05e8\u05d9\u05ea and \u0627\u0644\u0639\u0631\u0628\u064a\u0629",  # RTL scripts
        "\x00 embedded NUL \x00",          # NUL bytes inside the string
        "\ufffe\uffff",                    # noncharacters
        "\U0001d578\U0001d586\U0001d599\U0001d58d bold",  # plane-1 chars
        "\u00df \u0130 \ufb03",           # case-folding edge cases
        "\u00a0\u2007\u202f\u3000",      # exotic spaces
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(adversarial)], "i long, s string")
    got = {r.i: r.h for r in df.select("i", hash60("s").alias("h")).collect()}

    con = duckdb.connect()
    for i, s in enumerate(adversarial):
        (expect,) = con.execute(f"SELECT {sql_hash60('?')}", [s]).fetchone()
        assert got[i] == expect, f"hash60 diverges on {s!r}: {got[i]} vs {expect}"
    # Range invariant: 15 hex chars → [0, 16^15).
    assert all(0 <= h < 16**15 for h in got.values())


def test_p61_is_mersenne():
    assert P61 == (1 << 61) - 1
