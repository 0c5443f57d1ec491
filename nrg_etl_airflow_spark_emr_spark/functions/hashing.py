"""Engine-portable hashing and text-shingling expression builders.

Spark's native hash functions (xxhash64, murmur3) have no DuckDB twin, so
every hash that must match the correctness oracle goes through md5: take
the first 15 hex digits (60 bits) and parse as a BIGINT. Verified
bit-identical across Spark (`conv(substr(md5(s),1,15),16,10)`) and DuckDB
(`('0x' || substr(md5(s),1,15))::BIGINT`).

At 100 TB one would swap hash60 for xxhash64 (single pass, no hex
round-trip) — the operators only depend on "deterministic 60-bit int per
string", which both satisfy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string column (md5-based)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    """DuckDB twin of :func:`hash60`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def seeded_hash60(seed: int, col: Column | str) -> Column:
    """Seed-parameterized hash family: hash60(seed || ':' || s).

    Used as the MinHash permutation family — portable to SQL, unlike
    (a*h+b) mod p which overflows 64-bit multiplication.
    """
    c = F.col(col) if isinstance(col, str) else col
    return hash60(F.concat_ws(":", F.lit(str(seed)), c))


def sql_seeded_hash60(seed: int, expr: str) -> str:
    return sql_hash60(f"'{seed}:' || {expr}")


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-token word shingles of a whitespace-tokenized text.

    Rows with fewer than k tokens yield an empty array (guarded: Spark's
    sequence() would otherwise produce a *descending* range).
    """
    c = F.col(text) if isinstance(text, str) else text
    w = F.split(c, " ")
    idx = F.sequence(F.lit(0), F.size(w) - k)
    make = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(k)])
    )
    return F.when(F.size(w) >= k, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


def sql_word_shingles(k: int = 3) -> str:
    """DuckDB twin of :func:`word_shingles`.

    Expects a list column ``w`` (``string_split(text, ' ')``) in scope;
    DuckDB lists are 1-indexed, so shingle i spans w[i] … w[i+k-1].
    """
    parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
    return (
        f"CASE WHEN len(w) >= {k} THEN "
        f"list_distinct([{parts} for i in range(1, len(w) - {k - 2})]) "
        f"ELSE [] END"
    )
