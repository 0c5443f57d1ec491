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

    Portable but costs one md5 per seed; prefer :func:`hash_pair` +
    :func:`combined_hash` for k-permutation families (one md5 total).
    """
    c = F.col(col) if isinstance(col, str) else col
    return hash60(F.concat_ws(":", F.lit(str(seed)), c))


def sql_seeded_hash60(seed: int, expr: str) -> str:
    return sql_hash60(f"'{seed}:' || {expr}")


# k-permutation hash family from ONE md5: split the 128-bit digest into two
# independent 60-bit halves (h1, h2) and combine as (h1 + j*h2') mod P61 —
# the standard one-hash MinHash construction. h2 is reduced mod a 57-bit
# prime first so j*h2' + h1 stays < 2^63 (no signed-64 overflow in either
# engine; Spark wraps silently, DuckDB would error — both are avoided).
P61 = (1 << 61) - 1            # Mersenne prime 2^61-1
P57 = 144115188075855859       # prime < 2^57


def digest_pair(digest: Column) -> tuple[Column, Column]:
    """(h1, h2') from an md5 hex digest column. Split out from
    :func:`hash_pair` so HOF-lambda callers can materialize the digest
    once (lambdas get no common-subexpression elimination)."""
    h1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 16, 15), 16, 10).cast("long") % P57
    return h1, h2


def hash_pair(col: Column | str) -> tuple[Column, Column]:
    """(h1, h2') — two independent 60-bit hashes from one md5."""
    c = F.col(col) if isinstance(col, str) else col
    return digest_pair(F.md5(c))


def combined_hash(h1: Column, h2: Column, j: int) -> Column:
    """j-th permutation hash: (h1 + j*h2) mod P61."""
    return (h1 + F.lit(j) * h2) % P61


def sql_hash_pair(expr: str) -> tuple[str, str]:
    """DuckDB twin of :func:`hash_pair`."""
    return (
        f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)",
        f"CAST('0x' || substr(md5({expr}), 16, 15) AS BIGINT) % {P57}",
    )


def sql_combined_hash(h1: str, h2: str, j: int) -> str:
    return f"(({h1}) + {j} * ({h2})) % {P61}"


def shingles_from_words(words: Column, k: int = 3) -> Column:
    """Distinct k-token shingles of an *already-materialized* words array.

    ``words`` must be a bound column (e.g. projected as ``split(text, ' ')``
    in a prior select), NOT an inline ``F.split(...)`` expression: the
    element lambda below references it per shingle element, and Spark does
    not eliminate common subexpressions inside higher-order-function
    lambdas — an inline split would be re-evaluated O(tokens·k) times per
    row (measured 5× slower on the documents fixture).

    Rows with fewer than k tokens yield an empty array (guarded: Spark's
    sequence() would otherwise produce a *descending* range).
    """
    idx = F.sequence(F.lit(0), F.size(words) - k)
    make = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(k)]),
    )
    return F.when(F.size(words) >= k, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-token word shingles of a whitespace-tokenized text.

    Convenience wrapper; hot paths should project ``split(text, ' ')`` to a
    named column first and call :func:`shingles_from_words` (see its
    docstring for the subexpression-elimination trap).
    """
    c = F.col(text) if isinstance(text, str) else text
    return shingles_from_words(F.split(c, " "), k)


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
