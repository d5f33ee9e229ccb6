"""Deterministic, cross-engine-stable hashing primitives for dedup operators.

Two tiers:

- ``stable_hash64`` — md5-based 60-bit hash. Bit-for-bit reproducible in any
  engine with md5 (the DuckDB oracle uses ``('0x'||substr(md5(..),1,15))::bigint``),
  so correctness checks are exact. md5 is ~3-4x slower than xxhash64 but still
  JVM-side and codegen-friendly.
- ``fast_hash64`` — Spark's native ``xxhash64`` for production-scale paths
  where cross-engine parity is not needed (same semantics, faster).

Shingling / MinHash / SimHash are built purely from higher-order functions on
these hashes — no UDFs, no shuffle until the caller groups/joins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def stable_hash64(col: Column | str, seed: int = 0) -> Column:
    """md5-based 60-bit nonnegative hash, identical across engines.

    15 hex chars = 60 bits, always < 2^63 so the bigint cast never overflows
    (16 chars could). ``seed`` is prepended so independent hash families for
    MinHash come from the same primitive.
    """
    payload = F.concat(F.lit(f"{seed}\x1f"), _c(col)) if seed else _c(col)
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")


def fast_hash64(col: Column | str, seed: int = 42) -> Column:
    """Production-tier hash (xxhash64) — not oracle-reproducible."""
    return F.xxhash64(_c(col), F.lit(seed))


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapse all
    whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def words(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    w = F.split(normalize_text(col), " ")
    return F.filter(w, lambda x: x != "")


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-grams (``', '``-free, space-joined) → array<string>.

    A doc with fewer than k words yields a single shingle of the whole text
    (so short docs still participate in MinHash rather than vanishing).
    """
    ws = words(col)
    n = F.size(ws)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(ws, i, k), " "),
    )
    return F.when(n >= k, grams).otherwise(F.array(F.array_join(ws, " ")))


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: for each of ``num_hashes`` independent families,
    the min ``stable_hash64`` over the doc's shingles → array<bigint>.

    Pure expression — evaluated per row on executors; the LSH banding join
    happens in ``operators/dedup.py``. Empty shingle sets yield NULL mins.
    """
    def hash_family(seed: int):
        return lambda s: stable_hash64(s, seed=seed)

    return F.array(
        *[
            F.array_min(F.transform(shingle_col, hash_family(i + 1)))
            for i in range(num_hashes)
        ]
    )


def simhash64(token_col: Column) -> Column:
    """64-bit SimHash over a token array.

    For each bit j: sum +1/-1 over tokens according to bit j of the token's
    hash; result bit j is 1 iff the sum is positive. Built with
    ``aggregate``/``transform`` higher-order functions — no UDF.
    """
    hashed = F.transform(token_col, lambda t: stable_hash64(t))

    def vote(j: int):
        # +1 if bit j of the token hash is set, else -1, summed over tokens
        def step(acc, h):
            return acc + F.when(
                F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))

        return F.aggregate(hashed, F.lit(0), step)

    # 60 bits: stable_hash64 is a 60-bit hash, so bits 60..63 are never set in
    # any token hash and would always vote negative — skip them (also keeps
    # every literal inside signed-bigint range).
    result = F.lit(0).cast("bigint")
    for j in range(60):
        result = result + F.when(vote(j) > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return result


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes (``bit_count(a XOR b)``)."""
    return F.bit_count(a.bitwiseXOR(b))
