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


def minhash_digests(col: Column | str, num_hashes: int) -> list[Column]:
    """The ``ceil(num_hashes / 4)`` sha256 digest columns backing a MinHash
    family: digest ``s`` hashes ``'{s}\\x1f' + value`` (no prefix for s=0) and
    yields four independent 60-bit slices (15 hex chars each; 64-char digest).

    One crypto hash per FOUR family members instead of one md5 per member —
    the dominant cost in the MinHash hot path is the per-shingle hashing, so
    this is a ~3x cut. The DuckDB oracle slices sha256 identically.
    """
    n = (num_hashes + 3) // 4
    out = []
    for s in range(n):
        payload = F.concat(F.lit(f"{s}\x1f"), _c(col)) if s else _c(col)
        out.append(F.sha2(payload, 256))
    return out


def minhash_slice(digest: Column, j: int) -> Column:
    """60-bit nonnegative bigint from slice ``j`` (0..3) of a sha256 hex digest."""
    return F.conv(F.substring(digest, 15 * j + 1, 15), 16, 10).cast("bigint")


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as a pure in-row expression → array<bigint>.

    Same family as ``operators/dedup.minhash_signatures`` (sha256 slices), so
    the two forms produce identical signatures. Evaluated per row on
    executors; the LSH banding join happens in ``operators/dedup.py``. Empty
    shingle sets yield NULL mins. Note the digest is re-derived per family
    member here (fine for small in-row arrays); the explode→agg operator form
    stages digests once per shingle and is the one to use on a corpus.
    """
    def member(i: int) -> Column:
        s, j = divmod(i, 4)
        return F.array_min(
            F.transform(
                shingle_col,
                lambda g: minhash_slice(minhash_digests(g, num_hashes)[s], j),
            )
        )

    return F.array(*[member(i) for i in range(num_hashes)])


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
