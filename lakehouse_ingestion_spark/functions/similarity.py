"""Similarity / fuzzy-dedup primitives: vector math, shingling, MinHash,
SimHash — all pure Column expressions over built-in higher-order
functions (JVM-side; no Python UDFs in the hot path).

Cross-engine determinism: hashes derive from md5 (identical in Spark and
DuckDB), parsed as 60-bit integers, so signatures are oracle-checkable.
MinHash permutations are ``(a*x + b) mod p`` with p = 2^31-1 and a,b from
a fixed seeded generator — products stay < 2^62, safe under ANSI mode.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1  # 2147483647


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# vector math (embedding columns: array<float/double>)
# ---------------------------------------------------------------------------

def dot_product(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_col(a), F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# hashing / shingling
# ---------------------------------------------------------------------------

def md5_hash60(c: Column) -> Column:
    """60-bit integer from md5 hex — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def shingles(text: Column | str, n: int = 3, mode: str = "word") -> Column:
    """Distinct n-gram shingles of the normalized text.

    mode='word': n-token shingles joined by space (n-gram Jaccard basis).
    mode='char': n-char shingles.
    """
    t = F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")
    if mode == "word":
        # split("", " ") yields [""], not [] — empty text must produce
        # zero tokens or every empty doc becomes a near-dup of every other
        toks = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
            F.split(t, " ")
        )
        count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        # n-1 chained zip_with over shifted slices: n-1 array allocations
        # per ROW instead of one slice per output shingle (HOFs are
        # interpreted; allocation count dominated — 4.5 s of the sf1
        # near_dup pipeline before, ~1 s after)
        sh = F.slice(toks, 1, count)
        for off in range(1, n):
            sh = F.zip_with(
                sh,
                F.slice(toks, 1 + off, count),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
    elif mode == "char":
        count = F.greatest(F.length(t) - (n - 1), F.lit(0))
        sh = F.transform(F.sequence(F.lit(1), count), lambda i: t.substr(i, F.lit(n)))
    else:
        raise ValueError(f"unknown shingle mode: {mode}")
    empty = F.array().cast("array<string>")
    return F.when(count <= 0, empty).otherwise(F.array_distinct(sh))


def ngram_jaccard(a_shingles: Column, b_shingles: Column) -> Column:
    """Jaccard similarity of two shingle arrays."""
    inter = F.size(F.array_intersect(a_shingles, b_shingles))
    union = F.size(F.array_union(a_shingles, b_shingles))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def minhash_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P))
        for _ in range(num_hashes)
    ]


def shingle_hashes(shingle_arr: Column) -> Column:
    """array<long> of md5-based hashes reduced mod p, one per shingle.

    MATERIALIZE this as its own column (a separate ``select``/
    ``withColumn`` step) before fanning out into per-coefficient minima:
    Spark's higher-order functions are interpreted (no whole-stage
    codegen) and Catalyst will not CSE an expression referenced from k
    sibling expressions, so inlining re-hashes every shingle k times
    (measured 8x slowdown at k=8).
    """
    return F.transform(shingle_arr, lambda s: md5_hash60(s) % MERSENNE_P)


def minhash_min(hash_arr: Column, a: int, b: int) -> Column:
    """min over the hash array of (a*x + b) mod p; empty -> p sentinel."""
    return F.coalesce(
        F.array_min(
            F.transform(hash_arr, lambda x: (F.lit(a) * x + F.lit(b)) % MERSENNE_P)
        ),
        F.lit(MERSENNE_P).cast("long"),
    )


def minhash_from_hashes(hash_arr: Column, num_hashes: int = 64, seed: int = 42) -> Column:
    """MinHash signature (array<long>) from a pre-materialized hash array."""
    return F.array(*[minhash_min(hash_arr, a, b) for a, b in minhash_coeffs(num_hashes, seed)])


def minhash_signature(
    shingle_arr: Column,
    num_hashes: int = 64,
    seed: int = 42,
) -> Column:
    """MinHash signature: array<long> of length ``num_hashes``.

    sig[i] = min over shingles s of (a_i * h(s) + b_i) mod p, where h is
    the md5-based 60-bit hash reduced mod p. Empty shingle set -> all p
    (sentinel max). Convenience one-shot form; for hot paths materialize
    ``shingle_hashes`` first (see its docstring) and use
    ``minhash_from_hashes``.
    """
    return minhash_from_hashes(shingle_hashes(shingle_arr), num_hashes, seed)


def minhash_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Split a signature into LSH bands: array<struct<band:int, key:string>>.
    Documents sharing any (band, key) are near-dup candidates."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.concat_ws(
                "_", F.slice(signature, b * rows_per_band + 1, rows_per_band)
            ).alias("key"),
        ),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: Column | str, nbits: int = 60) -> Column:
    """SimHash fingerprint over whitespace tokens (md5-based token hashes,
    ``nbits`` <= 60 bit positions; result is the integer whose bit j is 1
    iff sum over tokens of (+1 if token-hash bit j else -1) > 0).

    Pure higher-order-function expression: tokens -> per-token hash ->
    per-bit vote aggregation via zip_with accumulate -> weighted bit sum.
    """
    t = F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )
    hashes = F.transform(toks, md5_hash60)

    def token_bits(h: Column) -> Column:  # per-token ±1 vote vector
        return F.array(
            *[
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for j in range(nbits)
            ]
        )

    zero = F.array(*[F.lit(0).cast("long") for _ in range(nbits)])
    bitvotes = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(acc, token_bits(h), lambda a, b: a + b),
    )
    weights = F.array(*[F.lit(1 << j).cast("long") for j in range(nbits)])
    weighted = F.zip_with(
        bitvotes, weights, lambda vote, w: F.when(vote > 0, w).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, v: acc + v)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 fingerprints via bit_count(xor)."""
    return F.bit_count(_col(a).bitwiseXOR(_col(b)))


# ---------------------------------------------------------------------------
# random-hyperplane LSH for approximate nearest neighbors
# ---------------------------------------------------------------------------

def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-free hyperplane normals (seeded Gaussian via
    Box-Muller on a plain PRNG — reproducible across engines since the
    literals are baked into the plan)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for a vector: one char per hyperplane
    ('1' if dot(v, h) >= 0 else '0'). Vectors in the same bucket are ANN
    candidates; probing neighboring buckets (flip one bit) trades recall
    for cost. Cosine-LSH: P(same bit) = 1 - theta/pi."""
    v = _col(vec)
    bits = []
    for plane in planes:
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, arr, lambda a, b: a * b),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        # round half-away at 9 dp before the sign test so engines that
        # sum the dot in a different order (numpy BLAS in
        # operators/ann.lsh_topk, the DuckDB oracle's fold) land on the
        # same bit for near-zero dots — the bucket has no downstream
        # rounding to absorb an ulp-level sign flip
        bits.append(
            F.when(F.round(dot, 9) >= 0, F.lit("1")).otherwise(F.lit("0"))
        )
    return F.concat(*bits)
