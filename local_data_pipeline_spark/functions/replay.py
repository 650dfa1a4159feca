"""Engine-replayable hashing for oracle-graduated approximate queries.

The approximate dedup/ANN operators default to Spark's ``xxhash64`` —
the right production choice (JVM-side, vectorized, 64-bit) but private
to Spark, so a query built on it can only ever get a rows-only
correctness check. This module provides the REPLAYABLE hash family the
declared queries use instead: every primitive is pure int64 arithmetic
that DuckDB (or any ANSI engine) reproduces bit-for-bit, which is what
lets the driver value-hash the full output of the MinHash/SimHash/LSH/
IVF/pHash pipelines.

Primitives (all public constructions):

- **Rabin-Karp string hash** ``rk_string``: polynomial codepoint hash,
  base 257 mod p = 2³¹−1 — the same arithmetic the winnowing
  fingerprints use (h stays < 2³¹, so h·257+c < 2³⁹: no overflow in
  int64 on any engine).
- **Degree-5 power permutation** ``pow5``: x ↦ x⁵ mod p over the
  Mersenne prime p = 2³¹−1. gcd(5, p−1) = 1 makes it a bijection on
  [0, p), so seeded shifts ``(x + i·SALT) mod p`` composed with it give
  a cheap family of distinct permutations (the poisson-bootstrap
  derandomizer, ~10× cheaper than md5+conv in hot paths). Four int64
  multiplies + five mods, every intermediate < 2⁶².
- **Polynomial fold** ``poly_fold``: combines a fixed-width tuple
  (a MinHash band, a signature slice) into one int64 key, base 1000003
  mod p — collision-tolerant because both engines collide IDENTICALLY.
- **Rademacher hyperplanes** ``rademacher_planes``: ±1-coefficient
  sign-random-projection planes (Charikar's SimHash-for-vectors family)
  derived from ``pow5`` parities of the flat (plane, dim) index —
  CONSTANTS, so both engines embed the same literal ±1 vectors and the
  projection of a micro-quantized vector is an exact integer whose sign
  can never diverge cross-engine.

Quantization convention: floats entering integer hashing go through
``floor(x·1e6 + 0.5)`` (the repo-wide floor6 convention) — identical on
every engine regardless of round-half semantics.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1; gcd(5, P-1) = 1 so x -> x^5 is a bijection.
POW_P = 2147483647
#: Seed stride for the shifted-permutation family (prime, same constant
#: as the poisson-bootstrap derandomizer).
POW_SALT = 1000003
#: Polynomial fold base for band keys.
FOLD_BASE = 1000003
#: Rabin-Karp base (matches functions/text.py winnowing hashes).
RK_BASE = 257


# ------------------------------------------------------------ Spark side
def pow5(x: Column) -> Column:
    """x^5 mod (2^31-1) for x in [0, P). Every intermediate < 2^62."""
    x2 = F.pmod(x * x, F.lit(POW_P))
    x4 = F.pmod(x2 * x2, F.lit(POW_P))
    return F.pmod(x4 * x, F.lit(POW_P))


def pow5_seeded(x: Column, seed: int) -> Column:
    """Permutation #seed of the shifted-pow5 family: (x + seed·SALT mod p)^5."""
    return pow5(F.pmod(x + F.lit(seed * POW_SALT), F.lit(POW_P)))


def rk_string(s: Column) -> Column:
    """Full-string Rabin-Karp hash in [0, P): fold over codepoints,
    h = (h·257 + code) mod p. Empty string hashes to 0 (Spark's
    split('', '') yields one empty element whose ascii() is 0)."""
    codes = F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * RK_BASE + c, F.lit(POW_P)),
    )


def poly_fold(arr: Column) -> Column:
    """Fold an array<long> column into one band key:
    acc = (acc·1000003 + (v mod p)) mod p, seeded at 0. The inner
    ``pmod(v, p)`` is an IDENTITY for this module's hash outputs (all
    in [0, p)) — the SQL twin (:func:`poly_fold_sql`) omits it — and
    exists so a foreign full-range input (e.g. an xxhash64 signature
    fed to the rk_pow5 banding by mistake) folds deterministically
    instead of overflow-wrapping int64."""
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, v: F.pmod(
            acc * FOLD_BASE + F.pmod(v, F.lit(POW_P)), F.lit(POW_P)
        ),
    )


def micro(x: Column) -> Column:
    """floor(x·1e6 + 0.5) as int64 — the engine-stable quantizer."""
    return F.floor(x.cast("double") * 1000000.0 + 0.5).cast("long")


# ---------------------------------------------------------- SQL twin side
def pow5_sql(x: str) -> str:
    """DuckDB replay of :func:`pow5` — substitute ``x`` textually (the
    poisson-bootstrap nesting: every intermediate < 2^62)."""
    x2 = f"(({x}) * ({x})) % {POW_P}"
    return f"(((({x2}) * ({x2})) % {POW_P} * ({x})) % {POW_P})"


def pow5_seeded_sql(x: str, seed_expr: str) -> str:
    return pow5_sql(f"(({x}) + ({seed_expr}) * {POW_SALT}) % {POW_P}")


def rk_string_sql(s: str) -> str:
    """DuckDB replay of :func:`rk_string`. The empty string is mapped to
    [] (DuckDB's unicode('') is -1, not 0) and the seed element 0 keeps
    the fold identical to Spark's empty-element hash."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform("
        f"CASE WHEN ({s}) = '' THEN [] ELSE string_split({s}, '') END, "
        f"c -> unicode(c)::BIGINT)), (a, b) -> (a * {RK_BASE} + b) % {POW_P})"
    )


def poly_fold_sql(exprs: "list[str]") -> str:
    acc = "0"
    for e in exprs:
        acc = f"(({acc}) * {FOLD_BASE} + ({e})) % {POW_P}"
    return acc


# ----------------------------------------------------- plane derivations
def _pow5_int(x: int) -> int:
    return pow(x % POW_P, 5, POW_P)


def rademacher_planes(n_planes: int, dim: int) -> "list[list[int]]":
    """±1 hyperplane coefficients: plane p, component i gets the parity
    of pow5(p·dim + i + 1). Pure constants — embed the SAME literals in
    the Spark expression and the SQL twin."""
    return [
        [1 if _pow5_int(p * dim + i + 1) % 2 == 1 else -1 for i in range(dim)]
        for p in range(n_planes)
    ]


def phash_plane_ints(
    dim: int = 16, n_bits: int = 64, seed: int = 0x9E3779B9
) -> "list[list[int]]":
    """Integer form of operators/multimodal._phash_planes: the raw
    md5-derived uint32 words, right-shifted 8 and centered at 2^23 —
    24-bit signed weights, so a 16-term dot against 24-bit centered
    features stays < 2^52 (int64-exact on every engine). Same md5
    derivation as the float planes (cited there), so the integer pHash
    is the quantized twin of the production float pHash."""
    planes: list[list[int]] = []
    for b in range(n_bits):
        row: list[int] = []
        counter = 0
        while len(row) < dim:
            h = hashlib.md5(
                seed.to_bytes(8, "big")
                + b.to_bytes(4, "big")
                + counter.to_bytes(4, "big")
            ).digest()
            for i in range(0, len(h), 4):
                if len(row) >= dim:
                    break
                u = int.from_bytes(h[i : i + 4], "big")
                row.append((u >> 8) - 8388608)
            counter += 1
        planes.append(row)
    return planes
