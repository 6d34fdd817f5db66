"""Engine-portable deterministic hashing for the approximate-dedup family.

Every hash here is chosen to be *exactly* reproducible in plain ANSI-ish
SQL on a second engine (the DuckDB correctness oracle), so the
"approximate" operators (MinHash/LSH, SimHash, cosine-LSH buckets) stop
being approximate in the *verification* sense: bucket ids, signatures and
candidate pair sets are bit-identical across engines and the driver can
hash-compare full result sets. (Round-2 verdict: xxhash64-based variants
were unverifiable — DuckDB has no xxhash64.)

Three primitives:

- **FNV-1a over Unicode code points** (not UTF-8 bytes: SQL engines index
  strings by code point, so the code-point stream is the portable unit).
  64-bit state with wraparound multiply — vectorized in numpy for the hot
  Spark path (one position-loop over a padded code-point matrix, ~max_len
  vector ops per batch, no per-string Python), and mirrored in DuckDB via
  ``list_reduce`` over HUGEINT with explicit ``mod 2^64``.
- **Band fold**: Horner polynomial mod the Mersenne prime 2^31-1 over a
  band's signature slice. All intermediates < 2^51 — expressible with
  plain BIGINT arithmetic in BOTH Spark SQL (ANSI-safe, no overflow) and
  DuckDB. Injective enough for LSH bucketing (collision space 2^31;
  collisions only add candidate pairs, never drop them).
- **Plane-sign bits**: two LCG rounds mod 2^31-1 on a (plane, dim) key,
  parity bit. Intermediates < 2^61 — same plain-BIGINT property. Used as
  deterministic ±1 Rademacher hyperplanes for cosine LSH (sign of x·r,
  r ∈ {±1}^d — the standard SRP variant with ±1 instead of Gaussian
  weights).
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = 0xCBF29CE484222325  # standard FNV-1a 64-bit offset basis
FNV_OFFSET2 = FNV_OFFSET ^ 0x9E3779B97F4A7C15  # independent second basis
FNV_PRIME = 0x100000001B3
MASK64 = 0xFFFFFFFFFFFFFFFF

MINHASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne)
BAND_K = 1000003  # Horner multiplier for band folding

PLANE_A = 1103515245  # LCG multiplier (plane-sign hash)
PLANE_C = 12345


def fnv1a_cp(s: str, basis: int = FNV_OFFSET) -> int:
    """Scalar reference: FNV-1a over code points, 64-bit wraparound."""
    h = basis
    for ch in s:
        h ^= ord(ch)
        h = (h * FNV_PRIME) & MASK64
    return h


def fnv1a_cp_np(strs, basis: int = FNV_OFFSET) -> np.ndarray:
    """Vectorized FNV-1a-over-code-points for a batch of strings.

    Returns uint64 hashes. One ``''.join`` + one UTF-32 encode gives the
    flat code-point stream without a per-string Python loop; the FNV fold
    is then max_len vectorized passes over a padded (n, max_len) matrix.
    """
    strs = ["" if s is None else s for s in strs]
    n = len(strs)
    out = np.full(n, basis, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return out
    flat = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
    mask = np.arange(maxlen, dtype=np.int64)[None, :] < lens[:, None]
    mat = np.zeros((n, maxlen), dtype=np.uint64)
    mat[mask] = flat.astype(np.uint64)
    prime = np.uint64(FNV_PRIME)
    for j in range(maxlen):
        col = mask[:, j]
        out[col] = (out[col] ^ mat[col, j]) * prime
    return out


def shingle_h1_h2_np(shingles) -> tuple[np.ndarray, np.ndarray]:
    """The MinHash double-hash bases (h1, h2) for a batch of shingles,
    as int64 arrays: h1 ∈ [0, p), h2 ∈ [1, p) (h2 never 0 so the
    Kirsch-Mitzenmacher family h_j = h1 + j·h2 mod p stays minwise)."""
    p = np.uint64(MINHASH_PRIME)
    h1 = (fnv1a_cp_np(shingles, FNV_OFFSET) % p).astype(np.int64)
    h2 = (fnv1a_cp_np(shingles, FNV_OFFSET2) % (p - np.uint64(1))).astype(
        np.int64
    ) + 1
    return h1, h2


def fnv_sql_duckdb(col: str, basis: int = FNV_OFFSET) -> str:
    """DuckDB expression mirroring ``fnv1a_cp`` exactly.

    HUGEINT state kept in [0, 2^64); xor is applied on the low 32 bits
    only (code points < 2^21, so the window is wide enough) because
    DuckDB's xor wants same-typed args and the wrap-multiply must stay
    in HUGEINT.
    """
    return (
        f"list_reduce(list_prepend({basis}::HUGEINT, "
        f"list_transform(generate_series(1, length({col})), "
        f"i -> unicode({col}[i])::HUGEINT)), "
        f"(h, c) -> ((h - h % 4294967296 "
        f"+ xor(CAST(h % 4294967296 AS BIGINT), CAST(c AS BIGINT))::HUGEINT) "
        f"* {FNV_PRIME}::HUGEINT) % 18446744073709551616::HUGEINT)"
    )


def shingle_h1_sql(col: str) -> str:
    return f"CAST({fnv_sql_duckdb(col, FNV_OFFSET)} % {MINHASH_PRIME} AS BIGINT)"


def shingle_h2_sql(col: str) -> str:
    return (
        f"(CAST({fnv_sql_duckdb(col, FNV_OFFSET2)} % {MINHASH_PRIME - 1} "
        f"AS BIGINT) + 1)"
    )


INTMIX_SEED2 = 1779033703  # SHA-256 IV word — public, arbitrary, fixed


def int_mix(key: int, seed: int = 0) -> int:
    """Portable integer mix mod 2^31-1 for INTEGER keys — the sketch
    family's hash when the key is already a number (no code-point walk
    needed). One affine round then two QUADRATIC rounds, the exact
    plane_sign recipe (an affine-only mix preserves key differences —
    the plane p/p+12 lesson): every intermediate < 2^62 + 2^61 < 2^63,
    so plain BIGINT in BOTH engines, no wraparound semantics.
    Mirrors ``int_mix_sql`` exactly (property-pinned in tests)."""
    m = MINHASH_PRIME
    h = (key % m + m + seed) % m
    h = (h * PLANE_A + PLANE_C) % m
    h = (h * h + PLANE_A * h + PLANE_C) % m
    h = (h * h + PLANE_A * h + PLANE_C) % m
    return h


def int_mix_sql(col: str, seed: int = 0) -> str:
    """SQL for ``int_mix`` valid VERBATIM in both Spark and DuckDB
    (%, *, + only; the +m before the outer % makes negative keys land
    on the same nonnegative residue in both engines' C-style %)."""
    m = MINHASH_PRIME
    h = f"((CAST({col} AS BIGINT) % {m} + {m} + {seed}) % {m})"
    h = f"(({h} * {PLANE_A} + {PLANE_C}) % {m})"
    h = f"(({h} * {h} + {PLANE_A} * {h} + {PLANE_C}) % {m})"
    h = f"(({h} * {h} + {PLANE_A} * {h} + {PLANE_C}) % {m})"
    return h


def int_h1_h2(key: int) -> tuple[int, int]:
    """The Kirsch-Mitzenmacher double-hash bases for an integer key:
    h1 ∈ [0, p), h2 ∈ [1, p-1] (never 0, so h_j = h1 + j·h2 walks)."""
    return (
        int_mix(key, 0),
        int_mix(key, INTMIX_SEED2) % (MINHASH_PRIME - 1) + 1,
    )


def int_h1_sql(col: str) -> str:
    return int_mix_sql(col, 0)


def int_h2_sql(col: str) -> str:
    return f"({int_mix_sql(col, INTMIX_SEED2)} % {MINHASH_PRIME - 1} + 1)"


def rho_sql(h2: str) -> str:
    """Portable SQL for the Flajolet-Martin rank ρ = (trailing zeros of
    ``h2``) + 1, for h2 ≥ 1: a generated 31-way CASE on the lowest set
    bit ``h2 & -h2`` (integer-only — no log2, whose power-of-two
    exactness is implementation-defined). Valid verbatim in both
    engines (& is bitwise AND in Spark SQL and DuckDB)."""
    whens = " ".join(f"WHEN {1 << t} THEN {t + 1}" for t in range(31))
    return f"(CASE (({h2}) & -({h2})) {whens} END)"


def rho_py(h2: int) -> int:
    """Reference: trailing-zero rank of h2 ≥ 1."""
    return (h2 & -h2).bit_length()


def pow2_31_minus_rho_sql(rho: str) -> str:
    """Portable SQL for 2^(31-ρ), ρ ∈ [1, 31] — the HLL harmonic-sum
    term, exact-integer (generated CASE; no float pow, no shift
    operator divergence)."""
    whens = " ".join(f"WHEN {r} THEN {1 << (31 - r)}" for r in range(1, 32))
    return f"(CASE ({rho}) {whens} END)"


def band_fold_py(values) -> int:
    """Horner fold mod 2^31-1 — reference implementation."""
    acc = 0
    for v in values:
        acc = (acc * BAND_K + int(v)) % MINHASH_PRIME
    return acc


def plane_sign(p: int, d: int) -> int:
    """Deterministic ±1 hyperplane weight for (plane p, dimension d).

    One LCG round then two QUADRATIC rounds mod 2^31-1, parity bit.
    The quadratic rounds matter: a purely affine (LCG) mix preserves key
    differences (h(k+Δ)-h(k) is constant), which made planes p and p+12
    bit-identical. h² < 2^62 and A·h < 2^61, so every intermediate fits a
    BIGINT — no wraparound semantics needed in either engine. Mirrors
    ``plane_sign_sql`` exactly.
    """
    m = MINHASH_PRIME
    h = ((p * 65536 + d + 1) * PLANE_A + PLANE_C) % m
    h = (h * h + PLANE_A * h + PLANE_C) % m
    h = (h * h + PLANE_A * h + PLANE_C) % m
    return 1 if h % 2 == 1 else -1


def plane_sign_matrix(n_planes: int, dim: int, plane_offset: int = 0) -> np.ndarray:
    """(dim, n_planes) int64 ±1 matrix for planes [offset, offset+n)."""
    ps = np.arange(plane_offset, plane_offset + n_planes, dtype=np.int64)
    ds = np.arange(dim, dtype=np.int64)
    k = ps[None, :] * 65536 + ds[:, None] + 1
    m = MINHASH_PRIME
    h = (k * PLANE_A + PLANE_C) % m
    h = (h * h + PLANE_A * h + PLANE_C) % m
    h = (h * h + PLANE_A * h + PLANE_C) % m
    return np.where(h % 2 == 1, 1, -1).astype(np.int64)


def plane_sign_sql(p: str, d: str) -> str:
    """Portable SQL (valid in both Spark and DuckDB) for plane_sign.

    All intermediates < 2^62 — plain BIGINT, no wraparound needed.
    """
    m = MINHASH_PRIME
    k = f"CAST(({p}) * 65536 + ({d}) + 1 AS BIGINT)"
    h = f"(({k} * {PLANE_A} + {PLANE_C}) % {m})"
    h = f"(({h} * {h} + {PLANE_A} * {h} + {PLANE_C}) % {m})"
    h = f"(({h} * {h} + {PLANE_A} * {h} + {PLANE_C}) % {m})"
    return f"(CASE WHEN {h} % 2 = 1 THEN 1 ELSE -1 END)"
