"""Cross-engine deterministic hashing helpers.

Spark's native ``xxhash64``/``hash`` have no DuckDB equivalent, so every
operator that must be oracle-checkable (MinHash, SimHash, fingerprints)
hashes through md5 instead: take the first 15 hex chars of the md5 digest
(60 bits — always non-negative in a signed 64-bit long) and parse as an
integer.  Identical SQL exists on the DuckDB side:
``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.

At 100 TB md5 is noticeably slower than xxhash64 (it dominates the
minhash/simhash profile); the dedup operators take a ``hash_fn``
parameter — pass :func:`xxhash60` for the fast production path when
cross-engine oracle parity is not needed.  Both return the same domain
(non-negative 60-bit longs) so every downstream step (permutation
folding, banding, bit votes) is hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1 — modulus for the universal-hash permutation
#: family h_i(x) = (a_i * x + b_i) mod P used by MinHash.  P must be
#: SMALLER than the a*x product range so the mod actually wraps: with
#: P = 2^61-1 (rounds 1-4) and a*x+b < 2^61 the mod was a no-op, every
#: "permutation" was monotone in x, and all num_perms signature slots
#: were decided by the same argmin shingle — MinHash degenerated to a
#: single-permutation 0/1 estimator (found round 5 via a clique test
#: where one doc's unique shingle held the corpus-min folded value).
MERSENNE_31 = (1 << 31) - 1


def md5_long(col: Column, salt: str = "") -> Column:
    """60-bit non-negative integer hash of a string column, md5-based.

    ``salt`` derives independent hash functions from the same input —
    used to build the MinHash permutation family deterministically.
    """
    s = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def xxhash60(col: Column, salt: str = "") -> Column:
    """60-bit non-negative integer hash, xxhash64-based — the fast path.

    Same output domain as :func:`md5_long` (top 4 bits dropped, so the
    value is always non-negative in a signed long) but evaluated as a
    single JVM intrinsic instead of a hex digest + string parse.  Spark
    only; no DuckDB equivalent exists, so use md5 when oracle-checking.
    """
    s = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return F.shiftrightunsigned(F.xxhash64(s), 4)


def py_md5_long(s: str, salt: str = "") -> int:
    """Pure-Python replay of :func:`md5_long` — for row-local kernels
    (streaming model gates) and test oracles that must hash identically
    to the Column expression."""
    import hashlib

    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


def md5_long_sql(expr: str, salt: str = "") -> str:
    """DuckDB SQL rendering of :func:`md5_long` over SQL expression text."""
    inner = f"concat('{salt}', CAST({expr} AS VARCHAR))" if salt else f"CAST({expr} AS VARCHAR)"
    return f"CAST('0x' || substr(md5({inner}), 1, 15) AS BIGINT)"


def perm_hash(h: Column, a: int, b: int) -> Column:
    """One member of the universal family: (a*fold30(h) + b) mod (2^31-1).

    The 60-bit hash is xor-folded to 30 bits first so the product with a
    31-bit ``a`` stays under 2^61 — no signed-64 overflow.  The modulus
    is deliberately far below the product range (see :data:`MERSENNE_31`)
    so the mod wraps ~2^30 times and the map is genuinely scrambled;
    fold30(h) < 2^30 < P keeps the domain inside Z_P as the
    Carter-Wegman family requires.
    """
    folded = F.shiftrightunsigned(h, 30).bitwiseXOR(h.bitwiseAND(F.lit((1 << 30) - 1)))
    return (folded * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_31)


def perm_hash_sql(h_expr: str, a: int, b: int) -> str:
    """DuckDB SQL rendering of :func:`perm_hash`."""
    folded = f"xor(({h_expr} >> 30), ({h_expr} & {(1 << 30) - 1}))"
    return f"(({folded} * {a} + {b}) % {MERSENNE_31})"
