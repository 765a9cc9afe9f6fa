"""Cross-engine replayable string/array hashing.

The sketch family (MinHash-LSH, SimHash, winnowing fingerprints) was
built on Spark's ``xxhash64`` — deterministic and fast, but DuckDB
cannot replay it, so those operators were rows-only in the correctness
gate. This module provides the AUDIT-PATH alternative: a polynomial
hash over Unicode code points in exact 64-bit integer arithmetic, with
an identical formulation in both engines:

    h = fold(codepoints, seed, (acc, c) -> (acc * B + c) mod P)

with B = 131 and P = 1e9+7 (< 2^30, so every intermediate fits a
signed 64-bit long exactly: acc*B + c < 2^30 * 2^8 + 2^21). The k
MinHash "permutations" derive from ONE base hash via affine maps
h_i = (a_i*h + b_i) mod P whose coefficients are fixed literals
generated below — hash the variable-length string once, then k cheap
integer transforms (the same trick the xxhash64 path uses).

Trade-offs, stated honestly: ~30 output bits instead of 64 (collisions
are identical on both engines, so the correctness gate is unaffected;
sketch quality at corpus scale degrades negligibly for minhash minima
but a 100 TB production run should prefer ``xxhash64`` mode), and the
per-character fold is slower than the JVM intrinsic. Operators
therefore take ``hash_mode`` with default "xxhash64"; the registry
queries q33/q34/q39 run "poly" so DuckDB can replay them bit-exactly.

No counterpart in the reference (its dedup is row-level
drop_duplicates only — HTIPPLSITE/__init__.py:315); textbook
polynomial rolling hash (Karp-Rabin).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus (prime, < 2^30 so products with B and sums with code points
#: stay well inside signed-64 exact range on both engines)
P = 1_000_000_007
#: fold multiplier
B = 131
#: default fold seed (non-zero so '' and missing fold apart from 0)
SEED = 7


def _affine_coeffs(n: int) -> tuple[list[int], list[int]]:
    """Fixed affine-map coefficients for the derived hash family —
    pure integer formulas so both engines share literal-for-literal
    identical constants. a_i is kept in [1, P-1] (never 0: a zero
    multiplier would collapse the permutation)."""
    a = [(i * 2654435761 + 1013904223) % (P - 1) + 1 for i in range(n)]
    b = [(i * 97531 + 12345) % P for i in range(n)]
    return a, b


def poly_hash(col: Column | str, seed: int = SEED) -> Column:
    """Polynomial hash of a string column over its code points (Spark
    side). Empty string hashes to ``seed`` — mirrored in
    :func:`poly_hash_sql`."""
    from gpi_etl_spark.functions.hof import let_

    c = F.col(col) if isinstance(col, str) else col

    def fold(s: Column) -> Column:
        # split('') materializes the per-codepoint array in ONE O(n)
        # pass; the earlier sequence(1, length) + substr(i, 1) form
        # re-seeked the UTF-8 string from the front for every index —
        # O(n²) per value (round-12 optimization: 26% warm on 45-char
        # keys at 600k rows, far more on long text; identical fold
        # values — ascii() of a one-char string is the same code
        # point substr produced, and split-by-empty-pattern segments
        # per codepoint exactly like codepoint-indexed substr)
        codes = F.transform(
            F.split(s, ""),
            lambda ch: F.ascii(ch).cast("long"),
        )
        folded = F.aggregate(
            codes,
            F.lit(seed).cast("long"),
            lambda acc, x: (acc * B + x) % P,
        )
        # split('', '') is [''] (one empty segment), whose ascii is 0,
        # so the empty string must short-circuit to the bare seed
        return F.when(F.length(s) == 0, F.lit(seed).cast("long")).otherwise(
            folded
        )

    return let_(c, fold)


def poly_hash_sql(expr: str, seed: int = SEED) -> str:
    """DuckDB replay of :func:`poly_hash` for the same string
    expression (generate_series(1, 0) is empty in DuckDB, so '' folds
    to the bare seed without a guard)."""
    return (
        f"list_reduce(list_prepend({seed}::BIGINT, "
        f"list_transform(generate_series(1, length({expr})), "
        f"_ci -> unicode(({expr})[_ci])::BIGINT)), "
        f"(_pa, _px) -> (_pa * {B} + _px) % {P})"
    )


def affine_hash(base: Column, i: int, n: int) -> Column:
    """The i-th derived hash of a base poly hash (Spark side)."""
    a, b = _affine_coeffs(n)
    return (F.lit(a[i]) * base + F.lit(b[i])) % F.lit(P)


def affine_hash_sql(base_expr: str, i_expr: str, n: int) -> str:
    """DuckDB replay of :func:`affine_hash` with a runtime index
    expression (1-based list indexing into the literal coefficient
    arrays)."""
    a, b = _affine_coeffs(n)
    a_lit = "[" + ",".join(str(v) for v in a) + "]::BIGINT[]"
    b_lit = "[" + ",".join(str(v) for v in b) + "]::BIGINT[]"
    return (
        f"(({a_lit})[({i_expr}) + 1] * ({base_expr}) "
        f"+ ({b_lit})[({i_expr}) + 1]) % {P}"
    )


def cubic_mix(h: Column) -> Column:
    """Nonlinear premix for minima/inverse-CDF consumers of the poly
    hash: ``(h·(h² mod P) + 13·h + 7) mod P``. The affine family alone
    maps the clustered hashes of SHORT keys (digit ids) to arithmetic
    progressions mod P, which biases order-statistic estimators
    (measured: 42% KMV error at n=150 — round-7 finding); the cubic is
    the cheapest progression-breaking nonlinearity. Every intermediate
    is exact in signed 64-bit (h < P ≈ 10⁹ ⇒ each product < P² ≈ 10¹⁸
    < 2⁶³), so both engines compute identical integers. The constants
    13/7 and the operation ORDER are load-bearing — this function and
    :func:`cubic_mix_sql` are the single shared definition."""
    p = F.lit(P)
    return (h * ((h * h) % p) + F.lit(13) * h + F.lit(7)) % p


def cubic_mix_sql(expr: str) -> str:
    """DuckDB replay of :func:`cubic_mix` for a BIGINT expression."""
    return (
        f"(({expr}) * ((({expr}) * ({expr})) % {P})"
        f" + 13 * ({expr}) + 7) % {P}"
    )


def poly_fold_longs(arr: Column, seed: int = SEED) -> Column:
    """Polynomial fold over an array<long> whose values are already
    reduced mod P (Spark side) — used to key LSH band buckets."""
    return F.aggregate(
        arr, F.lit(seed).cast("long"), lambda acc, x: (acc * B + x) % P
    )


def poly_fold_longs_sql(arr_expr: str, seed: int = SEED) -> str:
    """DuckDB replay of :func:`poly_fold_longs`."""
    return (
        f"list_reduce(list_prepend({seed}::BIGINT, {arr_expr}), "
        f"(_fa, _fx) -> (_fa * {B} + _fx) % {P})"
    )
