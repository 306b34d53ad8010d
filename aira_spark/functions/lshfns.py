"""Portable LSH snippet builders: one formula, two engines (Spark | DuckDB).

Deterministic random-hyperplane signatures whose sign bits are computed in
EXACT int64 arithmetic, so the Spark query and the DuckDB correctness oracle
produce bit-identical buckets with zero float-ordering risk:

  - embeddings quantize to integers  q[d] = round(x[d] * 1024)
  - plane weights are pseudo-random centered 21-bit integers drawn from a
    splitmix64 stream seeded by (table, plane) — generated in PYTHON at
    expression-build time and baked into the SQL text as literal arrays, so
    both engines evaluate the exact same constants. i.i.d. symmetric integer
    weights are a valid sign-hash family (like Rademacher +-1 projections);
    recall vs brute force is pinned by pytest, not assumed.
  - sign bit p of table t = (sum_d q[d] * w(t, p, d)) > 0, all int64:
    |q| <= 2048, |w| < 2^20, dim 64  =>  |dot| < 1.4e11, far from overflow.

(The first cut used closed-form Weyl weights w = ((d+1) * A(t,p)) % M; those
are an arithmetic progression in d, so the planes were strongly correlated
and ANN recall collapsed to ~0.17 — literal splitmix weights fix that while
keeping the two-engine parity property.)

The numpy Gaussian path in operators/similarity.py remains the
matmul-vectorized alternative; this module is the JVM-side (whole-stage
codegen, no Python) form used by the oracle-backed driver queries.
"""

from __future__ import annotations

from functools import lru_cache

QUANT_SCALE = 1024
_M64 = (1 << 64) - 1
WEIGHT_BITS = 21  # centered: w in [-2^20, 2^20)


def _splitmix64(state: int) -> tuple[int, int]:
    state = (state + 0x9E3779B97F4A7C15) & _M64
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return state, (z ^ (z >> 31)) & _M64


@lru_cache(maxsize=None)
def plane_weights(table: int, plane: int, dim: int) -> tuple[int, ...]:
    """dim pseudo-random centered 21-bit weights for hyperplane (table, plane).
    Pure function of its arguments — the same constants land in the Spark
    expression and the DuckDB oracle SQL by construction."""
    state = (table * 0x9E3779B9 + plane * 0x85EBCA6B + 0x1B873593) & _M64
    out = []
    for _ in range(dim):
        state, z = _splitmix64(state)
        out.append((z % (1 << WEIGHT_BITS)) - (1 << (WEIGHT_BITS - 1)))
    return tuple(out)


def qemb(arr: str, engine: str) -> str:
    """Integer-quantized embedding array: round(x * 1024) as BIGINT.

    Idempotent over the 1/1024-quantized double arrays the ann queries use
    (n/1024 is exact in binary, so round(n/1024 * 1024) == n)."""
    inner = f"CAST(round(CAST(x AS DOUBLE) * {QUANT_SCALE}.0) AS BIGINT)"
    if engine == "spark":
        return f"transform({arr}, x -> {inner})"
    return f"list_transform({arr}, x -> {inner})"


def plane_dot(qe: str, table: int, plane: int, dim: int, engine: str) -> str:
    """Exact int64 dot product of a quantized embedding with plane (t, p)."""
    lits = ", ".join(str(w) for w in plane_weights(table, plane, dim))
    if engine == "spark":
        return (
            f"aggregate(zip_with({qe}, array({lits}), "
            f"(v, w) -> v * CAST(w AS BIGINT)), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    return (
        f"list_sum(list_transform(list_zip({qe}, [{lits}]), "
        f"p -> p[1] * CAST(p[2] AS BIGINT)))"
    )


def bucket(qe: str, table: int, n_planes: int, dim: int, engine: str) -> str:
    """Signature bucket of one hash table: sign bits packed little-endian."""
    terms = " + ".join(
        f"(CASE WHEN {plane_dot(qe, table, p, dim, engine)} > 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for p in range(n_planes)
    )
    return f"({terms})"
