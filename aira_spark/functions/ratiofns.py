"""Exact-rational sort keys: one formula, two engines (Spark | DuckDB).

The reference orders TIFF rationals WITHOUT dividing (continued-fraction
comparison with floored division, crates/aira-tiff/src/ratio.rs:26-76),
because float pre-division collapses distinct values — (10^18+1)/10^18 and
(10^18+2)/(10^18+1) are equal as doubles but not as rationals. The Python
port (tiff/meta.py ratio_cmp) is a pairwise comparator, which DataFrame
`orderBy` cannot use; this module gives the Column/SQL form: a fixed-width
integer key whose lexicographic order IS the exact rational order.

Key = (cls, q, l1, l2, l3) for value n/d:
  cls  0 for finite values; +-2 for d = 0 (the reference only defines the
       zero-denominator case for EQUAL denominators — numerator comparison,
       ratio.rs:28-35 — so d=0 rows form +-inf classes ordered by numerator,
       the natural extension of that rule)
  q    floor(n/d) after sign-normalizing the denominator (floored division,
       matching the reference's div_mod_floor)
  l1..l3  successive 62-bit radix digits of the fractional part:
       r0 = n mod d; l_{i+1} = floor(r_i * 2^62 / d); r_{i+1} = r_i*2^62 mod d

Exactness: distinct rationals with |den| <= 2^63 differ by at least
1/(d1*d2) >= 2^-126, and the key resolves 3*62 = 186 fractional bits, so no
two distinct values share a key; equal values (2/4 vs 1/2) share one by
construction. All arithmetic is exact: Spark DECIMAL(38,0) / DuckDB HUGEINT;
the largest intermediate r_i * 2^62 < 2^63 * 2^62 = 2^125 < 10^38.

At scale the key is a pure projection (no shuffle, no UDF); a global sort
uses Spark's range-partitioned orderBy on the key columns.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

FRAC_BITS = 62
L = 1 << FRAC_BITS

KEY_FIELDS = ("cls", "q", "l1", "l2", "l3")


def _cast(expr: str, engine: str) -> str:
    t = "DECIMAL(38,0)" if engine == "spark" else "HUGEINT"
    return f"CAST({expr} AS {t})"


def _div(a: str, b: str, engine: str) -> str:
    op = "div" if engine == "spark" else "//"
    return f"(({a}) {op} ({b}))"


def ratio_key_exprs(num: str, den: str, engine: str) -> dict[str, str]:
    """Expression strings for the five key components of `num`/`den`.

    Both inputs are integer-valued column expressions; output order of
    (cls, q, l1, l2, l3) tuples is the exact rational order of num/den."""
    n0, d0 = _cast(num, engine), _cast(den, engine)
    # sign-normalize: denominator made positive (value unchanged); guard the
    # zero denominator with 1 so the div/mod chain is well-defined (its
    # results are discarded by the cls branch below)
    n = f"(CASE WHEN {d0} < 0 THEN -{n0} ELSE {n0} END)"
    d = f"(CASE WHEN ({den}) = 0 THEN {_cast('1', engine)} ELSE ABS({d0}) END)"
    r0 = f"((({n} % {d}) + {d}) % {d})"
    q = _div(f"({n} - {r0})", d, engine)
    l1 = _div(f"({r0} * {L})", d, engine)
    r1 = f"(({r0} * {L}) % {d})"
    l2 = _div(f"({r1} * {L})", d, engine)
    r2 = f"(({r1} * {L}) % {d})"
    l3 = _div(f"({r2} * {L})", d, engine)
    zero = _cast("0", engine)
    finite = f"(({den}) != 0)"
    return {
        "cls": f"(CASE WHEN {finite} THEN 0 WHEN ({num}) < 0 THEN -2 ELSE 2 END)",
        "q": f"(CASE WHEN {finite} THEN {q} ELSE {_cast(num, engine)} END)",
        "l1": f"(CASE WHEN {finite} THEN {l1} ELSE {zero} END)",
        "l2": f"(CASE WHEN {finite} THEN {l2} ELSE {zero} END)",
        "l3": f"(CASE WHEN {finite} THEN {l3} ELSE {zero} END)",
    }


def ratio_sort_cols(num: str, den: str) -> list[Column]:
    """Columns for DataFrame orderBy / Window.orderBy: exact ascending
    rational order of `num`/`den` (both integer column expressions)."""
    e = ratio_key_exprs(num, den, "spark")
    return [F.expr(e[k]) for k in KEY_FIELDS]


def duck_order_by(num: str, den: str) -> str:
    """The matching DuckDB ORDER BY fragment (without the keyword)."""
    e = ratio_key_exprs(num, den, "duckdb")
    return ", ".join(e[k] for k in KEY_FIELDS)
