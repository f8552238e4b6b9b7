"""Exact money/value-sum kernel, shared by batch queries, streaming
aggregations, and their DuckDB oracles.

ROUND(SUM(double), k) over a fold-order-dependent double sum is a LATENT
cross-engine hazard: whenever a group's sum lands within an ulp of a
k-dp midpoint, Spark (shortest-repr half-up) and DuckDB (binary-value)
disagree by one last-digit unit — and two Spark runs with different
partitionings can disagree with each other. Incidence is probabilistic
in data volume; round 5's sf1 sweep caught rollup_revenue's AMERICA
group on a cent midpoint after three rounds of the same query passing.

Every money/value term in the testdata is EXACT at <= 6 decimals
(prices/discounts/taxes 2 dp, their products 4-6 dp, event values 2 dp),
so the portable fix is also the exact one:

1. quantize each term to integer MICRO-units with ``floor(x*1e6 + 0.5)``
   — identical IEEE expression tree in both engines, lossless for
   <=6-dp terms;
2. sum in DECIMAL(38,0) / HUGEINT — exact and order-free, immune to
   partition fold order, salting re-association, and streaming
   state-store merge order;
3. display-round with integer arithmetic, HALF-UP TOWARD +INFINITY:
   ``floor((2*S + 10^(6-k)) / (2*10^(6-k))) / 10^k``.

Sign-correctness (round-6 fix): the original kernel used integral
``div`` / ``//`` for step 3, and BOTH engines truncate integral
division toward zero (Spark ``div`` and DuckDB ``//`` agree on
negatives: ``-7 // 2 = -3``). The engines therefore never diverged —
but a NEGATIVE group sum (refunds, adjustments) was misrounded toward
zero by one last-digit unit on BOTH sides at once (sum exactly -1.00
displayed as -0.99), which a mirrored differential oracle cannot see.
Step 3 now emulates FLOOR division via the truncating div both engines
share: ``floor(n / d) = n div d - (1 if n % d < 0 else 0)`` for d > 0
(``%`` is the truncating remainder, same sign as n, in both engines).
For non-negative sums this is bit-identical to the old kernel; for
negative sums it yields true half-up-toward-+inf (-1.00 -> -1.00,
-0.005 -> 0.00 at 2 dp). Property-pinned in
tests/test_representation_boundaries.py::test_micro_display_sign_correct_half_up.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micro_sum(term: Column) -> Column:
    """SUM of a <=6-dp double term (either sign) as exact decimal
    micro-units — use inside ``.agg()``, pair with :func:`micro_display`."""
    return F.sum(F.floor(term * 1e6 + F.lit(0.5)).cast("decimal(38,0)"))


def floor_div_expr(num_sql: str, den_sql: str) -> str:
    """Spark SQL fragment: FLOOR division of exact integers/decimals via
    the truncating ``div`` (den > 0). For num >= 0 identical to ``div``."""
    n, d = f"({num_sql})", f"({den_sql})"
    return f"({n} div {d} - (case when {n} % {d} < 0 then 1 else 0 end))"


def floor_div_sql(num_sql: str, den_sql: str) -> str:
    """DuckDB mirror of :func:`floor_div_expr` via the truncating ``//``."""
    n, d = f"({num_sql})", f"({den_sql})"
    return f"({n} // {d} - (CASE WHEN {n} % {d} < 0 THEN 1 ELSE 0 END))"


def half_up_display_expr(num_e: str, unit: int, dp: int) -> str:
    """Spark SQL fragment: display an exact integer sum ``num_e`` held in
    ``10^-unit`` units, rounded half-up-toward-+inf at ``dp`` decimals,
    as a double. ``unit`` is the stored scale (6 for micro, 4 for e4)."""
    d = 10 ** (unit - dp)
    q = floor_div_expr(f"2 * {num_e} + {d}", str(2 * d))
    return f"cast({q} as double) / {float(10 ** dp)}"


def half_up_display_sql(num_e: str, unit: int, dp: int) -> str:
    """DuckDB mirror of :func:`half_up_display_expr`."""
    d = 10 ** (unit - dp)
    q = floor_div_sql(f"2 * {num_e} + {d}", str(2 * d))
    return f"CAST({q} AS DOUBLE) / {float(10 ** dp)}"


def micro_display(col_name: str, dp: int = 2) -> Column:
    """Display-round an aggregated micro-unit sum column half-up (toward
    +inf) at ``dp`` decimals, as a double — exact integer arithmetic
    end-to-end, sign-correct."""
    return F.expr(half_up_display_expr(col_name, 6, dp))


def micro_sum_sql(expr: str, dp: int = 2) -> str:
    """DuckDB mirror of micro_sum + micro_display as one SQL aggregate
    expression (HUGEINT accumulation, sign-correct half-up display)."""
    s = f"SUM(CAST(FLOOR(({expr}) * 1e6 + 0.5) AS HUGEINT))"
    return half_up_display_sql(s, 6, dp)
