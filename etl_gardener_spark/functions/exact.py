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
3. display-round with integer arithmetic:
   half-up at k dp = ``(2*S + 10^(6-k)) div (2*10^(6-k)) / 10^k``.

Requires S >= 0: integral ``div`` truncates toward zero in Spark but
floors in DuckDB — they only agree for non-negative operands. All call
sites sum revenues/prices/values, which are >= 0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micro_sum(term: Column) -> Column:
    """SUM of a non-negative <=6-dp double term as exact decimal
    micro-units — use inside ``.agg()``, pair with :func:`micro_display`."""
    return F.sum(F.floor(term * 1e6 + F.lit(0.5)).cast("decimal(38,0)"))


def micro_display(col_name: str, dp: int = 2) -> Column:
    """Display-round an aggregated micro-unit sum column half-up at
    ``dp`` decimals, as a double — exact integer arithmetic end-to-end."""
    d = 10 ** (6 - dp)
    return F.expr(
        f"cast((2 * {col_name} + {d}) div (2 * {d}) as double)"
    ) / float(10**dp)


def micro_sum_sql(expr: str, dp: int = 2) -> str:
    """DuckDB mirror of micro_sum + micro_display as one SQL aggregate
    expression (HUGEINT accumulation)."""
    d = 10 ** (6 - dp)
    return (
        f"CAST((2 * SUM(CAST(FLOOR(({expr}) * 1e6 + 0.5) AS HUGEINT))"
        f" + {d}) // (2 * {d}) AS DOUBLE) / {float(10 ** dp)}"
    )
