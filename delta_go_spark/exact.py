"""Cross-engine exact arithmetic helpers shared by registry operators.

Every helper here exists because some "obvious" formulation diverges in
the last digit between Spark and an independent SQL engine; see the
verify skill's gotcha list for the full catalog.
"""

from __future__ import annotations

import decimal

from pyspark.sql import functions as F


def cents(dec_sum) -> "F.Column":
    """Exact integer cents from a DECIMAL sum: floor(x*100 + 0.5) in pure
    decimal arithmetic — bit-identical on any engine running the same
    formula (no double ever appears; sign-uniform round-half-up).
    The SQL mirror: CAST(floor(sum(...) * 100 + 0.5) AS BIGINT)."""
    return F.floor(dec_sum * 100 + F.lit(decimal.Decimal("0.5"))).cast("long")
