"""The repo-wide cross-engine rounding protocol, stated ONCE.

numpy ``round`` is half-even, SQL ``ROUND`` half-away-from-zero;
``FLOOR(x*scale + 0.5)/scale`` agrees in both engines for the
non-negative values this repo rounds, so every float that must
hash-compare across the Ray and DuckDB sides goes through this form
(see the matching ``FLOOR(... * 1e6 + 0.5)`` expressions in the SQL
oracles).
"""

import math


def round6(x: float) -> float:
    """floor(x*1e6 + 0.5) / 1e6 — 6-decimal cross-engine rounding."""
    return math.floor(x * 1e6 + 0.5) / 1e6
