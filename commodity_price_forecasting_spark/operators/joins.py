"""Join utilities for skewed keys (SCALE.md posture).

AQE's skew-join splitting handles most skew automatically; explicit
**salting** remains the tool when one side must pre-aggregate on a
hot key or when AQE's split thresholds don't trigger (e.g. a single
pathological key inside an otherwise balanced partition). The salt is
derived from a content hash — deterministic, no RNG — so results are
reproducible and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join where the (large, possibly skewed) ``left`` side is
    split across ``n_salts`` sub-keys and the ``right`` side is
    replicated once per salt — a hot join key spreads over
    ``n_salts`` reducers instead of one straggler.

    Semantics are identical to ``left.join(right, on, how)`` for
    equi-joins with ``how`` in {inner, left}; the salt column never
    leaves this function. Cost: right side ×n_salts (keep the
    replicated side the smaller one)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)
    ).alias("_salt")
    l_salted = left.select("*", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, on + ["_salt"], how).drop("_salt")
