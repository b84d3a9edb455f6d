"""Join strategies for skew that AQE alone can't always fix.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
skew at runtime, but a broadcast-ineligible dimension joined on a
power-law key (one user/device/document dominating) still funnels the
hot key through few tasks. Salting rewrites the join so the hot key
spreads over ``n_salt`` shuffle partitions: the large side gets a
content-derived salt, the small side is replicated once per salt
value, and the join key becomes (key, salt). Result rows are
identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on`` with the large
    side's rows salted into ``n_salt`` sub-keys.

    The salt is a deterministic hash of the large side's full row
    (pmod(xxhash64(*cols), n_salt)) — no rand(), so retried tasks
    salt identically and the operation stays idempotent. The small
    side is exploded ``n_salt``× (keep it genuinely small: replication
    cost is n_salt·|small|). Supports inner and left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    l_salted = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salt))
    )
    s_exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = l_salted.join(s_exploded, [on, "_salt"], how)
    return out.drop("_salt")
