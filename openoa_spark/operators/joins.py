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


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: float = 3600.0,
    keys: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join (``start <= ts <= end``) as a bucketed
    EQUI-join instead of the naive inequality join, which Spark can
    only plan as a broadcast-nested-loop / cartesian — the classic
    range-join scale-killer (Databricks ships a range-join hint for
    exactly this; open-source Spark has no equivalent operator).

    Strategy: each point maps to ONE coarse time bucket
    (``floor(unix_micros(ts) / bucket)``); each interval EXPLODES to
    every bucket it overlaps. The join is then an equi-join on
    (keys…, bucket) with the precise ``BETWEEN`` as a cheap residual
    filter, so it shuffles on a hashable key, scales out, and AQE can
    still split skewed buckets. Each qualifying (point, interval) pair
    meets at exactly one bucket — the point's own — so no dedup pass
    is needed.

    Cost model: interval replication = ceil(span / bucket_seconds) + 1
    rows per interval. Pick ``bucket_seconds`` near the TYPICAL
    interval span: much smaller explodes long intervals, much larger
    degrades the residual-filter selectivity. Both inputs keep all
    their columns; ``keys`` (e.g. user_id) tightens the join and the
    shuffle when intervals are per-entity.
    """
    us = int(bucket_seconds * 1_000_000)
    keys = keys or []
    p = points.withColumn(
        "_bucket", (F.unix_micros(F.col(point_ts)) / us).cast("long")
    )
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_col)) / us).cast("long"),
                (F.unix_micros(F.col(end_col)) / us).cast("long"),
            )
        ),
    )
    cond = [p["_bucket"] == i["_bucket"]] + [p[k] == i[k] for k in keys]
    joined = p.join(i, cond).where(
        p[point_ts].between(i[start_col], i[end_col])
    )
    drop_right = [i[k] for k in keys]
    out = joined.drop(p["_bucket"]).drop(i["_bucket"])
    for c in drop_right:
        out = out.drop(c)
    return out
