"""Skew-mitigation join (100 TB hot-key strategy, SURVEY §4.2/§7).

AQE's skew-join splitting (on by default in the engine) handles most skew at
runtime; this operator demonstrates the MANUAL salting pattern for the cases
AQE cannot fix (skewed BUILD side of a broadcast, or pre-AQE clusters):
replicate the small side S times, spread the hot keys of the big side across
S sub-partitions with a deterministic salt, join on (key, salt). The salt is
invisible in the result — verified by an oracle that joins without salting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import r4, t

SALT_BUCKETS = 8


@query(
    "q_join_skew_salted",
    oracle="""
    SELECT e.event_id, e.user_id, round(e.value, 4) AS value, u.n_events
    FROM events e
    JOIN (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) u
      ON e.user_id = u.user_id
    """,
)
def q_join_skew_salted(spark, sf_dir):
    """Fact-to-dim join with manual salting: fact rows get salt =
    pmod(hash(event_id), S); the dim side is replicated S times via an
    explode — every hot user_id's rows now spread over S reducers."""
    ev = t(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    fact = ev.select(
        "event_id",
        "user_id",
        "value",
        F.pmod(F.hash("event_id"), F.lit(SALT_BUCKETS)).alias("salt"),
    )
    dim_rep = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)))
    )
    return fact.join(dim_rep, ["user_id", "salt"]).select(
        "event_id", "user_id", r4("value").alias("value"), "n_events"
    )
