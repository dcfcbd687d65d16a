"""B4 — snapshot/stream conflict resolution: latest event per key.

Reference semantics (SURVEY.md B4): snapshot rows are never re-streamed
(``PartialSnapshotter.java:59-64``) and a snapshot read taken at
watermark W must lose to any concurrent WAL event with lsn >= W for the
same key. We encode that as a total order ``(lsn, op_rank)`` with
op_rank('r') = 0 < c/u/d, and reduce each key to its maximum.

Two physical strategies, both single-shuffle:

- ``max_by`` (default): ``groupBy(doc_id).agg(max_by(struct(*), ord))``.
  An algebraic aggregate — Spark runs a map-side partial aggregation, so
  a key with 10^6 duplicate events ships ~1 row per map task instead of
  10^6 rows through the shuffle. This is the scale-friendly plan.
- ``window``: ``row_number() over (partition by doc_id order by ...)``.
  No partial aggregation (all rows shuffle), but keeps pre-images when a
  caller needs them.

Hot-key salting (north rule) is a two-phase max_by: group by
``(doc_id, salt(lsn))`` then by ``doc_id``. With partial aggregation the
single-phase plan already absorbs most skew map-side; the salted plan
additionally bounds the *reduce*-side row count per key to n_salts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_partial_snapshotter_spark.functions import op_rank, salt


def _ord_col(df: DataFrame):
    rank = (
        F.col("_op_rank")
        if "_op_rank" in df.columns
        else op_rank(F.col("op"))
    )
    return F.struct(F.col("lsn").alias("l"), rank.alias("r"))


def latest_events(
    batch: DataFrame,
    key: str = "doc_id",
    strategy: str = "join",
    salt_buckets: int = 0,
) -> DataFrame:
    """One row per key: the (lsn, op_rank)-maximal event.

    'join' (default, the hot-path plan): primitive max of the encoded
    order + SHUFFLE_HASH join-back — all HashAggregate, wide rows never
    sorted. 'max_by'/'window' kept for comparison and for callers that
    need pre-images.
    """
    if strategy == "join":
        ord_ = (F.col("lsn") * 4 + op_rank(F.col("op"))).alias("_ord")
        cand = batch.withColumn("_ord", ord_)
        if salt_buckets and salt_buckets > 1:
            maxes = (
                cand.withColumn("_salt", salt(F.col("lsn"), salt_buckets))
                .groupBy(key, "_salt")
                .agg(F.max("_ord").alias("_mx"))
                .groupBy(key)
                .agg(F.max("_mx").alias("_mx"))
            )
        else:
            maxes = cand.groupBy(key).agg(F.max("_ord").alias("_mx"))
        winners = cand.join(maxes.hint("SHUFFLE_HASH"), key).where(
            F.col("_ord") == F.col("_mx")
        )
        # Tie-break WITHOUT a global dropDuplicates: duplicate-delivered
        # events tie with themselves (same key, same _ord, identical
        # content), and dropDuplicates over the FULL wide winner set
        # compiles to SortAggregate with First() buffers (~45% of epoch
        # cost measured at 32 cores). Instead, detect the (rare) tied
        # keys with a narrow count and dedup ONLY those rows: the
        # SortAggregate runs over the tiny tied subset, the untied bulk
        # passes through an anti-join against a broadcast key list. No
        # step depends on row order or per-row ids, so the plan is safe
        # under task retries and multi-branch re-evaluation (a previous
        # monotonically_increasing_id formulation was not: the two
        # consumers of `winners` could see different post-shuffle row
        # orders and assign the same row different ids, dropping keys).
        tied_keys = (
            winners.groupBy(key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
            .select(key)
        )
        # plain equi-joins: both sides are already hash-partitioned by
        # `key` (no new exchange of wide rows); AQE upgrades the narrow
        # key list to a broadcast when it is small — no driver-side
        # broadcast is FORCED, so adversarial all-duplicate feeds stay
        # executor-side.
        untied = winners.join(tied_keys.hint("SHUFFLE_HASH"), key, "left_anti")
        tied = winners.join(tied_keys.hint("SHUFFLE_HASH"), key).dropDuplicates([key])
        return untied.unionByName(tied).drop("_ord", "_mx")
    if strategy == "window":
        from pyspark.sql.window import Window

        w = Window.partitionBy(key).orderBy(
            F.col("lsn").desc(), op_rank(F.col("op")).desc()
        )
        return (
            batch.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    payload = F.struct(*[F.col(c) for c in batch.columns])
    if salt_buckets and salt_buckets > 1:
        # two-phase: per-(key, salt-cell) max, then per-key max
        stage1 = (
            batch.withColumn("_salt", salt(F.col("lsn"), salt_buckets))
            .groupBy(key, "_salt")
            .agg(
                F.max_by(payload, _ord_col(batch)).alias("_w"),
                F.max(_ord_col(batch)).alias("_o"),
            )
        )
        return (
            stage1.groupBy(key)
            .agg(F.max_by(F.col("_w"), F.col("_o")).alias("_w"))
            .select("_w.*")
        )
    return (
        batch.groupBy(key)
        .agg(F.max_by(payload, _ord_col(batch)).alias("_w"))
        .select("_w.*")
    )
