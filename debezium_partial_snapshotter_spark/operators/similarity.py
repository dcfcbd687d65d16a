"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  The query set broadcasts (it is small by construction); the dot
  product is ``F.zip_with``/``F.aggregate`` — JVM-side, no Python.
- ``ivf_topk``: the scale path. A deterministic IVF-style index:
  centroid list = the first ``n_cells`` vectors (a fixed, reproducible
  choice); every vector is assigned to its nearest centroid cell ONCE
  (an O(n·C) map, no shuffle), and a query probes only ``n_probe``
  cells — an equi-join on cell id instead of a full scan. At 100 TB the
  probe join touches n_probe/C of the data; recall is tested against
  brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _normed(df: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )
    return df.select(
        F.col(id_col).alias(out_id),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / norm).alias(
            out_id + "_v"
        ),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. queries is broadcast; ranking window
    partitions by query id (bounded: k rows survive per query)."""
    from debezium_partial_snapshotter_spark.functions import spread_input

    # the corpus-side normalize + |corpus| x |queries| dot products are
    # the heavy pass; a one-row-group scan would run it in one task
    # (measured 1.2s single-task stage at sf0.1)
    c = _normed(spread_input(corpus), id_col, vec_col, "item_id")
    q = _normed(queries, id_col, vec_col, "query_id")
    scored = c.join(F.broadcast(q)).where(
        F.col("item_id") != F.col("query_id")
    ).select(
        "query_id",
        "item_id",
        F.round(_dot(F.col("query_id_v"), F.col("item_id_v")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def assign_cells(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: centroids = the first n_cells vectors by id
    (deterministic); each vector joins its argmax-cosine cell."""
    from debezium_partial_snapshotter_spark.functions import spread_input

    # same single-task-scan hazard as cosine_topk: the assignment pass
    # scores every vector against every centroid
    c = _normed(spread_input(corpus), id_col, vec_col, "item_id")
    cents = _normed(
        corpus.orderBy(id_col).limit(n_cells), id_col, vec_col, "cell"
    )
    scored = c.join(F.broadcast(cents)).select(
        "item_id",
        "item_id_v",
        "cell",
        _dot(F.col("item_id_v"), F.col("cell_v")).alias("cs"),
    )
    w = Window.partitionBy("item_id").orderBy(F.col("cs").desc(), F.col("cell").asc())
    assigned = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("item_id", "item_id_v", "cell")
    )
    return assigned, cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the n_probe nearest cells per
    query. The candidate join is an equi-join on cell id."""
    assigned, cents = assign_cells(corpus, n_cells, id_col, vec_col)
    q = _normed(queries, id_col, vec_col, "query_id")
    qcells = q.join(F.broadcast(cents)).select(
        "query_id",
        "query_id_v",
        "cell",
        _dot(F.col("query_id_v"), F.col("cell_v")).alias("cs"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("cell").asc())
    probes = (
        qcells.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= n_probe)
        .select("query_id", "query_id_v", "cell")
    )
    cand = probes.join(assigned, "cell").where(
        F.col("item_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "item_id",
        F.round(_dot(F.col("query_id_v"), F.col("item_id_v")), 4).alias("cosine"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )
