"""Distributed connected components — the cluster-assignment primitive
behind the near-dup dedup family.

Near-dup operators must ship ``(doc_id, canonical_id)`` cluster
assignments, not pair lists: a boilerplate group of n identical
documents is n(n-1)/2 pairs (5x10^11 rows for n=10^6 — common in web
corpora) but only n assignment rows. The pair list stays available as a
small-scale/debug view; this module provides the scale-safe output.

Algorithm: min-label propagation with pointer jumping (a DataFrame
re-expression of the classic Hash-Min / "large-star" CC family used by
GraphX and the MapReduce CC literature — Kiveris et al., "Connected
Components in MapReduce and Beyond"). Each round is two equi-joins on
the edge list; pointer jumping halves the remaining label-tree depth
per round, so convergence is O(log d) rounds for diameter d. Labels are
node ids, so the fixpoint label IS the minimum node id of the
component — a deterministic canonical id.

Scale notes:
- every round's work is proportional to |E| + |V| (shuffle on node id)
  — no step is quadratic in component size;
- ``localCheckpoint`` truncates the logical plan each round; without it
  the iterative lineage grows exponentially and planning time dominates
  (on a real cluster swap for ``checkpoint()`` on reliable storage);
- the per-round convergence check is a single count aggregate (one
  scalar to the driver, never rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node, where ``component`` is the
    minimum node id reachable over ``edges`` (undirected). ``nodes``
    optionally supplies the full vertex set (isolated vertices become
    singleton components); otherwise vertices are the edge endpoints.

    Invariants maintained every round (proof of correctness):
    (a) label(v) <= v, (b) label(v) is a node id inside v's component.
    Propagation takes the min over neighbor labels (preserves both);
    pointer jumping replaces label(v) with label(label(v)) — legal
    because (b) holds for the label node itself. At the fixpoint,
    symmetry forces label(u) == label(v) across every edge, so labels
    are constant per component, and (a)+(b) pin that constant to the
    component minimum."""
    # NO distinct() on the edge list: duplicate edges only add rows to
    # the min-aggregating propagate step, which partial-aggregates them
    # away map-side — dedup here would cost a full wide shuffle of |E|
    # (then another for the symmetrized union) purely to remove rows
    # the aggregation absorbs for free.
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col("s") != F.col("d"))
        .localCheckpoint(eager=False)  # the union below consumes e twice;
        # without this the (possibly expensive) edge-producing plan runs
        # once per branch
    )
    sym = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )

    if nodes is not None:
        verts = nodes.select(F.col(node_col).alias("node")).distinct()
    else:
        verts = (
            sym.select(F.col("s").alias("node"))
            .unionByName(sym.select(F.col("d").alias("node")))
            .distinct()
        )

    sym = sym.localCheckpoint(eager=True)
    lab = verts.select("node", F.col("node").alias("label")).localCheckpoint(
        eager=True
    )

    changed = -1
    for _ in range(max_iter):
        # propagate: label(v) <- min(label(v), min over neighbors u of label(u))
        nbr_min = (
            sym.join(lab, sym["s"] == lab["node"])
            .groupBy(F.col("d").alias("node"))
            .agg(F.min("label").alias("nbr"))
        )
        prop = (
            lab.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr", "label")).alias("label"),
            )
        )
        # pointer jump: label(v) <- label(label(v))
        l2 = lab.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        jumped = (
            prop.join(l2, prop["label"] == l2["jnode"], "left")
            .select(
                "node", F.coalesce("jlabel", "label").alias("label")
            )
        ).localCheckpoint(eager=True)

        changed = (
            jumped.join(lab.withColumnRenamed("label", "old"), "node")
            .where(F.col("label") != F.col("old"))
            .count()
        )
        lab = jumped
        if changed == 0:
            break
    if changed != 0:
        # returning partially-propagated labels would silently split
        # one real component into several clusters — fail loudly
        # instead (pointer jumping needs only O(log diameter) rounds,
        # so hitting this means max_iter is badly undersized)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"rounds ({changed} labels still changing)"
        )

    return lab.select("node", F.col("label").alias("component"))
