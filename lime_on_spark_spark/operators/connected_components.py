"""Connected components over an edge list (iterative min-label propagation).

The transitive-closure primitive under duplicate-cluster formation
(plans/textpipe.py d10) and any entity-resolution pipeline: A~B, B~C =>
{A, B, C} share one component id (the minimum node id reachable).

Scale shape: each round is a keyed join (messages flow along edges) plus a
min-aggregate — two shuffles on node id, no driver-side data; rounds are
bounded by the graph diameter (tiny for dup graphs: chains of
near-identical docs). `localCheckpoint` truncates the per-round lineage so
plans stay flat. For web-graph diameters, swap the propagation loop for
the large-star/small-star alternation — same per-round shape.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "a", dst: str = "b", max_rounds: int = 25
) -> DataFrame:
    """Return (node, component) for every node in `edges`; component is the
    minimum node id in the connected component. Edges are undirected."""
    # Checkpoint the DIRECTED edge list first, then build the symmetric
    # view from the checkpoint: both union branches and everything the loop
    # derives (labels, per-round messages) must descend from the
    # materialized edges, or the (possibly very expensive) upstream pair
    # generation re-runs once per union branch and again on labels' first
    # use.
    e = edges.selectExpr(f"{src} AS a", f"{dst} AS b").localCheckpoint(
        eager=True
    )
    sym = e.union(e.selectExpr("b AS a", "a AS b"))
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_rounds):
        msgs = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), "label"
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Exhausted max_rounds without converging: labels are an upper
        # bound on the true components (some may still merge). Silent
        # wrong answers are worse than noise — warn so callers can raise
        # max_rounds (diameter exceeded it) or switch to star-contraction.
        warnings.warn(
            f"connected_components did not converge within {max_rounds} "
            f"rounds ({changed} labels still changing); component ids may "
            "be split too fine. Increase max_rounds or use "
            "large-star/small-star contraction for high-diameter graphs.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("node", F.col("label").alias("component"))
