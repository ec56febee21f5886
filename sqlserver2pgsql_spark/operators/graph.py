"""Connected components over a pair graph — dedup *clustering*.

Pair generators (exact Jaccard, MinHash LSH, SimHash, embedding near-dup)
emit edges; curation needs the transitive closure: one keeper per duplicate
CLUSTER. A near-dup graph's components are tiny and shallow (chains of
mutated copies), so iterative min-label propagation converges in a few
rounds.

Scale shape: each iteration is one join + one groupBy (two shuffles) over
the edge list; the only driver-side value is the per-iteration convergence
count (a scalar). Lineage is truncated every iteration via localCheckpoint so
plans don't grow unboundedly. At extreme scale swap the propagation loop
for the large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce", SOCC'14) — same API, fewer rounds on
high-diameter graphs; near-dup graphs don't have those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id is the
    component's minimum node id — deterministic, and exactly what a
    min-keeper dedup policy wants.

    Min-label propagation: every node starts labeled with itself; each round
    every node takes the min of its own and its neighbors' labels; stop when
    a round changes nothing (or after ``max_iter`` — a diameter bound, far
    above any near-dup component's)."""
    # checkpoint the projected edges BEFORE the symmetric union: the edge
    # input is typically an expensive pair-generation pipeline, and the
    # union's two branches would otherwise each evaluate it
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=False
    )
    # size the loop's shuffles to the EDGE COUNT, not the session default:
    # a state-of-the-art pair graph is ≪ the corpus (near-dup edges), and
    # every iteration pays per-partition scheduling on two shuffles + a
    # count — 32 partitions over hundreds of edges is all overhead, while
    # 1e9 edges get ~2000. The count also materializes the checkpoint so
    # the (expensive) pair pipeline runs exactly once.
    n_edges = e.count()
    n_part = max(1, min(n_edges // 500_000 + 1, 2048))
    spark = edges.sparkSession
    shuffle_key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(shuffle_key)
    spark.conf.set(shuffle_key, str(n_part))
    try:
        sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        sym = sym.localCheckpoint(eager=False)  # read every iteration
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("cluster_id"))
            .localCheckpoint(eager=False)
        )
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, sym["a"] == labels["node"])
                .select(F.col("b").alias("node"), "cluster_id")
                .groupBy("node")
                .agg(F.min("cluster_id").alias("nbr_min"))
            )
            # carry the old label through so convergence is a filter over the
            # checkpointed result, not another shuffle join per iteration
            new_labels = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("cluster_id"),
                        F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                    ).alias("cluster_id"),
                    F.col("cluster_id").alias("__old"),
                )
                .localCheckpoint(eager=False)
            )
            changed = new_labels.filter(F.col("cluster_id") != F.col("__old")).count()
            labels = new_labels.drop("__old")
            if changed == 0:
                break
    finally:
        spark.conf.set(shuffle_key, old_parts)
    return labels
