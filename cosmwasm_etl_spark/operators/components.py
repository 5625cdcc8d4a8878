"""Connected components over a pair graph — dedup-cluster canonicalization.

The missing last step of every near-dup pipeline: pair output (a, b) must
become CLUSTERS so one canonical document per cluster survives. The
reference has no analog (its dedup is keyed upserts); this is a
training-data op from the build brief, done Spark-first.

Physical shape (100 TB survival): iterative MIN-LABEL PROPAGATION on
DataFrames — per round, each vertex takes the min of its own label and its
neighbors' labels (one groupBy per round over the undirected edge list,
map-side combined). Rounds needed = graph diameter, and near-dup clusters
are small and dense (diameter ≤ ~3 for transitive near-dup chains), so the
loop converges in a handful of shuffles; a fixpoint check (count of changed
labels — one action per round) terminates early. No driver-side graph state
of any kind; edges are never collected. For adversarial long-chain graphs
the classic large-star/small-star doubling (Kiveris et al.) drops rounds to
O(log d) — the propagation step below is the building block either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(id, component) for every vertex in ``edges`` — component = min
    vertex id reachable, so labels are deterministic and hash-free.

    ``checkpoint_every``: iterative DataFrame plans grow linearly; every K
    rounds the lineage is cut via ``localCheckpoint`` (cluster-safe: uses
    executor storage, no driver collect).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # undirected: propagate both ways in one frame
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.filter(F.col("a") != F.col("b")).distinct()

    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for i in range(max_iter):
        # each vertex: min(own label, neighbors' labels)
        neighbor_min = (
            und.join(labels.withColumnRenamed("id", "b").withColumnRenamed("component", "nc"), "b")
            .groupBy("a")
            .agg(F.min("nc").alias("nmin"))
            .withColumnRenamed("a", "id")
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias("component"),
                (F.coalesce(F.col("nmin"), F.col("component")) < F.col("component")).alias("__chg"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("__chg")).limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            return labels
    # plain min-propagation needs diameter rounds; silently returning an
    # UNCONVERGED labeling would split clusters undetectably — refuse and
    # tell the caller to raise max_iter (or switch to star-doubling)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(graph diameter exceeds max_iter)"
    )


def dedup_clusters(
    pairs: DataFrame, all_ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, canonical_id, cluster_size) over the WHOLE corpus: documents
    in a near-dup cluster map to the cluster's min doc id; singletons map to
    themselves with size 1. Keeping ``doc_id != canonical_id`` rows is the
    delete-list; ``canonical_id`` distinct is the surviving corpus."""
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    clustered = comp.join(sizes, "component").select(
        F.col("id").alias(id_col),
        F.col("component").alias("canonical_id"),
        "cluster_size",
    )
    singletons = (
        all_ids.select(F.col(id_col))
        .join(clustered.select(id_col), id_col, "left_anti")
        .select(
            F.col(id_col),
            F.col(id_col).alias("canonical_id"),
            F.lit(1).cast("long").alias("cluster_size"),
        )
    )
    return clustered.unionByName(singletons)
