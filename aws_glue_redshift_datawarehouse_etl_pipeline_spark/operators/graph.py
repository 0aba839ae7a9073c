"""Connected components over candidate-pair graphs — the missing
piece between pairwise near-duplicate detection and CLUSTER-level
deduplication: if A≈B and B≈C but A and C are not direct candidates,
pair-based removal can keep both A's and C's cluster alive. Collapsing
the pair graph to components first makes dedup transitive.

Algorithm: iterative min-label propagation (each node adopts the
minimum label in its neighborhood until fixpoint). Per iteration: one
equi-join of the edge list against current labels + one groupBy(min) —
both shuffles keyed on the node id, map-side combinable. Converges in
O(component diameter) iterations; near-dup clusters are dense and
shallow (duplicates of one source document), so 3-5 iterations is
typical. For adversarial long-chain graphs, the large-star/small-star
scheme (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) drops this to O(log n) rounds — same per-round
join+min shape, so it slots in here if ever needed.

The per-iteration driver loop holds only a changed-row COUNT on the
driver (no collect of data rows); each iteration's labels are
persisted and the previous generation unpersisted, so lineage stays
one generation deep no matter the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id reachable through the
    undirected ``pairs`` graph. Returns (id_col, component) — nodes
    absent from any pair keep their own id as the component.

    ``max_iter`` bounds the propagation; if the fixpoint isn't reached
    (component diameter exceeds the bound) a RuntimeError is raised
    rather than silently returning partial clusters."""
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).persist()
    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    labels.select(
                        F.col("id").alias("dst"), F.col("component").alias("c")
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("c").alias("nbr_min"))
            )
            new_labels = (
                labels.join(nbr_min, labels.id == nbr_min.src, "left")
                .select(
                    labels.id,
                    F.least(
                        labels.component, F.coalesce("nbr_min", labels.component)
                    ).alias("component"),
                )
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                return labels.select(F.col("id").alias(id_col), "component")
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    finally:
        edges.unpersist()


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Transitive near-dup removal: collapse the candidate-pair graph
    to components and keep only the minimum-id row of each — so a
    chain A≈B≈C keeps exactly A even when (A, C) was never a direct
    candidate pair."""
    comp = connected_components(
        df.select(F.col(id_col).alias("id")), pairs, "id", src_col, dst_col, max_iter
    )
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
