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
typical. For adversarial long-chain graphs, pass ``algorithm="star"``:
the alternating large-star/small-star scheme (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) converges in
O(log n) rounds regardless of diameter — two join+min+distinct stages
per round, all keyed on node ids.

The per-iteration driver loop holds only a changed-row COUNT on the
driver (no collect of data rows); each iteration's labels are
persisted and the previous generation unpersisted, so lineage stays
one generation deep no matter the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_union_find(
    nodes: DataFrame, edge_rows: list, id_col: str
) -> DataFrame:
    """Small-graph fast path: union-find with path compression on the
    driver (one collect of the edge list, one broadcast join back).
    Roots are the component minimum, matching the distributed path
    bit-for-bit."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    mapping = [(x, find(x)) for x in parent]
    spark = nodes.sparkSession
    if mapping:
        comp = spark.createDataFrame(mapping, ["id", "component"])
    else:
        comp = spark.createDataFrame([], "id long, component long")
    out = nodes.select(F.col(id_col).alias("id")).join(
        F.broadcast(comp), "id", "left"
    )
    return out.select(
        F.col("id").alias(id_col),
        F.coalesce("component", "id").alias("component"),
    )


def _canon_edges(df: DataFrame, a: str, b: str) -> DataFrame:
    """Canonical undirected edge list (u = max, v = min endpoint), no
    self-loops, deduplicated — the representation the star rounds
    rewrite in place."""
    return (
        df.filter(F.col(a) != F.col(b))
        .select(
            F.greatest(F.col(a), F.col(b)).alias("u"),
            F.least(F.col(a), F.col(b)).alias("v"),
        )
        .distinct()
    )


def _edge_fingerprint(E: DataFrame) -> tuple[int, int]:
    """(edge count, order-independent hash-sum) in ONE action; equal
    fingerprints across star rounds mean the edge set hit fixpoint.
    The hash-sum accumulates as DECIMAL(38,0) — summing raw xxhash64
    longs overflows under ANSI mode."""
    from pyspark.sql import types as T

    r = E.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast(T.DecimalType(38, 0))).alias("h"),
    ).first()
    return (r["n"] or 0, int(r["h"] or 0))


def _star_components(
    nodes: DataFrame, edges: DataFrame, id_col: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star rounds (Kiveris et al., SoCC'14
    §3): large-star links every node's LARGER neighbors to the minimum
    of its closed neighborhood; small-star links its smaller-or-equal
    neighbors (and itself) there. The edge set contracts toward a
    forest of stars rooted at each component's minimum id in O(log n)
    rounds on ANY graph — including long chains, where min-label
    propagation needs O(diameter) rounds. Per round: two
    join+min+distinct stages keyed on node ids, one fingerprint action.
    Each round's edge set is eagerly local-checkpointed rather than
    merely persisted: a round references the previous edge set several
    times (adjacency union + two min-joins), so carrying raw lineage
    grows the logical plan geometrically and stalls Catalyst analysis
    after ~10 rounds even on tiny data — the checkpoint keeps planning
    cost linear in the round count."""
    E = _canon_edges(edges, "src", "dst").localCheckpoint(eager=True)
    fp = _edge_fingerprint(E)
    converged = False
    for _ in range(max_iter):
        adj = E.select("u", "v").union(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = (
            adj.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        large = (
            adj.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        E1 = _canon_edges(large, "a", "b")
        # small-star input is already (u = larger, v = smaller), so the
        # min over smaller-or-equal neighbors is just min(v) (< u).
        m2 = E1.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            E1.join(m2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(m2.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        E2 = _canon_edges(small, "a", "b").localCheckpoint(eager=True)
        fp2 = _edge_fingerprint(E2)
        E = E2
        if fp2 == fp:
            converged = True
            break
        fp = fp2
    if not converged:
        raise RuntimeError(
            f"star connected_components did not converge in {max_iter} rounds"
        )
    # At fixpoint every edge is (node, component-min); roots and
    # isolated nodes fall back to their own id.
    labels = E.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", "id").alias("component"),
        )
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
    algorithm: str = "propagation",
) -> DataFrame:
    """Label every node with the minimum node id reachable through the
    undirected ``pairs`` graph. Returns (id_col, component) — nodes
    absent from any pair keep their own id as the component.

    Graphs with at most ``driver_threshold`` edges take the union-find
    fast path: after LSH, the candidate graph is a vanishing fraction
    of the corpus (thousands of edges from millions of docs), and a
    single collect beats 3-5 rounds of tiny distributed jobs by an
    order of magnitude. Larger graphs run the distributed algorithm:
    ``"propagation"`` (default — min-label propagation, 1 shuffle per
    round, O(diameter) rounds; right for dense shallow LSH candidate
    graphs) or ``"star"`` (large-star/small-star, ~4 shuffles per round
    but O(log n) rounds on any graph; right when components can be long
    chains). ``max_iter`` bounds either; if the fixpoint isn't reached
    a RuntimeError is raised rather than silently returning partial
    clusters."""
    if algorithm not in ("propagation", "star"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    # Persist the UNDIRECTED pair list and derive everything from that
    # cache. The old spelling doubled into a directed edge list BEFORE
    # the materializing count, so the (potentially expensive) upstream
    # pair pipeline — e.g. the MinHash candidate join + Jaccard
    # verification — executed once per union branch inside one action:
    # the whole verify ran twice to build edges once (measured ~2x the
    # r14 basis on minhash_lsh_dedup_transitive_fast at sf0.1). Caching
    # the halved pair list makes the pipeline run exactly once; the
    # driver fast path collects pairs directly (union-find treats each
    # row as an undirected union, so the reversed copies added nothing
    # but rows), and the distributed paths rebuild the doubled view
    # with two cheap cache reads.
    pairs_c = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    n_edges = pairs_c.count()
    if n_edges <= driver_threshold:
        try:
            edge_rows = [(r.src, r.dst) for r in pairs_c.collect()]
            return _driver_union_find(nodes, edge_rows, id_col)
        finally:
            pairs_c.unpersist()
    edges = pairs_c.union(
        pairs_c.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if algorithm == "star":
        try:
            return _star_components(nodes, edges, id_col, max_iter)
        finally:
            pairs_c.unpersist()
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
        pairs_c.unpersist()


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    algorithm: str = "propagation",
) -> DataFrame:
    """Transitive near-dup removal: collapse the candidate-pair graph
    to components and keep only the minimum-id row of each — so a
    chain A≈B≈C keeps exactly A even when (A, C) was never a direct
    candidate pair. ``algorithm`` passes through to
    ``connected_components`` (``"star"`` for long-chain graphs)."""
    comp = connected_components(
        df.select(F.col(id_col).alias("id")), pairs, "id", src_col, dst_col,
        max_iter, algorithm=algorithm,
    )
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
