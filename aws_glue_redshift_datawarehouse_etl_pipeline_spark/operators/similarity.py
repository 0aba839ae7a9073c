"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact-decimal dot products — one
scan, TakeOrdered, no shuffle of the corpus). Scale path: IVF-style
coarse quantization — assign vectors to the nearest of C centroids at
index time (one narrow pass), probe only the nprobe nearest clusters at
query time (prunes the scan to ~nprobe/C of the corpus). Centroid
choice is deterministic (seeded sample) so results are reproducible.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.dedup import cosine_sim_exact
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import spread_small_scan


def _lit_vec(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def _lit_vec_sql(vec: Sequence[float]) -> str:
    """The query vector as a SQL array literal of doubles. Values are
    embedded as CAST('<repr>' AS DOUBLE): repr round-trips IEEE doubles
    exactly and the string-cast spelling parses identically under any
    literal-parsing config, so the array is bit-identical to
    ``_lit_vec``'s."""
    return (
        "array("
        + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vec)
        + ")"
    )


def assign_clusters(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "__cluster",
    probe: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment as Arrow-batched numpy GEMM
    (``mapInPandas``): each batch computes (rows × dims) @
    (dims × centroids) against the broadcast centroid matrix in one
    BLAS call. Ranking is dot(v, c)/|c| — same argmax as full cosine
    because the row norm is constant across centroids.

    This replaced per-centroid Catalyst higher-order-function dot
    products after the sf0.1→sf1 scale decade (SCALE.md): that
    spelling cost O(rows × centroids) interpreted lambda steps with a
    plan tree O(centroids) wide, and since the centroid count scales
    with the corpus (~bucket_target vectors per bucket), assignment was
    the hidden quadratic term. The GEMM keeps the plan O(1) and the
    centroid matrix is C×D float64 shipped once per executor.

    ``probe=1`` appends ``out_col`` with the single nearest centroid id
    (ties break to the earliest centroid in ``cents`` order, matching
    the argmax-first-match rule the expression path used). ``probe>1``
    emits one row per (vector, probed centroid) — the multi-probe
    explode — with ties ranked by (-similarity, centroid id)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    cid_arr = np.array([cid for cid, _ in cents], dtype=np.int64)
    cmat = np.array([v for _, v in cents], dtype=np.float64)
    norms = np.sqrt((cmat * cmat).sum(axis=1))
    inv = np.divide(1.0, norms, out=np.zeros_like(norms), where=norms > 0)
    cunit_t = (cmat * inv[:, None]).T  # dims × centroids

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.LongType(), False)]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            sims = mat @ cunit_t  # rows × centroids
            if probe == 1:
                # np.argmax returns the FIRST max — the list-order
                # tie-break the expression path's array_position had
                pdf = pdf.copy()
                pdf[out_col] = cid_arr[np.argmax(sims, axis=1)]
                yield pdf
            else:
                order = np.lexsort(
                    (np.broadcast_to(cid_arr, sims.shape), -sims), axis=1
                )[:, :probe]
                reps = order.shape[1]
                rep_idx = np.repeat(np.arange(len(pdf)), reps)
                out = pdf.iloc[rep_idx].copy()
                out[out_col] = cid_arr[order.ravel()]
                yield out

    return df.mapInPandas(gen, schema)


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    float_prefilter: bool = False,
    prefilter_margin: int = 50,
) -> DataFrame:
    """Brute-force top-k by cosine similarity against one query vector.
    Plans as scan → project → TakeOrderedAndProject: per-partition
    heaps, driver merge — no global sort. (Under-partitioned local
    scans are spread first so the per-row fold uses every core; at
    scale that spread is a no-op and the plan stays shuffle-free.)

    ``float_prefilter=True`` is the two-phase 100 TB spelling: phase A
    scores every row with a float64 numpy GEMM (Arrow batches — no
    per-row interpreted decimal fold on the corpus path) and takes the
    top ``k + prefilter_margin`` by (float cosine desc, id asc); phase
    B re-scores ONLY the candidates with the exact-decimal fold and
    returns the exact top-k. Result identity: float and exact cosine
    are sums of the SAME IEEE-double products, differing only in
    summation rounding — |fcos - ecos| <= ~1e-10 for the dimensions
    and magnitudes here, and the candidate cut keeps every row with
    fcos >= (k-th fcos) - 2e-6, so any row whose EXACT score reaches
    the exact top-k (ecos >= e_k >= t_k - 1e-6, hence fcos >= t_k -
    2e-6) survives the prefilter; the exact re-rank then orders the
    superset identically to the one-phase plan (ties broken by id in
    both). When the cut cannot be certified inside the collected
    candidates (pathological near-ties wider than the margin, or
    fewer than k finite scores), the call falls back to the exact
    one-phase plan — correctness never rests on the margin."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.dedup import (
        cosine_sim_exact_sql,
    )
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
        _quote_ident,
    )

    # single-expr spelling of the exact score (one py4j round trip;
    # the functions-API tree costs ~150 ms to build per call — values
    # bit-identical, see dot_exact_sql)
    score = F.expr(
        cosine_sim_exact_sql(_quote_ident(vec_col), _lit_vec_sql(query_vec))
    )
    spread = spread_small_scan(df, id_col)
    if float_prefilter:
        ids = _gemm_topk_candidate_ids(
            spread, query_vec, k, id_col, vec_col, prefilter_margin
        )
        if ids is not None:
            spread = spread.filter(F.col(id_col).isin(*ids))
        # ids is None -> margin could not certify the cut; exact
        # one-phase plan below is the fallback
    return (
        spread
        .select(F.col(id_col), score.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col).asc())
        .limit(k)
    )


def _gemm_topk_candidate_ids(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int,
    id_col: str,
    vec_col: str,
    margin: int,
) -> list | None:
    """Phase A of the two-phase top-k (see ``cosine_topk``): float64
    GEMM scores per Arrow batch, driver-side top-(k+margin) collect,
    certified candidate cut at (k-th float score) - 2e-6. Returns the
    candidate id list, or None when the cut cannot be certified and
    the caller must run the exact one-phase plan."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    if qn == 0.0:
        return None  # degenerate query vector: exact path decides
    id_field = df.schema[id_col]
    schema = T.StructType(
        [id_field, T.StructField("fcos", T.DoubleType(), True)]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(
                np.float64, copy=False
            )
            norms = np.sqrt((mat * mat).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                fcos = (mat @ q) / (norms * qn)
            # zero-norm rows score NULL in the exact plan and can never
            # reach a finite top-k; -inf keeps them out of the cut
            fcos = np.where(np.isfinite(fcos), fcos, -np.inf)
            yield pd.DataFrame({id_col: pdf[id_col], "fcos": fcos})

    cand = (
        df.select(id_col, vec_col)
        .mapInPandas(gen, schema)
        .orderBy(F.desc("fcos"), F.col(id_col).asc())
        .limit(k + margin)
        .collect()
    )
    if len(cand) < k:
        return None  # fewer finite rows than k: exact path decides
    eps2 = 2e-6
    t_k = cand[k - 1]["fcos"]
    if t_k == float("-inf"):
        return None
    if len(cand) == k + margin and cand[-1]["fcos"] >= t_k - eps2:
        # the cut extends past the collected margin — cannot certify
        return None
    return [r[id_col] for r in cand if r["fcos"] >= t_k - eps2]


def cosine_topk_per_query(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Batch top-k: broadcast the (small) query set against the corpus,
    rank per query with a window. The corpus never shuffles; the only
    wide stage is the per-query top-k window on (query_id)."""
    from pyspark.sql import Window

    joined = corpus.crossJoin(F.broadcast(queries)).withColumn(
        "cosine", cosine_sim_exact(F.col(vec_col), F.col(query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col).asc()
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cosine", "rk")
    )


def refine_centroids(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    rounds: int = 2,
) -> list[tuple[int, list[float]]]:
    """Lloyd refinement of seed centroids (the documented k-means
    upgrade, run at index-build time): assign → per-cluster elementwise
    mean → repeat. Each round is one narrow assignment pass plus one
    aggregation shuffled on (cluster, dim) — C×D cells, map-side
    combined — and a C×D-float collect (tiny). Clusters that lose all
    members keep their previous centroid. Refined centroids tighten
    bucket balance and probe recall vs the raw hash-spread sample at
    the cost of ``rounds`` extra passes over the corpus."""
    for _ in range(rounds):
        assigned = assign_clusters(df, cents, vec_col, out_col="__c")
        means = (
            assigned.select("__c", F.posexplode(vec_col).alias("i", "x"))
            .groupBy("__c", "i")
            .agg(F.avg("x").alias("m"))
        )
        bydim: dict[int, dict[int, float]] = {}
        for r in means.collect():
            bydim.setdefault(r["__c"], {})[r["i"]] = float(r["m"])
        cents = [
            (cid, [bydim[cid][i] for i in sorted(bydim[cid])])
            if cid in bydim
            else (cid, vec)
            for cid, vec in cents
        ]
    return cents


def build_ivf_index(
    df: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_rounds: int = 0,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """One-pass IVF index: centroids are a deterministic hash-spread
    sample — ordered by ``xxhash64(id)`` rather than raw id, so the
    choice is content-independent (ids usually correlate with ingestion
    order, and the lowest-id prefix would skew buckets badly); swap in
    k-means|| offline for better balance. Every vector is assigned to
    its nearest centroid. Returns (assigned corpus, centroid list). The
    assignment is a narrow map over a broadcast centroid array."""
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(num_centroids)
        .collect()
    ]
    if refine_rounds:
        cents = refine_centroids(df, cents, vec_col, refine_rounds)
    return assign_clusters(df, cents, vec_col), cents


def ivf_topk(
    assigned: DataFrame,
    cents: list[tuple[int, list[float]]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: rank centroids by similarity to the query,
    scan only the nprobe nearest clusters. With cluster pruning pushed
    into a partition filter (write the index partitioned by __cluster),
    the scan reads ~nprobe/C of the data."""
    import math

    def cos(a: Sequence[float], b: Sequence[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    probe = sorted(cents, key=lambda c: (-cos(c[1], list(query_vec)), c[0]))[:nprobe]
    probe_ids = [c[0] for c in probe]
    return cosine_topk(
        assigned.filter(F.col("__cluster").isin(probe_ids)),
        query_vec,
        k,
        id_col,
        vec_col,
    )


def write_ivf_index(
    df: DataFrame,
    path: str,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Persist the IVF index partitioned by cluster id: one directory
    per centroid, so a probe of ``nprobe`` clusters reads only those
    directories (Catalyst partition pruning — the scan never touches
    the other ~(C-nprobe)/C of the corpus). Returns the centroid list
    (store it beside the index in production)."""
    assigned, cents = build_ivf_index(df, num_centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("__cluster").parquet(path)
    return cents


def ivf_topk_from_index(
    spark,
    path: str,
    cents: list[tuple[int, list[float]]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k over a persisted IVF index. The cluster filter
    is a partition-column predicate, so pruning happens at file-listing
    time (verify: .explain shows PartitionFilters on __cluster)."""
    import math

    def cos(a: Sequence[float], b: Sequence[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    probe = sorted(cents, key=lambda c: (-cos(c[1], list(query_vec)), c[0]))[:nprobe]
    probe_ids = [c[0] for c in probe]
    assigned = spark.read.parquet(path).filter(F.col("__cluster").isin(probe_ids))
    return cosine_topk(assigned, query_vec, k, id_col, vec_col)
