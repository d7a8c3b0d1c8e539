"""IVF (inverted-file) approximate nearest neighbor — the coarse-
quantization scale path for similarity search, complementing the
random-hyperplane LSH variant (``functions/similarity.lsh_bucket``).

Index: every vector is assigned to its nearest centroid cell (one
broadcast join against the tiny centroid set — the N-row side never
shuffles). Search: each query probes only its ``nprobe`` nearest cells,
so exact scoring touches ``~ nprobe/K`` of the corpus instead of all of
it; the candidate join is an equi-join on cell id, broadcastable on the
query side.

Determinism contract (for the DuckDB oracle): cell assignment and top-k
both order by (rounded cosine desc, id asc) — no float-tie ambiguity
across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_ingestion_spark.functions.similarity import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame | pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k per query via broadcast + BLAS scoring.

    The query set is collected and broadcast as one normalized float64
    matrix (top-k search presumes a small query set; the corpus side
    stays fully distributed and never shuffles until the final
    ``partitions x queries x ~k``-row candidate window). Each corpus
    partition is scored against ALL queries with a single ``matmul``
    per Arrow batch, then reduced to a local top-k per query before
    anything leaves the executor — the global window only ranks the
    surviving sliver. Returns (q_id, neighbor_id, cos_sim, rk).

    Determinism: the final order is (cosine rounded to ``round_to``
    desc, neighbor_id asc). The local cut keeps every row within
    ``10**-round_to`` of the k-th raw score; rounding is monotone and
    moves a value by at most half that, so no row that could enter the
    global top-k after rounding is dropped early.

    ``queries`` may be a pandas DataFrame (columns id_col, vec_col) when
    the caller already holds the query set driver-side — a top-k search
    request IS a driver-side input, so skipping the collect job is the
    normal serving shape.
    """
    if isinstance(queries, pd.DataFrame):
        qpd = queries[[id_col, vec_col]]
    else:
        qpd = queries.select(id_col, vec_col).toPandas()
    if qpd.empty:
        # np.stack on zero arrays raises; an empty query set is a valid
        # (if degenerate) request and should return an empty frame
        return corpus.sparkSession.createDataFrame(
            [], "q_id long, neighbor_id long, cos_sim double, rk int"
        )
    if not pd.api.types.is_integer_dtype(qpd[id_col]):
        raise TypeError(
            f"brute_force_topk requires integral ids; {id_col!r} is "
            f"{qpd[id_col].dtype} (the broadcast/mapInPandas schema is long)"
        )
    qids = qpd[id_col].to_numpy().astype("int64")
    qmat = np.stack(qpd[vec_col].to_numpy()).astype("float64")
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qnorm[qnorm == 0.0] = 1.0
    bq = corpus.sparkSession.sparkContext.broadcast((qids, qmat / qnorm))
    eps = 0.0 if round_to is None else 10.0 ** (-round_to)

    def _score(batches):
        q_ids, q_n = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy().astype("int64")
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            mnorm = np.linalg.norm(m, axis=1, keepdims=True)
            mnorm[mnorm == 0.0] = 1.0
            sims = q_n @ (m / mnorm).T  # (n_queries, batch)
            n = sims.shape[1]
            if n > k:
                cut = np.partition(sims, n - k, axis=1)[:, n - k] - eps
            else:
                cut = np.full(sims.shape[0], -2.0)
            qi, ni = np.nonzero(sims >= cut[:, None])
            yield pd.DataFrame(
                {
                    "q_id": q_ids[qi],
                    "neighbor_id": ids[ni],
                    "cos_sim": sims[qi, ni],
                }
            )

    scored = corpus.mapInPandas(_score, "q_id long, neighbor_id long, cos_sim double")
    if round_to is not None:
        scored = scored.withColumn("cos_sim", F.round("cos_sim", round_to))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cv",
    nprobe: int = 1,
) -> DataFrame:
    """Rank centroid cells per vector; keep the ``nprobe`` nearest.
    Returns (id_col, cell, cell_rank). ``nprobe=1`` builds the index
    assignment; ``nprobe>1`` builds a query probe list."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        id_col,
        F.col(centroid_id_col).alias("cell"),
        F.round(
            cosine_similarity(F.col(vec_col), F.col(centroid_vec_col)), 6
        ).alias("c_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("c_sim").desc(), F.col("cell").asc()
    )
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= nprobe)
        .select(id_col, "cell", "cell_rank")
    )


def kmeans_refine(
    vectors: DataFrame,
    centroids: DataFrame,
    dim: int,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "v",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cv",
    round_to: int | None = 6,
    cache: bool = True,
) -> DataFrame:
    """Lloyd k-means refinement of IVF centroids as pure aggregations.

    Each iteration: explode vectors against the broadcast centroid set,
    pick each vector's best cell with one ``max_by`` aggregation that
    carries the vector itself through (no window, no join back to
    ``vectors`` — the window+join form pays an extra N-row shuffle per
    iteration), then recompute each cell's centroid as the per-dimension
    mean via ``dim`` built-in ``avg`` aggregates — partial aggregation
    map-side, nothing leaves the JVM. Cells that lost all members keep
    their previous centroid (the classic empty-cluster guard).
    Assignment is by cosine, so means are left unnormalized (cosine is
    scale-invariant).

    Tie-break matches ``ivf_assign`` and the DuckDB oracle: rounded
    cosine desc, then cell id asc (``max_by`` over (c_sim, -cell)).

    ``round_to`` pins centroid components to a fixed precision so a
    cross-engine oracle reproduces the refined centroids bit-for-bit.

    ``cache`` persists each iteration's K-row centroid frame and eagerly
    materializes it (MLlib-style iterative pattern), unpersisting the
    previous iteration's frame once the next exists. Without it the
    lineage doubles per iteration (``cents`` is referenced by both the
    scoring cross join and the empty-cluster guard) and every downstream
    use of the result re-runs the whole refinement — measured 2x on the
    cold ann_ivf_refined query even at iterations=1. The RETURNED frame
    stays cached; a long-lived caller should ``unpersist()`` it when the
    index build is done.
    """
    cents = centroids
    prev_cached = None
    for _ in range(iterations):
        sim = cosine_similarity(F.col(vec_col), F.col(centroid_vec_col))
        if round_to is not None:
            sim = F.round(sim, round_to)
        scored = vectors.crossJoin(F.broadcast(cents)).select(
            id_col,
            F.col(vec_col),
            F.col(centroid_id_col).alias("cell"),
            sim.alias("c_sim"),
        )
        member = scored.groupBy(id_col).agg(
            F.max_by(
                "cell", F.struct(F.col("c_sim"), (-F.col("cell")).alias("nc"))
            ).alias("cell"),
            F.first(vec_col).alias(vec_col),
        )
        means = member.groupBy("cell").agg(
            *[F.avg(F.col(vec_col)[i]).alias(f"_m{i}") for i in range(dim)]
        )
        comps = [
            F.round(F.col(f"_m{i}"), round_to) if round_to is not None
            else F.col(f"_m{i}")
            for i in range(dim)
        ]
        new = means.select(
            F.col("cell").alias(centroid_id_col),
            F.array(*comps).alias("__new_cv"),
        )
        cents = (
            cents.join(new, on=centroid_id_col, how="left")
            .select(
                centroid_id_col,
                F.coalesce("__new_cv", centroid_vec_col).alias(centroid_vec_col),
            )
        )
        if cache:
            cents = cents.cache()
            cents.count()  # materialize NOW so the predecessor can go
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = cents
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
    exclude_same_id: bool = True,
) -> DataFrame:
    """Top-k cosine neighbors per query among vectors indexed in the
    query's ``nprobe`` nearest cells. Returns
    (q_id, neighbor_id, cos_sim, rk).

    ``exclude_same_id`` removes candidates whose id equals the query id —
    correct when queries are drawn FROM the corpus (self-match
    suppression); set False when queries and corpus are distinct datasets
    whose id spaces overlap (an equal id is then a different vector)."""
    index = ivf_assign(vectors, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "cell"
    )
    probes = ivf_assign(queries, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("q_id"), "cell"
    )

    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    nv = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    cand = (
        F.broadcast(probes)
        .join(index, "cell")
        .filter(
            (F.col("q_id") != F.col("neighbor_id"))
            if exclude_same_id
            else F.lit(True)
        )
        .select("q_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(qv), "q_id")
        .join(nv, "neighbor_id")
        .select(
            "q_id",
            "neighbor_id",
            F.round(cosine_similarity("qv", "nv"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
