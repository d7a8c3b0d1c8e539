"""Maintained IVF index (operators/incremental_ann): the incremental
formulation must agree row-for-row with the one-shot ``ivf_topk``, the
index must be append-order invariant, the search read must actually
prune to the probed cells' partitions, and cadence retraining must match
the batch refine."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.operators.ann import ivf_topk, kmeans_refine
from lakehouse_ingestion_spark.operators.incremental_ann import (
    append_postings,
    assign_postings,
    read_postings,
    retrain_postings,
    search_postings,
)

DIM = 8
K_CELLS = 4


def _corpus(spark, n=120, seed=7):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, DIM)).round(3)
    rows = [(int(i), [float(x) for x in mat[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cent = emb.where(F.col("vec_id") < K_CELLS).selectExpr(
        "vec_id as cid", "v as cv"
    )
    corpus = emb.where(F.col("vec_id") >= K_CELLS + 6)
    queries = emb.where(
        (F.col("vec_id") >= K_CELLS) & (F.col("vec_id") < K_CELLS + 6)
    )
    return corpus, queries, cent


def _rows(df):
    return sorted(
        (r["q_id"], r["neighbor_id"], round(r["cos_sim"], 6), r["rk"])
        for r in df.collect()
    )


def test_maintained_search_matches_one_shot(spark, tmp_path):
    corpus, queries, cent = _corpus(spark)
    path = str(tmp_path / "ivf_idx")
    # ingest in three arbitrary batches
    for i in range(3):
        append_postings(corpus.where(F.col("vec_id") % 3 == i), cent, path)
    postings = read_postings(spark, path)
    assert postings.count() == corpus.count()

    got = search_postings(postings, queries, cent, k=3, nprobe=2)
    want = ivf_topk(corpus, queries, cent, k=3, nprobe=2)
    assert _rows(got) == _rows(want)


def test_append_order_invariance(spark):
    corpus, _, cent = _corpus(spark, n=60)
    whole = assign_postings(corpus, cent)
    split = None
    for i in range(4):
        part = assign_postings(corpus.where(F.col("vec_id") % 4 == i), cent)
        split = part if split is None else split.unionByName(part)
    key = lambda df: sorted(
        (r["vec_id"], r["cell"]) for r in df.select("vec_id", "cell").collect()
    )
    assert key(whole) == key(split)


def test_search_read_is_partition_pruned(spark, tmp_path):
    corpus, queries, cent = _corpus(spark)
    path = str(tmp_path / "ivf_idx")
    append_postings(corpus, cent, path)
    postings = read_postings(spark, path)

    # one query, nprobe=1: only ONE cell directory may be read
    one_q = queries.limit(1)
    out = search_postings(postings, one_q, cent, k=3, nprobe=1)
    assert out.count() > 0

    # the same pruning filter, checked at the file level: every input
    # file of the pruned scan lives under a probed cell's directory
    from lakehouse_ingestion_spark.operators.ann import (
        _centroids_to_driver,
        _probe_cells,
    )

    qpd = one_q.toPandas()
    cids, cmat = _centroids_to_driver(cent, "cid", "cv")
    probe = int(
        _probe_cells(
            np.stack(qpd["v"].to_numpy()).astype("float64"), cids, cmat, 1
        )[0, 0]
    )
    files = {
        r[0]
        for r in postings.where(F.col("cell").isin([probe]))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert files, "pruned scan read nothing"
    assert all(f"cell={probe}/" in f for f in files), files


def test_retrain_matches_batch_refine(spark, tmp_path):
    corpus, queries, cent = _corpus(spark, n=80)
    path = str(tmp_path / "ivf_idx")
    append_postings(corpus, cent, path)
    postings = read_postings(spark, path)

    refined, new_postings = retrain_postings(
        postings, cent, dim=DIM, iterations=2
    )
    want_cent = kmeans_refine(corpus, cent, dim=DIM, iterations=2)
    cent_rows = lambda df: sorted(
        (r["cid"], tuple(round(x, 9) for x in r["cv"])) for r in df.collect()
    )
    assert cent_rows(refined) == cent_rows(want_cent)

    # reassigned postings match a fresh assignment under the refined set
    want_assign = assign_postings(corpus, want_cent)
    key = lambda df: sorted(
        (r["vec_id"], r["cell"]) for r in df.select("vec_id", "cell").collect()
    )
    assert key(new_postings) == key(want_assign)

    # and the post-retrain search still matches the one-shot plan
    got = search_postings(new_postings, queries, refined, k=3, nprobe=2)
    want = ivf_topk(corpus, queries, want_cent, k=3, nprobe=2)
    assert _rows(got) == _rows(want)


def test_empty_queries_and_nonintegral_id(spark):
    corpus, _, cent = _corpus(spark, n=30)
    postings = assign_postings(corpus, cent)
    out = search_postings(
        postings, corpus.sparkSession.createDataFrame(
            [], "vec_id long, v array<double>"
        ), cent, k=3,
    )
    assert out.columns == ["q_id", "neighbor_id", "cos_sim", "rk"]
    assert out.count() == 0

    bad = corpus.withColumn("vec_id", F.col("vec_id").cast("string"))
    with pytest.raises(TypeError):
        assign_postings(bad, cent)
