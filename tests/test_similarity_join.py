"""Blocked all-pairs cosine join tests (operators/similarity_join.py)."""

from __future__ import annotations

import itertools

import numpy as np

from lakehouse_ingestion_spark.operators.similarity_join import (
    cosine_allpairs_blocked,
)


def _expected(vecs: dict[int, list[float]], threshold: float) -> dict[tuple, float]:
    out = {}
    for a, b in itertools.combinations(sorted(vecs), 2):
        va, vb = np.array(vecs[a]), np.array(vecs[b])
        sim = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        if round(sim, 6) >= threshold:
            out[(a, b)] = round(sim, 6)
    return out


def test_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    vecs = {i: rng.normal(size=8).tolist() for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_allpairs_blocked(df, "vec_id", "embedding", 0.3, num_blocks=4).collect()
    }
    exp = _expected(vecs, 0.3)
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-6


def test_cross_block_pair_direction(spark):
    # ids chosen so the smaller id hashes to the LARGER block id
    # (id 9 -> block 1, id 12 -> block 0 with num_blocks=4... pick exact):
    # num_blocks=4: id 3 -> block 3, id 4 -> block 0; pair (3, 4) crosses
    # blocks with min-id in the higher block — the regression case.
    v = [1.0, 0.0]
    df = spark.createDataFrame(
        [(3, v), (4, v)], "vec_id long, embedding array<double>"
    )
    rows = cosine_allpairs_blocked(df, "vec_id", "embedding", 0.5, num_blocks=4).collect()
    assert [(r["id_a"], r["id_b"], r["cos_sim"]) for r in rows] == [(3, 4, 1.0)]


def test_empty_and_zero_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    # zero-norm vector yields nan sim -> excluded, not an error
    assert cosine_allpairs_blocked(df, "vec_id", "embedding", 0.1).count() == 0
