"""Similarity search: brute-force cosine top-k baseline + IVF scale path."""

import math

import numpy as np
import pytest

from log_parser_cli_spark.extras.similarity import cosine_pairs, cosine_topk, ivf_topk


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    # 3 well-separated clusters of 40 vectors each, dim 16
    centers = rng.normal(size=(3, 16)) * 10
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(40):
            v = centers[c] + rng.normal(size=16) * 0.5
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _brute_topk(rows, qid, k):
    q = next(r for r in rows if r[0] == qid)
    qv = np.array(q[1], dtype=np.float64)
    sims = []
    for vid, v, _ in rows:
        if vid == qid:
            continue
        v = np.array(v, dtype=np.float64)
        sims.append((round(float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 4), -vid))
    sims.sort(reverse=True)
    return [(-nid, s) for s, nid in sims[:k]]


def test_cosine_topk_matches_numpy(spark, emb):
    rows = [(r.vec_id, list(r.embedding), r.label) for r in emb.collect()]
    got = cosine_topk(emb, query_ids=[0, 40, 80], k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.sim))
    for qid in (0, 40, 80):
        expected = _brute_topk(rows, qid, 5)
        mine = sorted(by_q[qid])
        assert [(n, s) for _, n, s in mine] == [(n, round(s, 4)) for n, s in expected]


def test_topk_neighbors_stay_in_cluster(emb):
    got = cosine_topk(emb, query_ids=[0], k=10).collect()
    labels = {r.vec_id: r.label for r in emb.collect()}
    assert all(labels[r.neighbor_id] == labels[0] for r in got)


def test_ivf_recall_vs_bruteforce(emb):
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, [0, 40, 80], k=10).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, [0, 40, 80], k=10, n_centroids=8, nprobe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall}"


def test_cosine_pairs_threshold(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.a, r.b) for r in cosine_pairs(df, threshold=0.99).collect()}
    assert pairs == {(0, 1)}
