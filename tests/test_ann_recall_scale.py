"""IVF recall at corpus scale: 10^5 planted vectors, K = ceil(sqrt(N))
= 317 cells, nprobe sweep over one training (round-2 VERDICT item 8).

317 tight planted clusters (|center| = 8 sign vectors, noise sigma 0.5
— inter-center distance ~ 8*sqrt(2D) >> noise), so points of a planted
cluster assign to the SAME cell even when k-means merges clusters;
recall@5 must reach >= 0.9 already at low nprobe and never decrease
as nprobe grows.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from prec_spark.ann.search import TOP_K, _k_cells, ann_ivf, train_kmeans

N = 100_000
DIM = 16
K_PLANT = 317
QUERY_SAMPLE_STEP = 500  # evaluate recall on vec_id % 500 == 0 (200 queries)


def _planted():
    rng = np.random.default_rng(7)
    clusters = np.arange(N) % K_PLANT
    centers = rng.choice([-8.0, 8.0], size=(K_PLANT, DIM))
    V = centers[clusters] + rng.normal(0.0, 0.5, size=(N, DIM))
    return clusters, V.astype(np.float64)


@pytest.fixture(scope="module")
def corpus(spark):
    import pandas as pd

    _, V = _planted()
    nrm = np.linalg.norm(V, axis=1)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(N), "v": list(V), "nrm": nrm}
    )
    df = spark.createDataFrame(pdf).select(
        F.col("vec_id").cast("long"),
        F.col("v").cast("array<double>"),
        F.col("nrm").cast("double"),
    ).cache()
    df.count()
    return df, V, nrm


def test_recall_sweep_100k(spark, corpus):
    vecs, V, nrm = corpus
    cents = train_kmeans(spark, vecs, _k_cells(N))

    # exact top-5 for the sampled queries (numpy brute force)
    qs = np.arange(0, N, QUERY_SAMPLE_STEP)
    sims = (V[qs] @ V.T) / (nrm[qs][:, None] * nrm[None, :])
    sims[np.arange(len(qs)), qs] = -9.0
    sims = np.round(sims, 4)
    exact = {}
    for row, qi in enumerate(qs):
        order = np.lexsort((np.arange(N), -sims[row]))
        exact[int(qi)] = set(int(j) for j in order[:TOP_K])

    recalls = {}
    for nprobe in (1, 2, 4):
        got = ann_ivf(spark, "", vectors=vecs, nprobe=nprobe, centroids=cents)
        ivf: dict[int, set] = {}
        for r in got.filter(F.col("query_id") % QUERY_SAMPLE_STEP == 0).collect():
            ivf.setdefault(r.query_id, set()).add(r.neighbor_id)
        recalls[nprobe] = float(
            np.mean([len(exact[q] & ivf.get(q, set())) / TOP_K for q in exact])
        )

    print(f"recall@{TOP_K} by nprobe: {recalls}")
    assert recalls[1] >= 0.9, recalls
    # more probes never lose recall (small tolerance for rank ties)
    assert recalls[2] >= recalls[1] - 0.02 and recalls[4] >= recalls[2] - 0.02, recalls
    assert recalls[4] >= 0.95, recalls
