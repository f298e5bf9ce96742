"""IVF recall property on a planted clustered corpus.

The driver-generated embeddings are structureless w.r.t. cosine
neighborhoods (brute-force top-5 neighbors share the query's label at
chance level), so IVF's recall contract is asserted here on data where
it applies: 10 well-separated planted clusters. k-means must recover
them and nprobe=2 search must reach recall@5 >= 0.9 vs exact search.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from prec_spark.ann.search import NPROBE, TOP_K, ann_ivf, train_kmeans, _assign

N = 500
DIM = 16
K = 10


def planted(seed_scale: float = 10.0):
    """Deterministic clustered corpus: cluster c centered at
    seed_scale * e_c, plus small deterministic noise."""
    ids = np.arange(N)
    clusters = (ids // 50) % K  # queries (id % 50 == 0) span all clusters
    V = np.zeros((N, DIM))
    V[np.arange(N), clusters] = seed_scale
    noise = ((ids[:, None] * 31 + np.arange(DIM)[None, :] * 17) % 97) / 97.0 - 0.5
    V = V + noise
    return ids, clusters, V


@pytest.fixture(scope="module")
def planted_vecs(spark):
    ids, clusters, V = planted()
    nrm = np.linalg.norm(V, axis=1)
    rows = [
        (int(i), [float(x) for x in V[i]], float(nrm[i])) for i in range(N)
    ]
    return spark.createDataFrame(rows, "vec_id LONG, v ARRAY<DOUBLE>, nrm DOUBLE")


def test_kmeans_recovers_planted_clusters(spark, planted_vecs):
    ids, clusters, V = planted()
    cents = train_kmeans(spark, planted_vecs)
    assigned = {r.vec_id: r.cell for r in _assign(planted_vecs, cents).collect()}
    # purity: within each planted cluster, the dominant cell covers >= 90%
    for c in range(K):
        cells = [assigned[int(i)] for i in ids[clusters == c]]
        dominant = max(cells.count(x) for x in set(cells))
        assert dominant / len(cells) >= 0.9, f"cluster {c} split: {set(cells)}"


def test_ivf_recall_at_5(spark, planted_vecs):
    ids, clusters, V = planted()
    nrm = np.linalg.norm(V, axis=1)
    cos = np.round((V @ V.T) / (nrm[:, None] * nrm[None, :]), 4)

    got = ann_ivf(spark, "", vectors=planted_vecs)
    ivf = {}
    for r in got.collect():
        ivf.setdefault(r.query_id, set()).add(r.neighbor_id)

    recalls = []
    for qi in ids[ids % 50 == 0]:
        c = cos[qi].copy()
        c[qi] = -9
        bf = set(sorted(range(N), key=lambda j: (-c[j], j))[:TOP_K])
        recalls.append(len(bf & ivf[int(qi)]) / TOP_K)
    recall = float(np.mean(recalls))
    assert recall >= 0.9, f"recall@{TOP_K} with nprobe={NPROBE}: {recall}"


def test_ivf_high_dim_smoke(spark):
    """dim=300 IVF end-to-end (round-3 VERDICT item 4): the training
    means are an array aggregate, not 300 avg columns, so high-dim
    corpora stay inside codegen limits."""
    import numpy as np
    import pandas as pd

    from prec_spark.ann.search import TOP_K, ann_ivf

    rng = np.random.default_rng(3)
    n, dim = 1500, 300
    V = rng.normal(size=(n, dim))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n),
            "v": list(V),
            "nrm": np.linalg.norm(V, axis=1),
        }
    )
    out = ann_ivf(spark, "", vectors=spark.createDataFrame(pdf))
    rows = out.groupBy("query_id").count().collect()
    assert rows and all(r["count"] <= TOP_K for r in rows)


def test_lsh_recall_on_planted_clusters(spark):
    """Sign-LSH: cluster co-members are near-parallel vectors, so they
    agree on (almost) all sign bits and land in the same bucket in at
    least one of the LSH_TABLES tables — recall@5 vs exact brute force
    must be high on a planted clustered corpus. Candidates stay
    bucket-bounded: never an all-pairs product."""
    import numpy as np
    import pandas as pd

    from prec_spark.ann.search import QUERY_MOD, TOP_K, ann_lsh

    rng = np.random.default_rng(11)
    n, dim, k_plant = 2000, 16, 40
    clusters = np.arange(n) % k_plant
    centers = rng.choice([-8.0, 8.0], size=(k_plant, dim))
    V = centers[clusters] + rng.normal(0.0, 0.5, size=(n, dim))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n),
            "v": list(V),
            "nrm": np.linalg.norm(V, axis=1),
        }
    )
    df = spark.createDataFrame(pdf)
    got = ann_lsh(spark, "", vectors=df).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)

    # exact ground truth (numpy): top-5 cosine per query
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    hits = total = 0
    for q in range(0, n, QUERY_MOD):
        cos = Vn @ Vn[q]
        cos[q] = -2
        exact = set(np.argsort(-cos)[:TOP_K].tolist())
        found = set(by_q.get(q, []))
        hits += len(exact & found)
        total += TOP_K
    recall = hits / total
    assert recall >= 0.9, f"LSH recall@{TOP_K} = {recall:.3f}"
