"""Product-quantized ANN (ann/pq.py): the ADC arithmetic is pinned
against an independent driver-side reference computed with the same
sequential float folds, plus partitioning invariance and code-range
structure."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from prec_spark.ann.pq import K_PQ, M_SUB, ann_pq, pq_codebooks, pq_encode
from prec_spark.ann.search import QUERY_MOD, TOP_K

DIM = 8  # subdim 2 per subspace


def _mk_rows(n=240):
    # deterministic dyadic components: products/sums stay far from
    # 4-dp rounding boundaries
    rows = []
    for i in range(n):
        v = [((i * 37 + d * 17) % 23 - 11) / 8.0 for d in range(DIM)]
        nrm = math.sqrt(sum(x * x for x in v))
        rows.append((i, v, nrm))
    return rows


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        _mk_rows(), "vec_id long, v array<double>, nrm double"
    ).cache()


def _sdot(a, b):
    acc = a[0] * b[0]
    for x, y in zip(a[1:], b[1:]):
        acc += x * y
    return acc


def _c2(c):
    acc = 0.0
    for x in c:
        acc += x * x
    return acc


def _round4(x):
    return float(
        Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


def reference_scores(rows, books):
    """{query_id: sorted [(-cosine, vid)] over ALL non-self candidates},
    computed with the same sequential folds as the engine."""
    subdim = DIM // M_SUB
    codes, n2s = {}, {}
    for vid, v, _nrm in rows:
        cs, n2 = [], 0.0
        for s, book in enumerate(books):
            sub = v[s * subdim : (s + 1) * subdim]
            best = min(
                ((_c2(c) - 2.0 * _sdot(sub, c), k) for k, c in enumerate(book))
            )
            cs.append(best[1])
            n2 += _c2(book[best[1]])
        codes[vid], n2s[vid] = cs, n2
    out = {}
    for qid, qv, qnrm in rows:
        if qid % QUERY_MOD != 0:
            continue
        scored = []
        for vid, _v, _nrm in rows:
            if vid == qid:
                continue
            adc = 0.0
            for s, book in enumerate(books):
                sub = qv[s * subdim : (s + 1) * subdim]
                adc += _sdot(sub, book[codes[vid][s]])
            cos = _round4(adc / (math.sqrt(n2s[vid]) * qnrm))
            scored.append((-cos, vid))
        scored.sort()
        out[qid] = scored
    return out


def reference_adc(rows, books):
    out = []
    for qid, scored in reference_scores(rows, books).items():
        for rank, (negcos, vid) in enumerate(scored[:TOP_K], 1):
            out.append((qid, vid, rank, -negcos))
    return sorted(out)


def test_adc_matches_driver_reference(spark, vecs):
    rows = _mk_rows()
    books = pq_codebooks(spark, vecs, DIM)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in ann_pq(spark, "", vectors=vecs).collect()
    )
    assert got == reference_adc(rows, books)


def test_combined_training_equals_per_subspace(spark, vecs):
    """The one-pass tall-frame trainer must produce value-identical
    codebooks to M_SUB independent train_kmeans runs — the procedure
    the oracle unrolls."""
    from prec_spark.ann.search import train_kmeans

    subdim = DIM // M_SUB
    got = pq_codebooks(spark, vecs, DIM)
    for s in range(M_SUB):
        sub = vecs.select("vec_id", F.slice("v", s * subdim + 1, subdim).alias("v"))
        rows = sorted(train_kmeans(spark, sub, K_PQ).collect(), key=lambda r: r.k)
        assert got[s] == [list(r.cent) for r in rows]


def test_codes_are_small_ints(spark, vecs):
    books = pq_codebooks(spark, vecs, DIM)
    codes = pq_encode(vecs, books, DIM)
    assert set(codes.columns) == {"vec_id", "n2"} | {
        f"c{s}" for s in range(M_SUB)
    }
    agg = codes.select(
        *[F.min(f"c{s}").alias(f"lo{s}") for s in range(M_SUB)],
        *[F.max(f"c{s}").alias(f"hi{s}") for s in range(M_SUB)],
    ).head()
    for s in range(M_SUB):
        assert 0 <= agg[f"lo{s}"] and agg[f"hi{s}"] < K_PQ


def test_ivfpq_matches_driver_reference(spark, vecs):
    """The IVF-PQ composition == PQ ADC scoring restricted to the IVF
    probe cells, both replicated independently on the driver."""
    from prec_spark.ann.pq import ann_ivfpq
    from prec_spark.ann.search import NPROBE, _k_cells, train_kmeans

    rows = _mk_rows()
    books = pq_codebooks(spark, vecs, DIM)
    cents = {
        r.k: list(r.cent)
        for r in train_kmeans(spark, vecs, _k_cells(len(rows))).collect()
    }

    def nearest_cells(v, n):
        ranked = sorted((_c2(c) - 2.0 * _sdot(v, c), k) for k, c in cents.items())
        return [k for _d2, k in ranked[:n]]

    cell_of = {vid: nearest_cells(v, 1)[0] for vid, v, _ in rows}
    expect = []
    for qid, scored in reference_scores(rows, books).items():
        probe = set(nearest_cells(next(v for i, v, _ in rows if i == qid), NPROBE))
        pruned = [(negcos, vid) for negcos, vid in scored if cell_of[vid] in probe]
        for rank, (negcos, vid) in enumerate(pruned[:TOP_K], 1):
            expect.append((qid, vid, rank, -negcos))
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in ann_ivfpq(spark, "", vectors=vecs).collect()
    )
    assert got == sorted(expect)


def test_pq_partitioning_invariance(spark, vecs):
    one = sorted(map(tuple, ann_pq(spark, "", vectors=vecs.coalesce(1)).collect()))
    many = sorted(map(tuple, ann_pq(spark, "", vectors=vecs.repartition(7)).collect()))
    assert one == many
