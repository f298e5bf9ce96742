"""Int8 embedding quantization (ann/quantize.py)."""

from prec_spark.ann.quantize import (
    embedding_quantize,
    embedding_quantize_oracle_sql,
    quantize_int8,
)

from .conftest import SF_DIR
from .oracle_util import compare


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_known_values(spark):
    """Hand-computed: [1, -0.5, 0.25] -> scale 1, q = [127, -64, 32]
    (HALF_UP: -63.5 -> -64 away from zero, 31.75 -> 32)."""
    got = {r.vec_id: r for r in quantize_int8(
        _vecs(spark, [(1, [1.0, -0.5, 0.25])])
    ).collect()}
    r = got[1]
    assert (r.n_dims, r.sum_q, r.q_l1, r.scale_micro) == (3, 95, 223, 1_000_000)
    # err = (0.25 - 32/127)^2 + (-0.5 + 64/127)^2 -> floor(1e6 * err2)
    e = (0.25 - 32 / 127) ** 2 + (-0.5 + 64 / 127) ** 2
    assert abs(r.err_micro - int(1_000_000 * e)) <= 1


def test_zero_vector(spark):
    got = quantize_int8(_vecs(spark, [(7, [0.0, 0.0])])).collect()[0]
    assert (got.sum_q, got.q_l1, got.scale_micro, got.err_micro) == (0, 0, 0, 0)


def test_extremes_hit_int8_range(spark):
    """The max-|v| component always quantizes to exactly +/-127."""
    got = quantize_int8(
        _vecs(spark, [(1, [-3.0, 1.5]), (2, [2.0, -1.0])])
    ).collect()
    by = {r.vec_id: r for r in got}
    assert by[1].q_l1 == 127 + 64  # -127 and round(63.5) = 64
    assert by[2].q_l1 == 127 + 64


def test_embedding_quantize_oracle(spark):
    compare(
        embedding_quantize(spark, SF_DIR),
        embedding_quantize_oracle_sql(),
        SF_DIR,
    )
