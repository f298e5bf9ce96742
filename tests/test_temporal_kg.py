"""Event-time KG snapshots: NEXT rewiring across time-cut gaps,
filter pushdown, and the oracle replica."""

import datetime

from pyspark.sql import functions as F

from prec_spark.flagship import EX, flagship_triples
from prec_spark.temporal_kg import ASOF_CUT, kg_asof, kg_asof_oracle_sql

from .conftest import SF_DIR
from .oracle_util import compare

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def test_next_chain_rewires_across_gaps(spark):
    """Cutting a mid-conversation turn must rewire NEXT around it, not
    drop the chain or point at the dead turn."""
    rows = [
        ("c1", 0, "user", "a", None, datetime.datetime(1995, 1, 1)),
        ("c1", 1, "assistant", "b", None, datetime.datetime(1999, 1, 1)),  # late
        ("c1", 2, "user", "c", None, datetime.datetime(1995, 1, 3)),
    ]
    t = spark.createDataFrame(rows, SCHEMA).filter(
        F.col("ts") < F.lit(datetime.datetime(1997, 1, 1))
    )
    nxt = {
        (r.s, r.o)
        for r in flagship_triples(spark, SF_DIR, transcripts=t)
        .filter(F.col("p") == f"<{EX}next>")
        .collect()
    }
    assert nxt == {("_:turn_c1_0", "_:turn_c1_2")}


def test_asof_is_strict_subgraph(spark):
    full = flagship_triples(spark, SF_DIR)
    cut = kg_asof(spark, SF_DIR)
    # the snapshot is smaller than the full graph, but NEXT edges are
    # NOT a subset (they rewire across gaps) — check both facts
    n_full = full.count()
    n_cut = cut.count()
    assert 0 < n_cut < n_full
    rewired = (
        cut.filter(F.col("p") == f"<{EX}next>")
        .join(
            full.filter(F.col("p") == f"<{EX}next>"),
            ["s", "p", "o"],
            "left_anti",
        )
        .count()
    )
    assert rewired > 0  # at least one NEXT edge exists only in the cut


def test_asof_time_filter_reaches_scan(spark):
    plan = kg_asof(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert ASOF_CUT.strftime("%Y-%m-%d") in plan or "LessThan" in plan


def test_kg_asof_oracle(spark):
    compare(kg_asof(spark, SF_DIR), kg_asof_oracle_sql(), SF_DIR)
