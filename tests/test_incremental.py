"""Incremental KG maintenance: changelog scan, provenance-tagged
pipeline compositionality, delete+insert equivalence to full recompute,
and the driver-gate replica."""

import datetime
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from prec_spark.cached import cached_transcripts
from prec_spark.flagship import flagship_triples
from prec_spark.incremental import (
    _inc_table_root,
    kg_incremental,
    kg_incremental_oracle_sql,
    kg_triples_prov,
)
from prec_spark.lakehouse.table import IceLiteTable
from prec_spark.text.mentions import entity_triples

from .conftest import SF_DIR
from .oracle_util import compare

SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("grp", StringType()),
        StructField("v", StringType()),
    ]
)


def test_read_changes_file_diff(spark):
    """read_changes returns added-file rows AND removed-file rows, and
    accepts the non-append history read_incremental refuses."""
    root = tempfile.mkdtemp(prefix="iclchanges")
    tbl = IceLiteTable.create(spark, root, SCHEMA, partition_by=("grp",))
    mk = lambda rows: spark.createDataFrame(rows, SCHEMA)  # noqa: E731
    tbl.append(mk([(1, "a", "x1"), (2, "b", "x2")]))          # snapshot 1
    tbl.append(mk([(3, "a", "x3")]))                           # snapshot 2
    tbl.merge(mk([(2, "b", "EDITED")]), on=("k",))             # snapshot 3

    added, removed = tbl.read_changes(1, 3)
    assert sorted((r.k, r.v) for r in added.collect()) == [
        (2, "EDITED"),
        (3, "x3"),
    ]
    # the merge rewrote the grp=b file from snapshot 1
    assert [(r.k, r.v) for r in removed.collect()] == [(2, "x2")]

    # read_incremental must still refuse the rewritten history
    try:
        tbl.read_incremental(1, 3)
        raise AssertionError("expected non-append history to raise")
    except ValueError:
        pass


def test_prov_projection_equals_plain_pipeline(spark):
    """Dropping lineage from the provenance-tagged store reproduces the
    plain pipeline exactly — no triple lost by the subject-attribution
    join, none invented by the per-conv fanout."""
    t = cached_transcripts(spark, SF_DIR)
    prov = kg_triples_prov(spark, SF_DIR, t).select("s", "p", "o").distinct()
    plain = flagship_triples(spark, SF_DIR, transcripts=t).unionByName(
        entity_triples(spark, SF_DIR, transcripts=t)
    )
    assert prov.exceptAll(plain).count() == 0
    assert plain.exceptAll(prov).count() == 0


def test_incremental_equals_full_recompute(spark):
    """The maintained store (delete affected convs + insert recompute)
    is multiset-identical to a from-scratch run on the final snapshot."""
    maintained = kg_incremental(spark, SF_DIR)
    tbl = IceLiteTable(spark, _inc_table_root(spark, SF_DIR))
    full = kg_triples_prov(spark, SF_DIR, tbl.read())
    assert maintained.exceptAll(full).count() == 0
    assert full.exceptAll(maintained).count() == 0


def test_incremental_recomputes_strict_subset(spark):
    """The changelog-derived affected set is a strict subset of all
    conversations (bucket-3 convs never rewrite), and the in-place text
    edit really flows into the maintained triples."""
    tbl = IceLiteTable(spark, _inc_table_root(spark, SF_DIR))
    added, removed = tbl.read_changes(1, 3)
    affected = (
        added.select("conv_id").unionByName(removed.select("conv_id")).distinct()
    )
    n_affected = affected.count()
    n_all = tbl.read().select("conv_id").distinct().count()
    assert 0 < n_affected < n_all, (n_affected, n_all)
    # bucket 3 is untouched by every snapshot
    b3 = tbl.read().filter(F.col("bucket") == "3").select("conv_id").distinct()
    assert affected.join(b3, "conv_id", "leftsemi").count() == 0
    # the merge edit is visible in the maintained store
    edited = kg_incremental(spark, SF_DIR).filter(
        F.col("o").endswith(' [rev]"')
    )
    assert edited.count() > 0


def test_kg_incremental_oracle(spark):
    compare(kg_incremental(spark, SF_DIR), kg_incremental_oracle_sql(), SF_DIR)


def test_maintain_to_current_lifecycle(spark, tmp_path):
    """The deployable maintenance job: initial build, no-op rerun,
    incremental refresh after append+merge, store always equal to a
    full recompute, previous store version retained for crash safety."""
    import os

    from prec_spark.incremental import maintain_to_current

    t = cached_transcripts(spark, SF_DIR).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    convs = [r.conv_id for r in t.select("conv_id").distinct().limit(40).collect()]
    half, rest = convs[:20], convs[20:]
    tbl = IceLiteTable.create(
        spark, str(tmp_path / "tbl"), t.schema
    )
    tbl.append(t.filter(F.col("conv_id").isin(half)))

    work = str(tmp_path / "store")
    s1 = maintain_to_current(spark, str(tmp_path / "tbl"), work, sf_dir=SF_DIR)
    assert s1["mode"] == "build" and s1["store_rows"] > 0
    s2 = maintain_to_current(spark, str(tmp_path / "tbl"), work, sf_dir=SF_DIR)
    assert s2["mode"] == "noop" and s2["store_rows"] == s1["store_rows"]

    tbl.append(t.filter(F.col("conv_id").isin(rest)))
    edited = t.filter(
        F.col("conv_id").isin(half[:5]) & (F.col("turn_idx") == 0)
    ).withColumn("text", F.concat(F.col("text"), F.lit(" [fix]")))
    tbl.merge(edited, on=("conv_id", "turn_idx"))

    s3 = maintain_to_current(spark, str(tmp_path / "tbl"), work, sf_dir=SF_DIR)
    assert s3["mode"] == "maintain"
    assert 0 < s3["affected_convs"] <= len(convs)
    import json

    with open(os.path.join(work, "kg_store_meta.json")) as fh:
        meta = json.load(fh)
    store = spark.read.parquet(meta["dir"])
    full = kg_triples_prov(spark, SF_DIR, tbl.read())
    assert store.exceptAll(full).count() == 0
    assert full.exceptAll(store).count() == 0
    # the edit is visible; the pre-refresh store version is retained
    assert store.filter(F.col("o").endswith(' [fix]"')).count() > 0
    assert os.path.isdir(os.path.join(work, f"kg_store_v{s1['snapshot_id']}"))


def test_rollback_store_and_roll_forward(spark, tmp_path):
    """Store rollback is an atomic pointer swap to a retained version;
    a later --maintain rolls forward from there and converges to the
    full recompute again."""
    import json
    import os

    import pytest

    from prec_spark.incremental import maintain_to_current, rollback_store

    t = cached_transcripts(spark, SF_DIR).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    convs = [r.conv_id for r in t.select("conv_id").distinct().limit(20).collect()]
    tbl = IceLiteTable.create(spark, str(tmp_path / "tbl"), t.schema)
    tbl.append(t.filter(F.col("conv_id").isin(convs[:10])))
    work = str(tmp_path / "store")
    s1 = maintain_to_current(spark, str(tmp_path / "tbl"), work, sf_dir=SF_DIR)
    with pytest.raises(ValueError):
        rollback_store(work)  # only one version: nothing earlier
    tbl.append(t.filter(F.col("conv_id").isin(convs[10:])))
    s2 = maintain_to_current(spark, str(tmp_path / "tbl"), work, sf_dir=SF_DIR)
    assert s2["mode"] == "maintain"

    rb = rollback_store(work)
    assert rb["snapshot_id"] == s1["snapshot_id"]
    with open(os.path.join(work, "kg_store_meta.json")) as fh:
        assert json.load(fh)["dir"].endswith(f"kg_store_v{s1['snapshot_id']}")
    assert (
        spark.read.parquet(rb["dir"]).count() == s1["store_rows"]
    )  # rolled-back reads see the old store

    s3 = maintain_to_current(spark, str(tmp_path / "tbl"), work, sf_dir=SF_DIR)
    assert s3["mode"] == "maintain" and s3["store_rows"] == s2["store_rows"]
    store = spark.read.parquet(
        json.load(open(os.path.join(work, "kg_store_meta.json")))["dir"]
    )
    full = kg_triples_prov(spark, SF_DIR, tbl.read())
    assert store.exceptAll(full).count() == 0
    assert full.exceptAll(store).count() == 0
