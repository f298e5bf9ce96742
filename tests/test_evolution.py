"""IceLite schema evolution: rename/drop via field ids."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from prec_spark.lakehouse import IceLiteTable
from prec_spark.lakehouse.queries import (
    lakehouse_evolution,
    lakehouse_evolution_oracle_sql,
)

from .conftest import SF_DIR
from .oracle_util import compare

SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("val", StringType()),
        StructField("cat", StringType()),
    ]
)


def _df(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema).coalesce(1)


def _mk(spark, tmp_path, name="evo", partition_by=()):
    return IceLiteTable.create(
        spark, os.path.join(str(tmp_path), name), SCHEMA,
        partition_by=partition_by,
    )


def test_rename_resolves_old_files_through_field_id(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [Row(k=1, val="a", cat="x")]))
    t.rename_column("val", "amount")
    t.append(_df(
        spark, [Row(k=2, amount="b", cat="y")],
        StructType([StructField("k", IntegerType()),
                    StructField("amount", StringType()),
                    StructField("cat", StringType())]),
    ))
    got = {(r.k, r.amount, r.cat) for r in t.read().collect()}
    assert got == {(1, "a", "x"), (2, "b", "y")}
    assert t.current_schema().fieldNames() == ["k", "amount", "cat"]


def test_time_travel_keeps_pre_rename_names(spark, tmp_path):
    t = _mk(spark, tmp_path)
    sid = t.append(_df(spark, [Row(k=1, val="a", cat="x")]))
    t.rename_column("val", "amount")
    old = t.read(snapshot_id=sid)
    assert old.columns == ["k", "val", "cat"]
    assert old.collect()[0].val == "a"


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    """Re-adding a dropped column's NAME allocates a fresh field id:
    the old bytes must NOT come back under it (Iceberg contract)."""
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [Row(k=1, val="ghost", cat="x")]))
    t.drop_column("val")
    assert t.read().columns == ["k", "cat"]
    t.append(_df(
        spark, [Row(k=2, cat="y", val="new")],
        StructType([StructField("k", IntegerType()),
                    StructField("cat", StringType()),
                    StructField("val", StringType())]),
    ))
    got = {(r.k, r.cat, r.val) for r in t.read().collect()}
    assert got == {(1, "x", None), (2, "y", "new")}  # ghost stays dead


def test_rename_partition_source_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path, partition_by=("cat",))
    t.append(_df(spark, [Row(k=1, val="a", cat="x")]))
    with pytest.raises(ValueError, match="partition source"):
        t.rename_column("cat", "category")
    with pytest.raises(ValueError, match="partition source"):
        t.drop_column("cat")


def test_rename_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("val", "cat")


def test_pruning_survives_rename(spark, tmp_path):
    """Manifest stats are keyed by WRITTEN names; predicate columns
    must translate through field ids so old files still prune."""
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [Row(k=i, val="a", cat="x") for i in range(10)]))
    t.append(_df(spark, [Row(k=i, val="b", cat="y") for i in range(100, 110)]))
    t.rename_column("k", "key")
    planned = t.planned_files((("key", ">=", 50),))
    assert len(planned) == 1  # the k<10 file pruned via its old-name stats
    got = t.scan((("key", ">=", 50),))
    assert got.count() == 10 and got.agg(F.min("key")).collect()[0][0] == 100


def test_compaction_rewrites_under_current_names(spark, tmp_path):
    """Maintenance after evolution: compaction reads old-name files
    through ids and rewrites them under the CURRENT schema."""
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [Row(k=1, val="a", cat="x")]))
    t.append(_df(spark, [Row(k=2, val="b", cat="x")]))
    t.rename_column("val", "amount")
    assert t.compact_files(min_rows=10) is not None
    got = {(r.k, r.amount) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "b")}
    # the rewritten file's manifest entry maps the CURRENT name
    meta = t._meta()
    entries = t._manifest(meta["snapshots"][-1]["manifest"])["files"]
    assert all("amount" in e["field_ids"] for e in entries)


def test_lakehouse_evolution_oracle(spark):
    compare(
        lakehouse_evolution(spark, SF_DIR),
        lakehouse_evolution_oracle_sql(),
        SF_DIR,
    )
