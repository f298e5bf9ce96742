"""IceLite table format: commits, time travel, pruning, evolution."""

import datetime
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from prec_spark.lakehouse import CommitConflict, IceLiteTable, zorder_key
from prec_spark.lakehouse.queries import (
    lakehouse_incremental,
    lakehouse_incremental_oracle_sql,
    lakehouse_merge,
    lakehouse_merge_oracle_sql,
    lakehouse_zorder,
    lakehouse_zorder_oracle_sql,
    lakehouse_scan,
    lakehouse_scan_oracle_sql,
    lakehouse_time_travel,
    lakehouse_time_travel_oracle_sql,
)

from .conftest import SF_DIR
from .oracle_util import compare

SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("cat", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _rows(spark, ks, cat, day):
    # coalesce(1): one data file per append, so manifest-granularity
    # assertions (files planned / rows per file) are deterministic
    return spark.createDataFrame(
        [Row(k=k, cat=cat, ts=datetime.datetime(1995, 1, day)) for k in ks],
        SCHEMA,
    ).coalesce(1)


@pytest.fixture()
def tbl(spark, tmp_path):
    return IceLiteTable.create(
        spark, str(tmp_path / "t"), SCHEMA, partition_by=("cat",)
    )


def test_append_read_roundtrip(spark, tbl):
    tbl.append(_rows(spark, [1, 2], "a", 1))
    tbl.append(_rows(spark, [3], "b", 2))
    got = sorted(r.k for r in tbl.read().collect())
    assert got == [1, 2, 3]
    # partition column reconstructed from the Hive-style path
    cats = dict((r.k, r.cat) for r in tbl.read().collect())
    assert cats == {1: "a", 2: "a", 3: "b"}


def test_time_travel_pins_immutable_snapshots(spark, tbl):
    tbl.append(_rows(spark, [1], "a", 1))
    tbl.append(_rows(spark, [2], "a", 1))
    tbl.overwrite_partitions(_rows(spark, [9], "a", 3))
    assert sorted(r.k for r in tbl.read(snapshot_id=1).collect()) == [1]
    assert sorted(r.k for r in tbl.read(snapshot_id=2).collect()) == [1, 2]
    assert sorted(r.k for r in tbl.read().collect()) == [9]
    ops = [s["operation"] for s in tbl.snapshots()]
    assert ops == ["append", "append", "overwrite"]


def test_overwrite_replaces_only_named_partitions(spark, tbl):
    tbl.append(_rows(spark, [1], "a", 1))
    tbl.append(_rows(spark, [2], "b", 1))
    tbl.overwrite_partitions(_rows(spark, [7, 8], "b", 2))
    got = sorted((r.cat, r.k) for r in tbl.read().collect())
    assert got == [("a", 1), ("b", 7), ("b", 8)]


def test_partition_pruning_drops_files(spark, tbl):
    tbl.append(_rows(spark, [1], "a", 1))
    tbl.append(_rows(spark, [2], "b", 1))
    planned = tbl.planned_files(predicates=(("cat", "=", "a"),))
    assert len(planned) == 1 and planned[0]["partition"] == {"cat": "a"}
    assert [r.k for r in tbl.scan(predicates=(("cat", "=", "a"),)).collect()] == [1]


def test_stats_pruning_skips_out_of_range_files(spark, tbl):
    tbl.append(_rows(spark, [1, 2], "a", 1))  # ts = 1995-01-01
    tbl.append(_rows(spark, [3, 4], "a", 20))  # ts = 1995-01-20
    cutoff = datetime.datetime(1995, 1, 10)
    planned = tbl.planned_files(predicates=(("ts", ">=", cutoff),))
    assert len(planned) == 1 and planned[0]["rows"] == 2
    # k-range pruning from int min/max stats, same mechanism
    assert len(tbl.planned_files(predicates=(("k", "<=", 2),))) == 1
    got = sorted(r.k for r in tbl.scan(predicates=(("ts", ">=", cutoff),)).collect())
    assert got == [3, 4]


def test_residual_filter_is_not_pruning_dependent(spark, tbl):
    # one file holds k 1..4: no file can be pruned for k<=2, so the
    # row-level answer must come from the residual Spark filter
    tbl.append(_rows(spark, [1, 2, 3, 4], "a", 1))
    assert len(tbl.planned_files(predicates=(("k", "<=", 2),))) == 1
    assert sorted(r.k for r in tbl.scan(predicates=(("k", "<=", 2),)).collect()) == [1, 2]


def test_schema_evolution_adds_column_with_null_backfill(spark, tbl):
    tbl.append(_rows(spark, [1], "a", 1))
    evolved = _rows(spark, [2], "a", 2).withColumn("note", F.lit("new"))
    tbl.append(evolved)
    got = {r.k: r.note for r in tbl.read().collect()}
    assert got == {1: None, 2: "new"}
    # the pre-evolution snapshot still reads with its OWN schema
    assert "note" not in tbl.read(snapshot_id=1).columns
    with pytest.raises(ValueError, match="type change"):
        tbl.append(_rows(spark, [3], "a", 1).withColumn("note", F.lit(5)))


def test_optimistic_commit_retries_after_conflict(spark, tbl):
    tbl.append(_rows(spark, [1], "a", 1))
    other = IceLiteTable(spark, tbl.root)

    # interleave a competing commit exactly between this writer's
    # manifest build and its metadata swap: the swap must lose once,
    # re-merge against the new state, and land BOTH appends
    tbl._test_pre_commit = lambda: other.append(_rows(spark, [50], "b", 1))
    tbl.append(_rows(spark, [2], "a", 1))
    assert sorted(r.k for r in tbl.read().collect()) == [1, 2, 50]
    assert len(tbl.snapshots()) == 3


def test_manifest_planning_never_lists_data_dir(spark, tbl, monkeypatch):
    tbl.append(_rows(spark, [1], "a", 1))
    tbl.append(_rows(spark, [2], "b", 1))
    import prec_spark.lakehouse.table as m

    def boom(*a, **k):  # pragma: no cover - guard
        raise AssertionError("scan planning must not list the data tree")

    monkeypatch.setattr(m.glob, "glob", boom)
    planned = tbl.planned_files(predicates=(("cat", "=", "b"),))
    assert [e["partition"]["cat"] for e in planned] == ["b"]


def test_manifest_stats_are_json_and_typed(spark, tbl):
    tbl.append(_rows(spark, [5, 6], "a", 3))
    entry = tbl.planned_files()[0]
    assert entry["rows"] == 2
    assert entry["stats"]["k"] == {"min": 5, "max": 6, "nulls": 0}
    assert isinstance(entry["stats"]["ts"]["min"], int)  # epoch micros
    json.dumps(entry)  # manifest entries stay JSON-serializable


def test_empty_and_fully_pruned_scans(spark, tbl):
    assert tbl.read().count() == 0
    tbl.append(_rows(spark, [1], "a", 1))
    assert tbl.scan(predicates=(("cat", "=", "zzz"),)).count() == 0


def test_merge_updates_inserts_and_keeps(spark, tbl):
    tbl.append(_rows(spark, [1, 2], "a", 1))
    tbl.append(_rows(spark, [5], "b", 1))
    src = _rows(spark, [2, 9], "a", 7)  # 2 = update, 9 = insert
    tbl.merge(src, on=("k",))
    got = sorted((r.k, r.ts.day) for r in tbl.read().collect())
    assert got == [(1, 1), (2, 7), (5, 1), (9, 7)]
    assert tbl.snapshots()[-1]["operation"] == "merge"


def test_merge_rewrites_only_affected_files(spark, tbl):
    tbl.append(_rows(spark, [1], "a", 1))
    tbl.append(_rows(spark, [2], "b", 1))
    before = {e["path"] for e in tbl.planned_files()}
    tbl.merge(_rows(spark, [2], "b", 9), on=("k",))
    after = {e["path"] for e in tbl.planned_files()}
    # the 'a' file is byte-identical and still listed; the 'b' file
    # was rewritten (copy-on-write touches only files holding a match)
    a_file = next(p for p in before if "cat=a" in p)
    assert a_file in after
    assert not any(p in after for p in before if "cat=b" in p)


def test_merge_composite_key_and_whole_row_replace(spark, tbl):
    tbl.append(_rows(spark, [1, 2], "a", 1))
    src = _rows(spark, [1], "a", 5).withColumn("note", F.lit("patched"))
    tbl.merge(src, on=("k", "cat"))
    got = {r.k: (r.ts.day, r.note) for r in tbl.read().collect()}
    assert got == {1: (5, "patched"), 2: (1, None)}


def test_merge_conflict_is_serializable_not_silent(spark, tbl):
    tbl.append(_rows(spark, [1], "a", 1))
    other = IceLiteTable(spark, tbl.root)
    tbl._test_pre_commit = lambda: other.append(_rows(spark, [50], "b", 1))
    with pytest.raises(CommitConflict, match="stale"):
        tbl.merge(_rows(spark, [1], "a", 9), on=("k",))
    # the competing append won; the failed merge changed nothing
    assert sorted(r.k for r in tbl.read().collect()) == [1, 50]


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0b101, 0b011)], "x long, y long"
    ).select(zorder_key(["x", "y"], bits=3).alias("z"))
    # x bits -> even positions (0,2,4), y bits -> odd (1,3,5):
    # x=101, y=011 => z bits 543210 = 0,1,1,0,1,1
    assert df.collect()[0].z == 0b011011
    with pytest.raises(ValueError, match="1..63"):
        zorder_key(["x", "y"], bits=32)


def test_zorder_rewrite_skips_files_linear_cannot(spark, tmp_path):
    # 32x32 grid written in 8 x-sorted files: a y-band predicate prunes
    # NOTHING under the linear layout, but prunes most z-curve tiles
    schema = StructType(
        [StructField("x", IntegerType()), StructField("y", IntegerType())]
    )
    rows = [Row(x=x, y=y) for x in range(32) for y in range(32)]
    t = IceLiteTable.create(spark, str(tmp_path / "z"), schema)
    t.append(spark.createDataFrame(rows, schema).repartitionByRange(8, "x"))

    n_before = len(t.planned_files())
    box = (("y", ">=", 8), ("y", "<=", 11))
    assert len(t.planned_files(box)) == n_before  # y striped everywhere

    t.rewrite_clustered(zorder_key(["x", "y"], bits=5), 8)
    planned = t.planned_files(box)
    assert len(t.planned_files()) == 8
    assert len(planned) <= 4, [e["stats"]["y"] for e in planned]
    # and the rewrite lost nothing
    got = sorted((r.x, r.y) for r in t.scan(box).collect())
    assert got == [(x, y) for x in range(32) for y in range(8, 12)]


def test_compact_packs_small_files_per_partition(spark, tbl):
    for _ in range(3):
        tbl.append(_rows(spark, [1], "a", 1))
    tbl.append(_rows(spark, [9], "b", 1))
    assert len(tbl.planned_files()) == 4
    sid = tbl.compact_files(min_rows=10)
    assert sid is not None
    planned = tbl.planned_files()
    # cat=a's three 1-row files packed into one; cat=b alone untouched
    assert len(planned) == 2
    assert sorted(e["rows"] for e in planned) == [1, 3]
    assert sorted(r.k for r in tbl.read().collect()) == [1, 1, 1, 9]
    assert tbl.compact_files(min_rows=10) is None  # idempotent


def test_expire_snapshots_bounds_metadata_and_storage(spark, tbl):
    tbl.append(_rows(spark, [1], "a", 1))
    tbl.overwrite_partitions(_rows(spark, [2], "a", 2))  # v1 file now dead
    old_manifest = tbl.snapshots()[0]["manifest"]
    old_file = tbl._manifest(old_manifest)["files"][0]["path"]
    stats = tbl.expire_snapshots(keep_last=1)
    assert stats == {"expired_snapshots": 1, "deleted_files": 1}
    assert not os.path.exists(os.path.join(tbl.root, old_file))
    assert not os.path.exists(os.path.join(tbl.meta_dir, old_manifest))
    # current snapshot unaffected; expired id now fails loudly
    assert sorted(r.k for r in tbl.read().collect()) == [2]
    with pytest.raises(ValueError, match="unknown snapshot"):
        tbl.read(snapshot_id=1)


def test_expire_keeps_files_shared_with_retained_snapshots(spark, tbl):
    tbl.append(_rows(spark, [1], "a", 1))
    tbl.append(_rows(spark, [2], "a", 1))  # snapshot 2 references BOTH files
    stats = tbl.expire_snapshots(keep_last=1)
    assert stats["deleted_files"] == 0  # v1's file is still live in v2
    assert sorted(r.k for r in tbl.read().collect()) == [1, 2]


def test_incremental_read_returns_only_the_delta(spark, tbl):
    tbl.append(_rows(spark, [1, 2], "a", 1))
    tbl.append(_rows(spark, [3], "b", 2))
    tbl.append(_rows(spark, [4], "a", 3))
    assert sorted(r.k for r in tbl.read_incremental(1, 2).collect()) == [3]
    assert sorted(r.k for r in tbl.read_incremental(1, 3).collect()) == [3, 4]
    assert sorted(r.k for r in tbl.read_incremental(0, 1).collect()) == [1, 2]


def test_incremental_read_refuses_non_append_history(spark, tbl):
    tbl.append(_rows(spark, [1], "a", 1))
    tbl.overwrite_partitions(_rows(spark, [9], "a", 2))
    with pytest.raises(ValueError, match="non-append history"):
        tbl.read_incremental(1, 2)


def test_lakehouse_gate_queries_match_oracle(spark):
    compare(lakehouse_scan(spark, SF_DIR), lakehouse_scan_oracle_sql(), SF_DIR)
    compare(
        lakehouse_time_travel(spark, SF_DIR),
        lakehouse_time_travel_oracle_sql(),
        SF_DIR,
    )
    compare(lakehouse_merge(spark, SF_DIR), lakehouse_merge_oracle_sql(), SF_DIR)
    compare(lakehouse_zorder(spark, SF_DIR), lakehouse_zorder_oracle_sql(), SF_DIR)
    compare(
        lakehouse_incremental(spark, SF_DIR),
        lakehouse_incremental_oracle_sql(),
        SF_DIR,
    )


# ------------------------------------------------------ MoR position deletes

def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, c, datetime.datetime(1995, 1, 1 + k)) for k, c in rows], SCHEMA
    )


def _manifest_of(tbl, snapshot_id=None):
    snap = tbl._snapshot(tbl._meta(), snapshot_id)
    return tbl._manifest(snap["manifest"])


def test_mor_delete_no_rewrite(spark, tmp_path):
    """Position deletes must leave every data file untouched, apply at
    read time, accumulate across delete commits, and keep time travel
    to the pre-delete snapshot intact."""
    tbl = IceLiteTable.create(spark, str(tmp_path / "t"), SCHEMA)
    tbl.append(_mk(spark, [(1, "a"), (2, "b"), (3, "a")]))
    tbl.append(_mk(spark, [(4, "b"), (5, "a")]))
    files_before = sorted(e["path"] for e in _manifest_of(tbl)["files"])

    sid = tbl.delete_where(F.col("k") % 2 == 0)
    assert sid == 3
    man = _manifest_of(tbl)
    assert sorted(e["path"] for e in man["files"]) == files_before
    assert len(man["deletes"]) >= 1
    assert sorted(r.k for r in tbl.read().collect()) == [1, 3, 5]
    # pre-delete snapshots still see everything
    assert tbl.read(snapshot_id=2).count() == 5
    # second delete accumulates on the same data files
    assert tbl.delete_where(F.col("cat") == "a") == 4
    assert sorted(r.k for r in tbl.read().collect()) == []
    assert sorted(e["path"] for e in _manifest_of(tbl)["files"]) == files_before
    # no-op delete: no commit
    v = tbl._version()
    assert tbl.delete_where(F.col("k") > 100) is None
    assert tbl._version() == v


def test_mor_delete_scan_and_incremental(spark, tmp_path):
    """Pruned scans and changelog reads apply the snapshot's deletes."""
    tbl = IceLiteTable.create(spark, str(tmp_path / "t"), SCHEMA)
    tbl.append(_mk(spark, [(1, "a"), (2, "b")]))
    tbl.append(_mk(spark, [(3, "a"), (4, "b")]))
    tbl.delete_where(F.col("k").isin(2, 3))
    assert sorted(r.k for r in tbl.scan(predicates=(("k", ">=", 2),)).collect()) == [4]
    added, removed = tbl.read_changes(1, 3)
    assert sorted(r.k for r in added.collect()) == [4]
    assert removed.count() == 0


def test_mor_delete_merge_folds_deletes(spark, tmp_path):
    """A CoW merge over MoR-deleted files must not resurrect deleted
    rows, and delete entries targeting rewritten files are dropped."""
    tbl = IceLiteTable.create(spark, str(tmp_path / "t"), SCHEMA)
    tbl.append(_mk(spark, [(1, "a"), (2, "b"), (3, "a")]))
    tbl.delete_where(F.col("k") == 2)
    tbl.merge(_mk(spark, [(3, "z"), (9, "z")]), on=("k",))
    got = sorted((r.k, r.cat) for r in tbl.read().collect())
    assert got == [(1, "a"), (3, "z"), (9, "z")]  # 2 stays deleted
    # the merge rewrote every file containing k in {3}; files holding
    # only k=1/k=2 rows may survive — any remaining delete entry must
    # still target a live file
    man = _manifest_of(tbl)
    live = {e["path"] for e in man["files"]}
    for d in man["deletes"]:
        assert set(d["targets"]) <= live


def test_mor_delete_compaction_folds(spark, tmp_path):
    """Compaction physically drops deleted rows and clears the folded
    delete entries."""
    tbl = IceLiteTable.create(spark, str(tmp_path / "t"), SCHEMA)
    tbl.append(_mk(spark, [(1, "a")]))
    tbl.append(_mk(spark, [(2, "a")]))
    tbl.append(_mk(spark, [(3, "a")]))
    tbl.delete_where(F.col("k") == 2)
    assert tbl.compact_files(min_rows=10) is not None
    assert sorted(r.k for r in tbl.read().collect()) == [1, 3]
    assert _manifest_of(tbl)["deletes"] == []


def test_mor_delete_expire_retains_delete_files(spark, tmp_path):
    """Snapshot expiry must treat referenced delete files as live."""
    tbl = IceLiteTable.create(spark, str(tmp_path / "t"), SCHEMA)
    tbl.append(_mk(spark, [(1, "a"), (2, "b")]))
    tbl.delete_where(F.col("k") == 1)
    tbl.expire_snapshots(keep_last=1)
    assert sorted(r.k for r in tbl.read().collect()) == [2]


def test_lakehouse_delete_oracle(spark, sf_dir):
    from prec_spark.lakehouse.queries import (
        lakehouse_delete,
        lakehouse_delete_oracle_sql,
    )

    compare(lakehouse_delete(spark, sf_dir), lakehouse_delete_oracle_sql(), sf_dir)


# -------------------------------------------------- hidden partitioning

def test_partition_transform_parse_and_validation(spark, tmp_path):
    import pytest as _pytest

    from prec_spark.lakehouse.table import _parse_spec_field

    assert _parse_spec_field("role") == ("identity", "role", None, "role")
    assert _parse_spec_field("day(ts)") == ("day", "ts", None, "ts_day")
    assert _parse_spec_field("bucket(8,uid)") == ("bucket", "uid", 8, "uid_bucket")
    assert _parse_spec_field("truncate(3,txt)") == ("truncate", "txt", 3, "txt_trunc")
    with _pytest.raises(ValueError):
        _parse_spec_field("bucket(ts)")  # missing count
    with _pytest.raises(ValueError):
        IceLiteTable.create(spark, str(tmp_path / "a"), SCHEMA,
                            partition_by=("day(k)",))  # k is int
    with _pytest.raises(ValueError):
        IceLiteTable.create(spark, str(tmp_path / "b"), SCHEMA,
                            partition_by=("truncate(2,k)",))  # k is int
    with _pytest.raises(ValueError):
        IceLiteTable.create(spark, str(tmp_path / "c"), SCHEMA,
                            partition_by=("bucket(4,nope)",))  # absent


def test_hidden_partition_prunes_and_never_costs_rows(spark, sf_dir):
    """day() directory pruning must strictly shrink the planned file
    set under a time predicate, bucket() under user equality, and the
    scan results must equal a plain filter over the raw parquet."""
    import pyspark.sql.functions as F

    from prec_spark.lakehouse.queries import _hidden_table_root

    tbl = IceLiteTable(spark, _hidden_table_root(spark, sf_dir))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    cut = datetime.datetime(2024, 1, 25)

    n_all = len(tbl.planned_files(()))
    n_day = len(tbl.planned_files((("ts", ">=", cut),)))
    n_bkt = len(tbl.planned_files((("user_id", "=", 13),)))
    assert n_day < n_all and n_bkt < n_all

    got = sorted(r.event_id for r in
                 tbl.scan(predicates=(("ts", ">=", cut),)).collect())
    exp = sorted(r.event_id for r in
                 ev.filter(F.col("ts") >= F.lit(cut)).collect())
    assert got == exp
    gotb = sorted(r.event_id for r in
                  tbl.scan(predicates=(("user_id", "=", 13),)).collect())
    expb = sorted(r.event_id for r in
                  ev.filter(F.col("user_id") == 13).collect())
    assert gotb == expb
    # transform columns never leak into row output
    assert "ts_day" not in tbl.read().columns
    assert "user_id_bucket" not in tbl.read().columns


def test_hidden_partition_strict_op_keeps_boundary_day(spark, tmp_path):
    """ts > (midnight of day D) must KEEP day D's directory — the day
    transform is monotone, not strictly monotone, so '>' relaxes to
    '>=' in the transform domain."""
    from pyspark.sql.types import (
        IntegerType, StructField, StructType, TimestampType,
    )

    sch = StructType([
        StructField("k", IntegerType()),
        StructField("ts", TimestampType()),
    ])
    tbl = IceLiteTable.create(spark, str(tmp_path / "t"), sch,
                              partition_by=("day(ts)",))
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (2, datetime.datetime(2024, 1, 1, 23, 0, 0)),
        (3, datetime.datetime(2024, 1, 2, 1, 0, 0)),
    ]
    tbl.append(spark.createDataFrame(rows, sch))
    # midnight of Jan 1: '>' must keep Jan 1's file (row 2 matches)
    got = sorted(r.k for r in tbl.scan(
        predicates=(("ts", ">", datetime.datetime(2024, 1, 1)),)).collect())
    assert got == [2, 3]
    # equality on a truncated-away timestamp prunes to one day dir
    assert len(tbl.planned_files(
        (("ts", "=", datetime.datetime(2024, 1, 2, 1, 0, 0)),))) == 1


def test_truncate_transform_round_trip(spark, tmp_path):
    tbl = IceLiteTable.create(spark, str(tmp_path / "t"), SCHEMA,
                              partition_by=("truncate(1,cat)",))
    tbl.append(_mk(spark, [(1, "apple"), (2, "avocado"), (3, "banana")]))
    assert len(tbl.planned_files((("cat", "=", "banana"),))) == 1
    got = sorted(r.k for r in tbl.scan(
        predicates=(("cat", "=", "avocado"),)).collect())
    assert got == [2]
    # dynamic partition overwrite by DERIVED partition value: replacing
    # the 'a' prefix partition must not touch 'b'
    tbl.overwrite_partitions(_mk(spark, [(9, "apricot")]))
    assert sorted((r.k, r.cat) for r in tbl.read().collect()) == [
        (3, "banana"), (9, "apricot"),
    ]


def test_lakehouse_hidden_oracle(spark, sf_dir):
    from prec_spark.lakehouse.queries import (
        lakehouse_hidden,
        lakehouse_hidden_oracle_sql,
    )

    compare(lakehouse_hidden(spark, sf_dir), lakehouse_hidden_oracle_sql(), sf_dir)


def test_rollback_restores_data_keeps_history_and_schema(spark, tbl):
    """rollback points the table at an earlier snapshot's data as a
    NEW commit: reads revert, time travel still sees everything, a
    column added after the target reads as NULL (schema stays
    current), and appends on top of the rollback work."""
    s1 = tbl.append(_rows(spark, [1, 2], "a", 1))
    tbl.append(_rows(spark, [3], "b", 2))
    # evolve: add a column after s1
    tbl.append(
        spark.createDataFrame(
            [(4, "c", datetime.datetime(1995, 1, 3), 7)],
            "k int, cat string, ts timestamp, extra int",
        ).coalesce(1)
    )
    sid = tbl.rollback(s1)
    assert sorted(r.k for r in tbl.read().collect()) == [1, 2]
    # schema stays current: the younger column reads as typed NULL
    assert all(r.extra is None for r in tbl.read().collect())
    # history preserved: time travel to the pre-rollback tip still works
    assert sorted(r.k for r in tbl.read(snapshot_id=sid - 1).collect()) == [
        1, 2, 3, 4,
    ]
    assert tbl.snapshots()[-1]["operation"] == "rollback"
    tbl.append(_rows(spark, [9], "a", 4))
    assert sorted(r.k for r in tbl.read().collect()) == [1, 2, 9]


def test_remove_orphan_files(spark, tbl):
    """Unreferenced data files and crashed-writer staging dirs are
    deleted; referenced files survive and the table still reads."""
    import os

    tbl.append(_rows(spark, [1, 2], "a", 1))
    orphan = os.path.join(tbl.data_dir, "cat=a", "c9999-00000.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not really parquet")
    os.makedirs(os.path.join(tbl.root, "tmp-deadbeef"), exist_ok=True)
    removed = tbl.remove_orphan_files()
    assert removed == 2
    assert not os.path.exists(orphan)
    assert sorted(r.k for r in tbl.read().collect()) == [1, 2]
    assert tbl.remove_orphan_files() == 0
