"""IceLite: a from-scratch snapshot/manifest table format (Iceberg-style).

BASELINE.json's north star reads transcripts from "Iceberg-backed"
tables and materializes triples "into partitioned Iceberg output".
The sandbox has no Iceberg runtime jar (and no network to fetch one),
so this module implements the *semantics* that matter at 100 TB from
scratch, on the same architecture Apache Iceberg uses (spec v2,
https://iceberg.apache.org/spec/):

* **Metadata tree, not directory listing.** A table is a pointer file
  (``metadata/version-hint.text``) -> versioned metadata JSON ->
  per-snapshot manifest listing every data file with its partition
  value, row count and per-column min/max stats. Planning a scan
  reads only the manifests — never ``listStatus`` over the data tree,
  which at 10^12 turns / millions of files is the difference between
  milliseconds and minutes on S3-like stores.
* **Snapshot isolation + time travel.** Every commit writes a NEW
  metadata version holding the full snapshot list; readers pin a
  snapshot id and see an immutable file set. ``read(snapshot_id=k)``
  is Iceberg's ``VERSION AS OF``.
* **Atomic optimistic commits.** Writers stage data files (names are
  commit-uuid-prefixed so concurrent writers never collide), then
  swap metadata with an O_EXCL create of ``v{N}.metadata.json`` — the
  same swap-file-wins protocol as Iceberg's HadoopTableOperations. A
  loser re-reads the new state, re-merges its manifest, and retries
  (append never conflicts logically with append).
* **Scan-time pruning.** ``scan(predicates)`` drops whole files by
  partition value and min/max stats driver-side, then hands Spark the
  surviving file list, so the actual columnar scan stays native JVM
  parquet (+ row-group pushdown inside each file); the residual
  predicate is re-applied as a DataFrame filter, so pruning is an
  optimization, never a correctness dependency.
* **Schema evolution with FIELD IDS.** Appends may add columns (the
  union schema is recorded per snapshot; old files read back with
  typed nulls), and ``rename_column`` / ``drop_column`` are
  metadata-only commits: every column owns a permanent field id,
  manifest entries record the name->id map they were written under,
  and reads resolve through the id — files from before a rename are
  scanned under their written name and aliased to the current one,
  stats pruning translates predicate names per entry, and re-adding
  a dropped column's name allocates a FRESH id so old bytes never
  resurrect (the Iceberg spec's column-resolution contract).

Partition spec: identity transform over string columns, plus HIDDEN
partition transforms in the Iceberg sense — ``day(ts)``,
``bucket(N, col)`` (md5 hash bucket, the cross-engine-portable hash
used across this repo) and ``truncate(W, col)``. A transform's value
is materialized only as the Hive-style directory name
(``data/ts_day=2024-01-07/``), never as a data column: writers derive
it, and scan planning maps predicates on the SOURCE column to the
transform domain (``ts >= X`` prunes on ``day >= day(X)`` because day
is monotone; ``bucket`` prunes equality only). That is what "users
never see or maintain partition columns" means in Iceberg. Identity
partitions reconstruct through ``basePath``; transform directories
are consumed by the planner and dropped from row output.

The reference has no storage layer at all (in-memory RDF store,
SURVEY.md §2.1); this module is pure scale infrastructure in the
spirit of its sources/sinks.
"""

from __future__ import annotations

import datetime as _dt
import glob
import hashlib
import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


class CommitConflict(RuntimeError):
    """Raised when the optimistic metadata swap loses too many times."""


def _identity_fields(schema: StructType) -> list[dict]:
    """Positional field ids for tables created before field-id
    tracking (every written name equals its current name)."""
    return [{"id": i + 1, "name": f.name} for i, f in enumerate(schema.fields)]


# ---------------------------------------------------------------- helpers
def _ser_stat(v):
    """Serialize a parquet stat value into a JSON-safe, comparable form.

    Timestamps/dates become epoch integers so manifest pruning compares
    them numerically; bytes are dropped (no pruning on binary cols).
    """
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.replace(tzinfo=None)
        epoch = _dt.datetime(1970, 1, 1)
        return int((v - epoch).total_seconds() * 1_000_000)
    if isinstance(v, _dt.date):
        return v.toordinal()
    if isinstance(v, (bytes, bytearray)):
        return None
    if isinstance(v, (bool, int, float, str)):
        return v
    return None


def _file_stats(path: str) -> tuple[int, dict]:
    """(row_count, {col: {min, max, nulls}}) from the parquet footer."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    stats: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema.split(".")[0]
            s = col.statistics
            if s is None or not s.has_min_max:
                stats[name] = None  # unknown -> never prune on it
                continue
            lo, hi = _ser_stat(s.min), _ser_stat(s.max)
            nulls = s.null_count if s.null_count is not None else 0
            if lo is None or hi is None:
                stats[name] = None
                continue
            cur = stats.get(name)
            if cur is None and name in stats:
                continue  # a previous row group already gave up
            if cur is None:
                stats[name] = {"min": lo, "max": hi, "nulls": nulls}
            elif type(cur["min"]) is not type(lo):
                stats[name] = None  # nested/struct leaves: don't merge
            else:
                cur["min"] = min(cur["min"], lo)
                cur["max"] = max(cur["max"], hi)
                cur["nulls"] += nulls
    return md.num_rows, {k: v for k, v in stats.items() if v is not None}


_OPS = {
    "=": lambda lo, hi, v: lo <= v <= hi,
    "<": lambda lo, hi, v: lo < v,
    "<=": lambda lo, hi, v: lo <= v,
    ">": lambda lo, hi, v: hi > v,
    ">=": lambda lo, hi, v: hi >= v,
}


#: "day(ts)" / "bucket(8,user_id)" / "truncate(4,text)"; bare names
#: are identity transforms
_SPEC_RE = re.compile(r"^(day|bucket|truncate)\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\)$")


def _parse_spec_field(s: str) -> tuple[str, str, int | None, str]:
    """spec string -> (kind, source_col, param, partition_col_name)."""
    m = _SPEC_RE.match(s)
    if m is None:
        return ("identity", s, None, s)
    kind, param, source = m.group(1), m.group(2), m.group(3)
    if kind == "day":
        if param is not None:
            raise ValueError(f"day() takes no width: {s!r}")
        return ("day", source, None, f"{source}_day")
    if param is None:
        raise ValueError(f"{kind}() needs a width/bucket count: {s!r}")
    n = int(param)
    if n < 1:
        raise ValueError(f"{kind}() width must be >= 1: {s!r}")
    suffix = "bucket" if kind == "bucket" else "trunc"
    return (kind, source, n, f"{source}_{suffix}")


def _transform_expr(kind: str, source: str, param: int | None):
    """The write-side Spark expression materializing a transform."""
    c = F.col(source)
    if kind == "identity":
        return c
    if kind == "day":
        return F.date_format(c, "yyyy-MM-dd")
    if kind == "bucket":
        return (
            F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
            .cast("long") % param
        ).cast("string")
    if kind == "truncate":
        return F.substring(c, 1, param)
    raise ValueError(kind)


def _transform_literal(kind: str, param: int | None, val) -> str | None:
    """Driver-side twin of :func:`_transform_expr` for predicate
    literals; None = not transformable, keep the file."""
    if kind == "day":
        if isinstance(val, (_dt.datetime, _dt.date)):
            return val.strftime("%Y-%m-%d")
        return None
    if kind == "bucket":
        h = hashlib.md5(str(val).encode()).hexdigest()[:8]
        return str(int(h, 16) % param)
    if kind == "truncate":
        return val[:param] if isinstance(val, str) else None
    return None


#: op relaxation under a MONOTONE transform t: s >= v  =>  t(s) >= t(v)
#: (strict ops lose strictness: distinct s, v can share a day/prefix)
_MONOTONE_OP = {"=": "=", ">": ">=", ">=": ">=", "<": "<=", "<=": "<="}


def _maybe_matches(entry: dict, col: str, op: str, val,
                   spec: list[str] | None = None) -> bool:
    """Can ANY row of this file satisfy ``col op val``? (conservative)"""
    part = entry["partition"].get(col)
    if part is not None:
        if not isinstance(val, str):
            return True  # partition values are strings; keep on mismatch
        return _OPS[op](part, part, val)
    # hidden-transform pruning: map the source-column predicate into
    # each transform's domain (day/truncate are monotone; bucket is
    # equality-only)
    for s in spec or ():
        kind, source, param, pname = _parse_spec_field(s)
        if kind == "identity" or source != col:
            continue
        pval = entry["partition"].get(pname)
        if pval is None:
            continue
        tval = _transform_literal(kind, param, val)
        if tval is None:
            continue
        if kind == "bucket":
            if op == "=" and pval != tval:
                return False
            continue
        if not _OPS[_MONOTONE_OP[op]](pval, pval, tval):
            return False
    st = entry["stats"].get(col)
    if st is None:
        return True  # no stats -> cannot prune
    v = _ser_stat(val)
    if v is None or isinstance(v, str) != isinstance(st["min"], str):
        return True  # incomparable domains -> keep
    return _OPS[op](st["min"], st["max"], v)


def _predicate_column(spark_col: str, op: str, val):
    c = F.col(spark_col)
    if isinstance(val, _dt.datetime):
        lit = F.lit(val.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    else:
        lit = F.lit(val)
    return {"=": c == lit, "<": c < lit, "<=": c <= lit,
            ">": c > lit, ">=": c >= lit}[op]


# ---------------------------------------------------------------- table
class IceLiteTable:
    """Handle to an IceLite table rooted at a directory.

    Every operation re-reads the version pointer, so multiple handles
    (or processes) interleave safely under the optimistic protocol.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")

    # ------------------------------------------------------------ create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: StructType,
        partition_by: tuple[str, ...] = (),
    ) -> "IceLiteTable":
        t = cls(spark, root)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        for c in partition_by:
            kind, source, _param, _pname = _parse_spec_field(c)
            if source not in schema.fieldNames():
                raise ValueError(f"partition source column {source!r} not in schema")
            src_type = schema[source].dataType.simpleString()
            if kind == "identity" and src_type != "string":
                raise ValueError(
                    f"identity partition col {c!r} must be string, got "
                    f"{src_type} (use bucket()/truncate()/day() transforms "
                    "for non-string partitioning)"
                )
            if kind == "day" and src_type not in ("timestamp", "date",
                                                  "timestamp_ntz"):
                raise ValueError(f"day() needs a timestamp/date source: {c!r}")
            if kind == "truncate" and src_type != "string":
                raise ValueError(f"truncate() needs a string source: {c!r}")
        meta = {
            "format_version": 1,
            "table_uuid": str(uuid.uuid4()),
            "partition_spec": list(partition_by),
            "current_snapshot_id": 0,
            "snapshots": [],
            "schema": json.loads(schema.json()),
            # Iceberg-style field ids: the PERMANENT identity of a
            # column. Renames change only the name attached to an id;
            # files written before the rename resolve through the id,
            # and a re-added column name gets a FRESH id so old data
            # never resurrects under it.
            "fields": [
                {"id": i + 1, "name": f.name}
                for i, f in enumerate(schema.fields)
            ],
            "last_field_id": len(schema.fields),
        }
        t._write_version(1, meta, {"files": []},
                         f"snap-1-{uuid.uuid4().hex[:12]}.manifest.json")
        return t

    # ------------------------------------------------------------ state
    def _version(self) -> int:
        with open(os.path.join(self.meta_dir, "version-hint.text")) as fh:
            return int(fh.read().strip())

    def _meta(self, version: int | None = None) -> dict:
        v = self._version() if version is None else version
        with open(os.path.join(self.meta_dir, f"v{v}.metadata.json")) as fh:
            return json.load(fh)

    def _manifest(self, name: str) -> dict:
        with open(os.path.join(self.meta_dir, name)) as fh:
            return json.load(fh)

    def snapshots(self) -> list[dict]:
        return self._meta()["snapshots"]

    def current_schema(self) -> StructType:
        return StructType.fromJson(self._meta()["schema"])

    def _snapshot(self, meta: dict, snapshot_id: int | None) -> dict | None:
        sid = meta["current_snapshot_id"] if snapshot_id is None else snapshot_id
        if sid == 0:
            return None
        for s in meta["snapshots"]:
            if s["snapshot_id"] == sid:
                return s
        raise ValueError(f"unknown snapshot {sid}")

    # ------------------------------------------------------------ write
    def _write_version(self, version: int, meta: dict, manifest: dict | None,
                       man_name: str | None) -> None:
        """O_EXCL metadata swap: create v{N} exclusively, then move the
        hint. A concurrent winner makes the create raise FileExistsError.

        ``man_name`` must be attempt-unique (uuid-suffixed): two racers
        targeting the same version otherwise overwrite each other's
        manifest before the metadata swap decides the winner. Pass
        ``manifest=None`` for metadata-only commits (snapshot expiry),
        which reuse already-written manifests.
        """
        if manifest is not None:
            with open(os.path.join(self.meta_dir, man_name + ".tmp"), "w") as fh:
                json.dump(manifest, fh)
            os.rename(
                os.path.join(self.meta_dir, man_name + ".tmp"),
                os.path.join(self.meta_dir, man_name),
            )
        path = os.path.join(self.meta_dir, f"v{version}.metadata.json")
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as fh:
            json.dump(meta, fh)
        hint_tmp = os.path.join(self.meta_dir, f".hint.{uuid.uuid4().hex}")
        with open(hint_tmp, "w") as fh:
            fh.write(str(version))
        os.rename(hint_tmp, os.path.join(self.meta_dir, "version-hint.text"))

    def _stage_files(self, df: DataFrame, spec: list[str], schema: StructType) -> list[dict]:
        """Write df as parquet data files and return manifest entries.

        Files are staged through a scratch dir then renamed into
        ``data/`` under a commit-unique prefix; stats come from the
        parquet footers (driver-side, bounded by files-per-commit).
        """
        cid = uuid.uuid4().hex[:12]
        staging = os.path.join(self.root, f"tmp-{cid}")
        out = df.select([F.col(f.name).cast(f.dataType) for f in schema.fields
                         if f.name in df.columns])
        parsed = [_parse_spec_field(s) for s in spec]
        for kind, source, param, pname in parsed:
            if kind != "identity":
                out = out.withColumn(pname, _transform_expr(kind, source, param))
        writer = out.write.mode("overwrite")
        if spec:
            writer = writer.partitionBy(*[p[3] for p in parsed])
        # Spark's default INT96 timestamps carry NO parquet min/max stats,
        # which would silently disable manifest-level time pruning — write
        # TIMESTAMP_MICROS (Iceberg's required physical type) instead.
        ts_key = "spark.sql.parquet.outputTimestampType"
        prev = self.spark.conf.get(ts_key)
        self.spark.conf.set(ts_key, "TIMESTAMP_MICROS")
        try:
            writer.parquet(staging)
        finally:
            self.spark.conf.set(ts_key, prev)

        entries: list[dict] = []
        i = 0
        for path in sorted(glob.glob(os.path.join(staging, "**", "*.parquet"),
                                     recursive=True)):
            rel_dir = os.path.relpath(os.path.dirname(path), staging)
            partition = {}
            if rel_dir != ".":
                for piece in rel_dir.split(os.sep):
                    k, _, v = piece.partition("=")
                    partition[k] = v
            dest_dir = (self.data_dir if rel_dir == "."
                        else os.path.join(self.data_dir, rel_dir))
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(dest_dir, f"c{cid}-{i:05d}.parquet")
            os.rename(path, dest)
            rows, stats = _file_stats(dest)
            if rows == 0:
                os.remove(dest)
                continue
            entries.append({
                "path": os.path.relpath(dest, self.root),
                "partition": partition,
                "rows": rows,
                "stats": stats,
            })
            i += 1
        shutil.rmtree(staging, ignore_errors=True)
        return entries

    def _commit(self, new_entries: list[dict], operation: str,
                replace_partitions: list[dict] | None,
                df_schema: StructType,
                replace_paths: set[str] | None = None,
                base_version: int | None = None,
                new_deletes: list[dict] | None = None) -> int:
        """Optimistic commit loop: merge against the CURRENT manifest,
        attempt the metadata swap, re-merge on conflict.

        ``base_version`` pins serializable operations (MERGE/compact):
        their rewritten files were derived from that exact version, so
        if anything else committed meanwhile the rewrite is stale and
        the commit must fail loudly instead of silently re-merging."""
        for _ in range(20):
            version = self._version()
            if base_version is not None and version != base_version:
                raise CommitConflict(
                    f"{operation} planned against v{base_version} but the "
                    f"table is now at v{version}: rewritten files are stale; "
                    "re-run the operation against the current snapshot"
                )
            meta = self._meta(version)
            snap = self._snapshot(meta, None)
            base = self._manifest(snap["manifest"])["files"] if snap else []
            if operation == "overwrite":
                keep = [e for e in base
                        if e["partition"] not in (replace_partitions or [])]
            elif replace_paths is not None:
                keep = [e for e in base if e["path"] not in replace_paths]
            else:
                keep = base
            files = keep + new_entries

            # carry position-delete files forward, dropping targets
            # whose data file this commit replaced (their rows are
            # physically gone from the rewritten files)
            live_paths = {e["path"] for e in files}
            deletes = []
            for d in self._deletes(snap):
                targets = [p for p in d["targets"] if p in live_paths]
                if targets:
                    deletes.append({**d, "targets": targets})
            deletes.extend(new_deletes or [])

            schema = StructType.fromJson(meta["schema"])
            evolved = StructType(schema.fields + [
                StructField(f.name, f.dataType, True)
                for f in df_schema.fields if f.name not in schema.fieldNames()
            ])
            for f in df_schema.fields:
                have = schema[f.name].dataType if f.name in schema.fieldNames() else None
                if have is not None and have != f.dataType:
                    raise ValueError(
                        f"type change for column {f.name!r} not supported: "
                        f"{have.simpleString()} -> {f.dataType.simpleString()}"
                    )

            # assign field ids to any columns this commit adds, and
            # stamp the new entries with the name->id map they were
            # written under (how reads survive later renames)
            fields = [dict(f) for f in meta.get("fields")
                      or _identity_fields(schema)]
            last_id = meta.get("last_field_id", len(fields))
            by_name = {f["name"]: f["id"] for f in fields}
            for f in evolved.fields:
                if f.name not in by_name:
                    last_id += 1
                    fields.append({"id": last_id, "name": f.name})
                    by_name[f.name] = last_id
            write_ids = {f.name: by_name[f.name] for f in evolved.fields}
            for e in new_entries:
                e["field_ids"] = write_ids

            new_version = version + 1
            sid = (meta["snapshots"][-1]["snapshot_id"] + 1
                   if meta["snapshots"] else 1)
            man_name = f"snap-{new_version}-{uuid.uuid4().hex[:12]}.manifest.json"
            new_meta = dict(meta)
            new_meta["schema"] = json.loads(evolved.json())
            new_meta["fields"] = fields
            new_meta["last_field_id"] = last_id
            new_meta["current_snapshot_id"] = sid
            new_meta["snapshots"] = meta["snapshots"] + [{
                "snapshot_id": sid,
                "operation": operation,
                "manifest": man_name,
                "added_files": len(new_entries),
                "total_files": len(files),
                "total_rows": sum(e["rows"] for e in files),
                "schema": json.loads(evolved.json()),
                "fields": fields,
            }]
            hook = getattr(self, "_test_pre_commit", None)
            if hook is not None:
                self._test_pre_commit = None
                hook()
            try:
                self._write_version(
                    new_version, new_meta,
                    {"files": files, "deletes": deletes}, man_name,
                )
                return sid
            except FileExistsError:
                continue  # lost the race: re-read state and re-merge
        raise CommitConflict(f"gave up after 20 swap attempts at {self.root}")

    def append(self, df: DataFrame) -> int:
        meta = self._meta()
        schema = StructType.fromJson(meta["schema"])
        write_schema = StructType(schema.fields + [
            f for f in df.schema.fields if f.name not in schema.fieldNames()
        ])
        entries = self._stage_files(df, meta["partition_spec"], write_schema)
        return self._commit(entries, "append", None, df.schema)

    def overwrite_partitions(self, df: DataFrame) -> int:
        """Dynamic partition overwrite: replace exactly the partitions
        present in ``df`` (Iceberg's ``INSERT OVERWRITE`` semantics)."""
        meta = self._meta()
        spec = meta["partition_spec"]
        if not spec:
            raise ValueError("overwrite_partitions needs a partitioned table")
        parsed = [_parse_spec_field(s) for s in spec]
        names = [p[3] for p in parsed]
        proj = df
        for kind, source, param, pname in parsed:
            if kind != "identity":
                proj = proj.withColumn(pname, _transform_expr(kind, source, param))
        parts = [
            {k: r[k] for k in names}
            for r in proj.select(*names).distinct().collect()
        ]
        schema = StructType.fromJson(meta["schema"])
        write_schema = StructType(schema.fields + [
            f for f in df.schema.fields if f.name not in schema.fieldNames()
        ])
        entries = self._stage_files(df, spec, write_schema)
        return self._commit(entries, "overwrite", parts, df.schema)

    def merge(self, source: DataFrame, on: tuple[str, ...]) -> int:
        """Copy-on-write MERGE (upsert) keyed on ``on``:

        * target rows whose key appears in ``source`` are replaced by
          the source row (whole-row update; missing columns -> null),
        * source rows with unseen keys are inserted,
        * every other target row is untouched — and so is its FILE:
          only data files that actually contain a matched key are
          rewritten, which is what makes row-level updates affordable
          when a batch touches 0.1% of a 100 TB table.

        Isolation is serializable: the rewrite is planned against the
        current version, and the commit fails with :class:`CommitConflict`
        if anything else lands first (a stale rewrite must never win).
        """
        if not on:
            raise ValueError("merge needs at least one key column")
        version = self._version()
        meta = self._meta(version)
        snap = self._snapshot(meta, None)
        base = self._manifest(snap["manifest"])["files"] if snap else []
        schema = StructType.fromJson(meta["schema"])
        keys = list(on)
        src_keys = source.select(*keys).distinct()

        affected_paths: set[str] = set()
        write_df = source
        if base:
            # _del_path from the MoR read path is already the
            # manifest-relative file path (input_file_name() cannot be
            # used here: the delete anti-join makes the plan multi-source)
            tagged = self._read_files(
                base, schema, self._deletes(snap), with_pos=True,
                fields=snap.get("fields"),
            )
            hit = (
                tagged.join(src_keys, on=keys, how="leftsemi")
                .select("_del_path").distinct().collect()
            )
            affected_paths.update(r._del_path for r in hit)
            affected = [e for e in base if e["path"] in affected_paths]
            if affected:
                survivors = self._read_files(
                    affected, schema, self._deletes(snap),
                    fields=snap.get("fields"),
                ).join(src_keys, on=keys, how="left_anti")
                write_df = survivors.unionByName(
                    source, allowMissingColumns=True
                )

        write_schema = StructType(schema.fields + [
            f for f in source.schema.fields if f.name not in schema.fieldNames()
        ])
        entries = self._stage_files(write_df, meta["partition_spec"], write_schema)
        return self._commit(entries, "merge", None, source.schema,
                            replace_paths=affected_paths,
                            base_version=version)

    def delete_where(self, condition) -> int | None:
        """Merge-on-read DELETE (Iceberg v2 position deletes): rows
        matching ``condition`` (a Column) are recorded as (data-file
        path, row position) pairs in a delete file — NO data file is
        rewritten, which is what makes frequent small deletes (GDPR
        erasure, bad-batch retraction) affordable on a 100 TB table.
        Scans apply the delete file with an anti-join at read time;
        compaction / clustering rewrites later fold the deletes into
        the data files and drop the delete entries.

        Serializable like merge: positions are only valid against the
        exact files they were computed from, so the commit fails if
        anything else lands first. Returns the new snapshot id, or
        None when nothing matched."""
        version = self._version()
        meta = self._meta(version)
        snap = self._snapshot(meta, None)
        if snap is None:
            raise ValueError("cannot delete from an empty table")
        base = self._manifest(snap["manifest"])["files"]
        schema = StructType.fromJson(snap["schema"])
        matched = (
            self._read_files(base, schema, self._deletes(snap),
                             with_pos=True, fields=snap.get("fields"))
            .filter(condition)
            .select(
                F.col("_del_path").alias("path"),
                F.col("_del_pos").alias("pos"),
            )
        )
        targets = sorted(r.path for r in matched.select("path").distinct().collect())
        if not targets:
            return None
        cid = uuid.uuid4().hex[:12]
        staging = os.path.join(self.root, f"tmp-del-{cid}")
        matched.write.mode("overwrite").parquet(staging)
        dest_dir = os.path.join(self.data_dir, "deletes")
        os.makedirs(dest_dir, exist_ok=True)
        entries: list[dict] = []
        i = 0
        for path in sorted(glob.glob(os.path.join(staging, "*.parquet"))):
            rows, _stats = _file_stats(path)
            if rows == 0:
                continue
            dest = os.path.join(dest_dir, f"d{cid}-{i:05d}.parquet")
            os.rename(path, dest)
            entries.append({
                "path": os.path.relpath(dest, self.root),
                "rows": rows,
                "targets": targets,
            })
            i += 1
        shutil.rmtree(staging, ignore_errors=True)
        return self._commit([], "delete", None, schema,
                            base_version=version, new_deletes=entries)

    def rewrite_clustered(self, key, num_files: int) -> int:
        """Replace the current snapshot's files with a layout clustered
        by ``key`` (a Column expression, e.g. :func:`zorder.zorder_key`):
        range-partition into ``num_files`` files, sort within each, so
        per-file min/max stats become tight boxes and scan planning can
        skip files on every clustered dimension.

        Rows are untouched — this is Iceberg's OPTIMIZE/rewrite_data_files
        maintenance action. Serializable like merge: fails on concurrent
        commits instead of replacing files it did not read.
        """
        version = self._version()
        meta = self._meta(version)
        snap = self._snapshot(meta, None)
        if snap is None:
            raise ValueError("cannot rewrite an empty table")
        base = self._manifest(snap["manifest"])["files"]
        schema = StructType.fromJson(snap["schema"])
        ordered = (
            self._read_files(base, schema, self._deletes(snap),
                             fields=snap.get("fields"))
            .repartitionByRange(num_files, key)
            .sortWithinPartitions(key)
        )
        entries = self._stage_files(ordered, meta["partition_spec"], schema)
        return self._commit(entries, "replace", None, schema,
                            replace_paths={e["path"] for e in base},
                            base_version=version)

    # ------------------------------------------------ schema evolution
    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only column rename (Iceberg ALTER TABLE ... RENAME
        COLUMN): no data file is touched — the column's FIELD ID keeps
        its identity and files written under the old name keep
        resolving through it. On a 100 TB table this is the difference
        between an O(1) commit and a full rewrite."""
        def mutate(schema, fields, last_id):
            if old not in schema.fieldNames():
                raise ValueError(f"no such column: {old!r}")
            if new in schema.fieldNames():
                raise ValueError(f"column already exists: {new!r}")
            new_schema = StructType([
                StructField(new if f.name == old else f.name,
                            f.dataType, f.nullable)
                for f in schema.fields
            ])
            for f in fields:
                if f["name"] == old:
                    f["name"] = new
            return new_schema, fields, last_id

        return self._evolve_schema("rename-column", {old}, mutate)

    def drop_column(self, name: str) -> int:
        """Metadata-only column drop: files keep the bytes, readers
        stop projecting them. Re-adding the same NAME later allocates
        a fresh field id, so the old bytes never resurrect under the
        new column — the Iceberg drop/re-add contract."""
        def mutate(schema, fields, last_id):
            if name not in schema.fieldNames():
                raise ValueError(f"no such column: {name!r}")
            if len(schema.fields) == 1:
                raise ValueError("cannot drop the last column")
            new_schema = StructType(
                [f for f in schema.fields if f.name != name]
            )
            return new_schema, [f for f in fields if f["name"] != name], last_id

        return self._evolve_schema("drop-column", {name}, mutate)

    def _evolve_schema(self, operation: str, touched: set[str],
                       mutate) -> int:
        """Optimistic metadata-only schema commit: same file set, new
        snapshot carrying the evolved schema + field list (a fresh
        manifest copy is written — snapshots never share manifest
        files, so expiry can delete per-snapshot)."""
        sources = {
            _parse_spec_field(s)[1] for s in self._meta()["partition_spec"]
        }
        if touched & sources:
            raise ValueError(
                f"cannot evolve partition source column(s) {touched & sources}"
            )
        for _ in range(20):
            version = self._version()
            meta = self._meta(version)
            schema = StructType.fromJson(meta["schema"])
            fields = [dict(f) for f in meta.get("fields")
                      or _identity_fields(schema)]
            last_id = meta.get("last_field_id", len(fields))
            new_schema, new_fields, last_id = mutate(schema, fields, last_id)
            snap = self._snapshot(meta, None)
            files = self._manifest(snap["manifest"])["files"] if snap else []
            deletes = self._deletes(snap)
            new_version = version + 1
            sid = (meta["snapshots"][-1]["snapshot_id"] + 1
                   if meta["snapshots"] else 1)
            man_name = f"snap-{new_version}-{uuid.uuid4().hex[:12]}.manifest.json"
            new_meta = dict(meta)
            new_meta["schema"] = json.loads(new_schema.json())
            new_meta["fields"] = new_fields
            new_meta["last_field_id"] = last_id
            new_meta["current_snapshot_id"] = sid
            new_meta["snapshots"] = meta["snapshots"] + [{
                "snapshot_id": sid,
                "operation": operation,
                "manifest": man_name,
                "added_files": 0,
                "total_files": len(files),
                "total_rows": sum(e["rows"] for e in files),
                "schema": json.loads(new_schema.json()),
                "fields": new_fields,
            }]
            try:
                self._write_version(new_version, new_meta,
                                    {"files": files, "deletes": deletes},
                                    man_name)
                return sid
            except FileExistsError:
                continue  # lost the race: re-read and re-apply
        raise CommitConflict(f"gave up evolving schema at {self.root}")

    # ------------------------------------------------------ maintenance
    def expire_snapshots(self, keep_last: int) -> dict:
        """Drop all but the newest ``keep_last`` snapshots, delete their
        manifests, and delete data files no retained snapshot references
        (Iceberg's expire_snapshots + remove_orphan_files in one pass).

        Time travel to an expired snapshot id then fails loudly — that
        is the point: expiry is what bounds metadata and storage growth
        when a table takes thousands of commits a day.
        """
        if keep_last < 1:
            raise ValueError("must keep at least the current snapshot")
        for _ in range(20):
            version = self._version()
            meta = self._meta(version)
            snaps = meta["snapshots"]
            if len(snaps) <= keep_last:
                return {"expired_snapshots": 0, "deleted_files": 0}
            keep, drop = snaps[-keep_last:], snaps[:-keep_last]
            live = {
                e["path"]
                for s in keep
                for e in (
                    self._manifest(s["manifest"])["files"]
                    + self._manifest(s["manifest"]).get("deletes", [])
                )
            }
            dead_files = {
                e["path"]
                for s in drop
                for e in (
                    self._manifest(s["manifest"])["files"]
                    + self._manifest(s["manifest"]).get("deletes", [])
                )
            } - live
            new_meta = dict(meta)
            new_meta["snapshots"] = keep
            try:
                self._write_version(version + 1, new_meta, None, None)
            except FileExistsError:
                continue  # a writer landed: recompute liveness and retry
            # the swap succeeded: physical deletes are now safe (no
            # retained snapshot references these paths/manifests)
            for p in dead_files:
                try:
                    os.remove(os.path.join(self.root, p))
                except OSError:
                    pass
            for s in drop:
                try:
                    os.remove(os.path.join(self.meta_dir, s["manifest"]))
                except OSError:
                    pass
            return {
                "expired_snapshots": len(drop),
                "deleted_files": len(dead_files),
            }
        raise CommitConflict(f"gave up expiring snapshots at {self.root}")

    def rollback(self, snapshot_id: int) -> int:
        """Point the table back at an earlier snapshot's DATA as a NEW
        commit (Iceberg's rollback_to_snapshot): history is preserved
        — nothing is deleted, time travel still sees every snapshot —
        and the schema stays CURRENT (old entries resolve through
        their field-id maps, younger columns read as typed NULLs),
        matching Iceberg's "rollback moves data, not schema" contract.
        The target's manifest is copied under a fresh attempt-unique
        name so snapshot expiry never has to reason about shared
        manifest files."""
        for _ in range(20):
            version = self._version()
            meta = self._meta(version)
            target = self._snapshot(meta, snapshot_id)
            if target is None:
                raise ValueError("cannot roll back to the empty snapshot 0")
            man = self._manifest(target["manifest"])
            sid = meta["snapshots"][-1]["snapshot_id"] + 1
            man_name = f"snap-{version + 1}-{uuid.uuid4().hex[:12]}.manifest.json"
            new_meta = dict(meta)
            new_meta["current_snapshot_id"] = sid
            new_meta["snapshots"] = meta["snapshots"] + [{
                "snapshot_id": sid,
                "operation": "rollback",
                "manifest": man_name,
                "added_files": 0,
                "total_files": len(man["files"]),
                "total_rows": sum(e["rows"] for e in man["files"]),
                "schema": meta["schema"],
                "fields": meta["fields"],
                "rolled_back_to": snapshot_id,
            }]
            try:
                self._write_version(version + 1, new_meta, man, man_name)
                return sid
            except FileExistsError:
                continue  # lost the race: re-resolve and retry
        raise CommitConflict(f"gave up rolling back at {self.root}")

    def remove_orphan_files(self, older_than_s: float = 0.0) -> int:
        """Delete files under the table that NO snapshot references —
        the leftovers of crashed writers (staged ``tmp-*`` dirs, data
        files moved into place whose commit never landed).  Pass a
        real ``older_than_s`` horizon in production (Iceberg defaults
        to 3 days) so an in-flight writer's fresh files survive; 0
        means "everything unreferenced", which is only safe when no
        writer is running."""
        import shutil
        import time

        meta = self._meta()
        live: set[str] = set()
        for s in meta["snapshots"]:
            m = self._manifest(s["manifest"])
            live |= {e["path"] for e in m["files"] + m.get("deletes", [])}
        cutoff = time.time() - older_than_s
        removed = 0
        for walk_root, _dirs, files in os.walk(self.data_dir):
            for f in files:
                full = os.path.join(walk_root, f)
                rel = os.path.relpath(full, self.root)
                if rel not in live and os.path.getmtime(full) <= cutoff:
                    os.remove(full)
                    removed += 1
        for d in glob.glob(os.path.join(self.root, "tmp-*")):
            if os.path.getmtime(d) <= cutoff:
                shutil.rmtree(d, ignore_errors=True)
                removed += 1
        return removed

    def compact_files(self, min_rows: int) -> int | None:
        """Bin-pack small files: within each partition, files holding
        fewer than ``min_rows`` rows are read back and rewritten as one
        file per partition. Streaming ingestion produces a long tail of
        tiny files; without compaction, scan planning and open() cost
        grows with commit COUNT instead of data size.

        Returns the new snapshot id, or None if nothing needed packing.
        """
        version = self._version()
        meta = self._meta(version)
        snap = self._snapshot(meta, None)
        if snap is None:
            return None
        base = self._manifest(snap["manifest"])["files"]
        by_part: dict[tuple, list[dict]] = {}
        for e in base:
            if e["rows"] < min_rows:
                by_part.setdefault(tuple(sorted(e["partition"].items())), []).append(e)
        small = [e for grp in by_part.values() if len(grp) > 1 for e in grp]
        if not small:
            return None
        schema = StructType.fromJson(snap["schema"])
        spec = meta["partition_spec"]
        packed = self._read_files(small, schema, self._deletes(snap),
                                  fields=snap.get("fields"))
        # one task per packed partition value -> one output file each;
        # unpartitioned tables pack into a single file (transform specs
        # repartition on the derived expression, not a data column)
        exprs = [_transform_expr(*_parse_spec_field(s)[:3]) for s in spec]
        packed = (packed.repartition(len(by_part), *exprs) if spec
                  else packed.coalesce(1))
        entries = self._stage_files(packed, spec, schema)
        return self._commit(entries, "replace", None, schema,
                            replace_paths={e["path"] for e in small},
                            base_version=version)

    # ------------------------------------------------------------ read
    def planned_files(
        self,
        predicates: tuple = (),
        snapshot_id: int | None = None,
    ) -> list[dict]:
        """Manifest-level scan planning: the surviving file entries.

        ``predicates`` are ``(col, op, value)`` triples, op in
        ``= < <= > >=`` — the same shape Iceberg's TableScan.filter
        binds. Pruning is conservative: a file is dropped only when its
        partition value or min/max stats PROVE the predicate false."""
        meta = self._meta()
        snap = self._snapshot(meta, snapshot_id)
        if snap is None:
            return []
        files = self._manifest(snap["manifest"])["files"]
        spec = meta["partition_spec"]
        # stats in a manifest entry are keyed by the names the file was
        # WRITTEN with; translate each predicate column through its
        # field id so pruning keeps working after a rename
        id_by_name = {
            f["name"]: f["id"]
            for f in (snap.get("fields") or meta.get("fields") or ())
        }
        def entry_col(e: dict, col: str) -> str:
            fmap = e.get("field_ids")
            fid = id_by_name.get(col)
            if not fmap or fid is None:
                return col
            for written, wid in fmap.items():
                if wid == fid:
                    return written
            return col  # column younger than the file: stats absent -> keep
        for col, op, val in predicates:
            files = [
                e for e in files
                if _maybe_matches(e, entry_col(e, col), op, val, spec)
            ]
        return files

    def _deletes(self, snap: dict | None) -> list[dict]:
        """The snapshot's position-delete file entries (v2 MoR)."""
        if snap is None:
            return []
        return self._manifest(snap["manifest"]).get("deletes", [])

    def _read_files(
        self,
        entries: list[dict],
        schema: StructType,
        deletes: list[dict] | None = None,
        with_pos: bool = False,
        fields: list[dict] | None = None,
    ) -> DataFrame:
        """Read data files, applying position deletes merge-on-read.

        ``deletes`` entries are ``{path, rows, targets}``: a parquet
        file of (path, pos) pairs naming rows of the ``targets`` data
        files. Rows are dropped by an anti-join on (relative data-file
        path, in-file row index) — the data files themselves are never
        rewritten, which is the whole point of MoR deletes. Delete
        files whose targets are not among ``entries`` are skipped, so
        a pruned scan never pays for deletes on files it won't read.

        ``fields`` is the [{id, name}] list the requested ``schema``
        names resolve under; each entry's ``field_ids`` records the
        names IT was written with, so files from before a rename are
        read under their written name and aliased to the current one
        (Iceberg field-id resolution). Files predating a column get
        typed NULLs; columns a file wrote but the schema dropped are
        simply not projected. Entries sharing a name mapping are read
        as ONE multi-path scan, so the common no-rename case stays a
        single source."""
        pos_cols = ["_del_path", "_del_pos"]
        if not entries:
            out = self.spark.createDataFrame([], schema)
            if with_pos:
                out = out.withColumn("_del_path", F.lit(None).cast("string"))
                out = out.withColumn("_del_pos", F.lit(None).cast("long"))
            return out
        id_by_name = {
            f["name"]: f["id"] for f in (fields or _identity_fields(schema))
        }
        need = {e["path"] for e in entries}
        live = [
            d for d in (deletes or []) if need.intersection(d["targets"])
        ]
        want_pos = with_pos or bool(live)
        # group entries by their (current name -> written name) mapping
        groups: dict[tuple, list[dict]] = {}
        for e in entries:
            fmap = e.get("field_ids")
            if fmap:
                name_by_id = {v: k for k, v in fmap.items()}
                key = tuple(
                    (f.name, name_by_id.get(id_by_name.get(f.name)))
                    for f in schema.fields
                )
            else:
                key = tuple((f.name, f.name) for f in schema.fields)
            groups.setdefault(key, []).append(e)
        # normalize file:/x, file:///x, or bare /x to the same absolute
        # form, then strip the table root -> manifest-relative path
        rel = F.replace(
            F.regexp_replace(
                F.col("_metadata.file_path"), F.lit("^file:/+"), F.lit("/")
            ),
            F.lit(self.root + "/"),
            F.lit(""),
        )
        parts = []
        for key, es in groups.items():
            read_schema = StructType([
                StructField(written, schema[cur].dataType, True)
                for cur, written in key if written is not None
            ])
            if not read_schema.fields:
                raise ValueError(
                    "no current column exists in data file(s) "
                    f"{[e['path'] for e in es[:3]]} — cannot project"
                )
            paths = [os.path.join(self.root, e["path"]) for e in es]
            part = (
                self.spark.read.option("basePath", self.data_dir)
                .schema(read_schema)
                .parquet(*paths)
            )
            sel = [
                (F.col(written).alias(cur) if written is not None
                 else F.lit(None).cast(schema[cur].dataType).alias(cur))
                for cur, written in key
            ]
            if want_pos:
                sel += [rel.alias("_del_path"),
                        F.col("_metadata.row_index").alias("_del_pos")]
            parts.append(part.select(*sel))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionAll(p)
        cols = [f.name for f in schema.fields]
        if live:
            dpaths = [os.path.join(self.root, d["path"]) for d in live]
            dels = (
                self.spark.read.schema("path string, pos long")
                .parquet(*dpaths)
            )
            df = df.join(
                dels,
                (df["_del_path"] == dels["path"])
                & (df["_del_pos"] == dels["pos"]),
                "left_anti",
            )
        return df.select(*(cols + pos_cols if with_pos else cols))

    def read_incremental(self, from_snapshot: int, to_snapshot: int) -> DataFrame:
        """Rows ADDED between two snapshots (exclusive/inclusive): the
        files present in ``to``'s manifest but not ``from``'s — Iceberg's
        incremental append scan, the shape a daily training-data refresh
        consumes (process only what arrived, never rescan the table).

        Valid only over append-only history: if ``to`` dropped any of
        ``from``'s files (overwrite/merge/replace happened between),
        added-files-only would misrepresent the delta, so this raises.
        """
        meta = self._meta()
        from_snap = self._snapshot(meta, from_snapshot)
        to_snap = self._snapshot(meta, to_snapshot)
        if to_snap is None:
            raise ValueError("to_snapshot must be a real snapshot")
        from_files = (
            {e["path"] for e in self._manifest(from_snap["manifest"])["files"]}
            if from_snap else set()
        )
        to_entries = self._manifest(to_snap["manifest"])["files"]
        to_files = {e["path"] for e in to_entries}
        if from_files - to_files:
            raise ValueError(
                "non-append history between snapshots "
                f"{from_snapshot}..{to_snapshot}: "
                f"{len(from_files - to_files)} file(s) were replaced/removed; "
                "incremental append scan would misrepresent the delta"
            )
        added = [e for e in to_entries if e["path"] not in from_files]
        return self._read_files(
            added, StructType.fromJson(to_snap["schema"]),
            self._deletes(to_snap), fields=to_snap.get("fields"),
        )

    def read_changes(
        self, from_snapshot: int, to_snapshot: int
    ) -> tuple[DataFrame, DataFrame]:
        """Coarse changelog scan between two snapshots: ``(added,
        removed)`` row DataFrames from the file-level manifest diff.

        Unlike :meth:`read_incremental` this accepts non-append history
        (overwrite / merge / rewrite): a rewritten data file shows up
        with ALL its rows on both sides, which is the conservative
        superset an incremental maintenance job needs — recompute every
        key that MIGHT have changed, never miss one. This is what an
        Iceberg consumer gets from a changelog scan when no row-level
        delete vectors exist. The ``removed`` side reads files dropped
        from the ``from`` manifest, so it is only available while those
        snapshots are retained (i.e. before ``expire_snapshots`` prunes
        them) — same retention contract as Iceberg's changelog."""
        meta = self._meta()
        from_snap = self._snapshot(meta, from_snapshot)
        to_snap = self._snapshot(meta, to_snapshot)
        if to_snap is None:
            raise ValueError("to_snapshot must be a real snapshot")
        from_entries = (
            self._manifest(from_snap["manifest"])["files"] if from_snap else []
        )
        to_entries = self._manifest(to_snap["manifest"])["files"]
        from_paths = {e["path"] for e in from_entries}
        to_paths = {e["path"] for e in to_entries}
        added = [e for e in to_entries if e["path"] not in from_paths]
        removed = [e for e in from_entries if e["path"] not in to_paths]
        from_schema = StructType.fromJson(
            from_snap["schema"] if from_snap else to_snap["schema"]
        )
        return (
            self._read_files(
                added, StructType.fromJson(to_snap["schema"]),
                self._deletes(to_snap), fields=to_snap.get("fields"),
            ),
            self._read_files(
                removed, from_schema, self._deletes(from_snap),
                fields=(from_snap or to_snap).get("fields"),
            ),
        )

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """The full table at a snapshot (time travel when pinned)."""
        meta = self._meta()
        snap = self._snapshot(meta, snapshot_id)
        schema = (StructType.fromJson(snap["schema"]) if snap
                  else StructType.fromJson(meta["schema"]))
        return self._read_files(
            self.planned_files((), snapshot_id), schema, self._deletes(snap),
            fields=(snap.get("fields") if snap else meta.get("fields")),
        )

    def scan(
        self,
        predicates: tuple = (),
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Pruned scan: manifest file-skipping + residual Spark filter."""
        snap = self._snapshot(self._meta(), snapshot_id)
        df = self._read_files(
            self.planned_files(predicates, snapshot_id),
            (StructType.fromJson(snap["schema"]) if snap
             else self.current_schema()),
            self._deletes(snap),
            fields=(snap.get("fields") if snap
                    else self._meta().get("fields")),
        )
        for col, op, val in predicates:
            df = df.filter(_predicate_column(col, op, val))
        return df
