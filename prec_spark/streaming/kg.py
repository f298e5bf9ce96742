"""Incremental KG construction over a transcript STREAM.

The batch flagship (transcripts -> PG -> PRSC triples + entity triples)
re-expressed for Structured Streaming, per the north-star requirement
that the engine ingest transcripts continuously:

* every per-turn triple family is STATELESS (typing, text/tool
  properties, IN/USES edges, conversation/tool vocabulary, mention and
  entity triples) — plain column expressions + the Arrow mention UDF
  over `readStream`, appended as they arrive;
* NEXT edges are the one CROSS-ROW family (turn i -> i+1). They run as
  a custom stateful operator (`applyInPandasWithState` keyed by
  conv_id): the state is the set of seen turn indexes per conversation
  (bounded by conversation length); a batch emits exactly the
  consecutive pairs that involve a newly-seen index, so pairs split
  across micro-batches are emitted exactly once.

Conversation/tool vocabulary triples repeat per turn (a streaming
append sink cannot do a global distinct without complete mode); the
consumer dedups on read — set semantics over triples make the dedup a
MERGE/distinct at the sink, the standard lakehouse pattern.

Equivalence oracle: distinct streamed triples == the batch
flagship ∪ entity triples on the same input (tests/test_streaming_kg).
"""

from __future__ import annotations

import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..flagship import EX
from ..pg.projection import lit_term_col
from ..text.mentions import mentions_expr

TRANSCRIPTS_SCHEMA = (
    "conv_id STRING, turn_idx INT, role STRING, text STRING, "
    "tool STRING, ts TIMESTAMP"
)

A = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

_NEXT_OUT_SCHEMA = "conv_id STRING, src_idx INT, dst_idx INT"
_NEXT_STATE_SCHEMA = "seen ARRAY<INT>"

#: late-data horizon; per-conversation NEXT state is evicted once the
#: event-time watermark passes the conversation's last turn by this
#: much. Eviction trade-off: a turn arriving with a FRESH (beyond-
#: watermark) event time after its conversation's state was evicted
#: rebuilds empty state, so the bridging NEXT pair across an intra-
#: conversation gap wider than this horizon is silently never emitted
#: — size the horizon to cover the data's max intra-conversation gap
#: (the 200-day gate horizon does exactly that for the transcripts
#: corpus, whose widest gap is ~120 days).
WATERMARK = "2 hours"
_WATERMARK_MS = 2 * 3600 * 1000


def _turn_bn():
    return F.concat(
        F.lit("_:turn_"), F.col("conv_id"), F.lit("_"), F.col("turn_idx").cast("string")
    )


def _conv_bn():
    return F.concat(F.lit("_:conv_"), F.col("conv_id"))


def _tool_bn():
    return F.concat(F.lit("_:tool_"), F.col("tool"))


def stateless_triples(t: DataFrame) -> DataFrame:
    """All per-turn-derivable triple families; works identically on a
    static or a streaming DataFrame (no joins, no windows, no state)."""
    ex = lambda n: F.lit(f"<{EX}{n}>")  # noqa: E731
    turn, conv, tool = _turn_bn(), _conv_bn(), _tool_bn()
    has_tool = F.col("tool").isNotNull()

    def tri(cond, s, p, o):
        d = t.filter(cond) if cond is not None else t
        return d.select(s.alias("s"), p.alias("p"), o.alias("o"))

    parts = [
        # turn typing (PRSC node rules)
        tri(F.col("role") == "user", turn, F.lit(A), ex("UserTurn")),
        tri(F.col("role") != "user", turn, F.lit(A), ex("AssistantTurn")),
        tri(has_tool, turn, F.lit(A), ex("ToolCallTurn")),
        # properties
        tri(None, turn, ex("text"), lit_term_col(F.col("text"))),
        tri(has_tool, turn, ex("toolName"), lit_term_col(F.col("tool"))),
        # conversation / tool vocabulary (repeats per turn; sink dedups)
        tri(None, conv, F.lit(A), ex("Conversation")),
        tri(None, conv, ex("convId"), lit_term_col(F.col("conv_id"))),
        tri(has_tool, tool, F.lit(A), ex("Tool")),
        tri(has_tool, tool, ex("name"), lit_term_col(F.col("tool"))),
        # IN / USES edges (edge-unique templates: src -> dst directly)
        tri(None, turn, ex("inConversation"), conv),
        tri(has_tool, turn, ex("usesTool"), tool),
    ]
    # mention + entity triples (Arrow UDF, stateless)
    m = t.select(
        "conv_id",
        "turn_idx",
        F.explode(F.array_distinct(mentions_expr())).alias(
            "mention"
        ),
    )
    ent = F.concat(F.lit("_:entity_"), F.col("mention"))
    parts += [
        m.select(_turn_bn().alias("s"), ex("mentions").alias("p"), ent.alias("o")),
        m.select(ent.alias("s"), F.lit(A).alias("p"), ex("Entity").alias("o")),
        m.select(
            ent.alias("s"),
            ex("name").alias("p"),
            F.concat(F.lit('"'), F.col("mention"), F.lit('"')).alias("o"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype="object"),
            "src_idx": pd.Series([], dtype="int64"),
            "dst_idx": pd.Series([], dtype="int64"),
        }
    )


def _make_next_edges_group(horizon_ms: int):
    """Build the stateful NEXT-pair function for a given late horizon.

    Emit NEXT pairs exactly once across micro-batches: a pair (i, i+1)
    is emitted when it involves an index not seen before.

    State lifecycle: after each update the group's event-time timeout
    is set to (last seen turn ts + the watermark horizon); once the
    watermark passes it, the state is REMOVED — emitted pairs are
    already out, and later rows for the conversation would be dropped
    as late anyway, so a continuous deployment holds state only for
    conversations still inside the late-data window (round 2 used
    NoTimeout: state accreted forever)."""

    def _next_edges_group(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            yield _empty_pairs()
            return
        prev: set[int] = set(state.get[0]) if state.exists else set()
        new: set[int] = set()
        max_ts = None
        for pdf in pdfs:
            new.update(int(x) for x in pdf["turn_idx"].tolist())
            ts = pdf["ts"].max()
            if not pd.isna(ts) and (max_ts is None or ts > max_ts):
                max_ts = ts
        new -= prev
        all_seen = sorted(prev | new)
        rows = [
            (conv_id, i, j)
            for i, j in zip(all_seen, all_seen[1:])
            if j == i + 1 and (i in new or j in new)
        ]
        state.update((list(all_seen),))
        horizon = (
            int(max_ts.value // 1_000_000) if max_ts is not None
            else state.getCurrentWatermarkMs()
        ) + horizon_ms
        # the timeout must sit beyond the current watermark; rows
        # at/before the watermark were almost-late, so their horizon
        # could otherwise already have passed
        state.setTimeoutTimestamp(max(horizon, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(rows, columns=["conv_id", "src_idx", "dst_idx"])

    return _next_edges_group


def next_edge_triples_stream(
    t: DataFrame, watermark: str = WATERMARK, horizon_ms: int = _WATERMARK_MS
) -> DataFrame:
    """`watermark`/`horizon_ms` set the late-data window; it must cover
    the data's intra-conversation event-time gaps (a backfill over
    months-spanning conversations passes a wide horizon; the 2 h
    default is the continuous-deployment setting)."""
    pairs = (
        t.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_next_edges_group(horizon_ms),
            outputStructType=_NEXT_OUT_SCHEMA,
            stateStructType=_NEXT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    bn = lambda c: F.concat(  # noqa: E731
        F.lit("_:turn_"), F.col("conv_id"), F.lit("_"), F.col(c).cast("string")
    )
    return pairs.select(
        bn("src_idx").alias("s"),
        F.lit(f"<{EX}next>").alias("p"),
        bn("dst_idx").alias("o"),
    )


def kg_stream(
    spark: SparkSession, src_dir: str, name: str = "kg_stream_triples",
    max_files_per_trigger: int | None = 1,
    watermark: str = WATERMARK, horizon_ms: int = _WATERMARK_MS,
) -> DataFrame:
    """Stream transcript parquet files from `src_dir` into triples
    (memory sink for tests; a real deployment writes parquet/Iceberg
    with a MERGE-on-read dedup)."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)
    triples = stateless_triples(stream).unionByName(
        next_edge_triples_stream(stream, watermark, horizon_ms)
    )
    q = (
        triples.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"kg_stream '{name}' did not finish its availableNow run within "
            "300s — the memory table would be partial"
        )
    return spark.table(name)


def kg_stream_merge_to_parquet(
    spark: SparkSession, src_dir: str, out_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    watermark: str = WATERMARK, horizon_ms: int = _WATERMARK_MS,
) -> DataFrame:
    """Lakehouse sink: stream transcripts into a parquet triple table
    with a foreachBatch MERGE (insert-if-absent on the (s, p, o) key).

    Each micro-batch is deduped internally, anti-joined against the
    current table state, and only the genuinely new triples appended —
    so the table NEVER holds duplicate triples and replayed batches
    (restart from the checkpoint) are idempotent. This is the working
    form of the "consumer dedups on read" note: with this sink the
    dedup happens on WRITE, once per batch, instead of on every read.

    Scale note: the anti-join reads the current table per batch; on a
    real lakehouse the same statement is Delta/Iceberg
    `MERGE INTO kg USING batch ON same (s,p,o) WHEN NOT MATCHED THEN
    INSERT`, where the table format's file statistics + partition
    pruning bound the read instead of a full scan. The merge shape —
    batch dedup, key anti-join, append — is identical.
    """
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)
    triples = stateless_triples(stream).unionByName(
        next_edge_triples_stream(stream, watermark, horizon_ms)
    )

    def _merge(batch_df: DataFrame, _epoch_id: int) -> None:
        sess = batch_df.sparkSession
        batch = batch_df.dropDuplicates(["s", "p", "o"])
        # Detect existing table state through Spark (works for any
        # filesystem the session can read — hdfs://, s3a://, file:),
        # not a driver-local os.listdir, so checkpoint-replayed batches
        # stay idempotent on non-local table paths too.
        try:
            existing = sess.read.parquet(out_dir)
            batch = batch.join(existing, ["s", "p", "o"], "left_anti")
        except AnalysisException:
            pass  # no data yet (path absent or schema-less): first write
        # materialize the anti-join BEFORE appending to the same path
        # (a lazy plan would race its own output files)
        batch.localCheckpoint().write.mode("append").parquet(out_dir)

    writer = triples.writeStream.foreachBatch(_merge).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "kg_stream_merge_to_parquet did not finish its availableNow "
            "run within 300s — the parquet table would be partial"
        )
    return spark.read.parquet(out_dir)


def stage_stream_source(
    spark: SparkSession, sf_dir: str, src: str,
    transcripts: DataFrame | None = None,
) -> None:
    """Materialize the transcripts as a 3-file parquet stream source
    split by EVENT TIME (fixed cutoffs inside the lineitem shipdate
    range) — a log replay arrives in rough event order; conversations
    near a cutoff straddle batches, exercising the stateful
    cross-batch NEXT operator."""
    import glob
    import os
    import shutil

    from ..transcripts import transcripts_df

    t = transcripts if transcripts is not None else transcripts_df(spark, sf_dir)
    c1, c2 = F.lit("1994-07-01").cast("timestamp_ntz"), F.lit(
        "1996-07-01"
    ).cast("timestamp_ntz")
    for i, cond in enumerate(
        (F.col("ts") < c1, (F.col("ts") >= c1) & (F.col("ts") < c2),
         F.col("ts") >= c2)
    ):
        t.filter(cond).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
    for f in glob.glob(f"{src}/batch*.parquet"):
        os.remove(f)
    for i in range(3):
        (part,) = glob.glob(f"{src}/f{i}/part-*.parquet")
        shutil.move(part, f"{src}/batch{i}.parquet")
        shutil.rmtree(f"{src}/f{i}")


def kg_stream_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated streaming entry: materialize the transcripts as a
    3-file parquet stream source (conversations SPAN the file
    boundaries, so the stateful cross-batch NEXT operator is genuinely
    exercised), run the incremental KG stream over it, and return the
    distinct streamed triple set — which must hash-match the BATCH
    flagship ∪ entity oracle (the stream ≡ batch contract, checked by
    the driver's DuckDB gate, not just by pytest)."""
    import hashlib
    import uuid

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    src = f"/tmp/prec-spark-stream-src-{tag}"
    stage_stream_source(spark, sf_dir, src)

    # late horizon 200 days > the max intra-conversation event-time
    # gap (lineitem ship dates sit within ~120 days of the order
    # date), so no turn is ever late and no conversation is evicted
    # before its last turn — with the 2 h deployment default the
    # watermark would (correctly for that setting) drop months-late
    # turns and the stream would NOT equal the batch
    name = f"kg_stream_gate_{uuid.uuid4().hex[:8]}"
    streamed = kg_stream(
        spark, src, name=name,
        watermark="200 days", horizon_ms=200 * 24 * 3600 * 1000,
    )
    return streamed.distinct()
