"""Session-scoped shared input caches.

Query entry points take (spark, sf_dir) and are invoked repeatedly in
one session (driver oracle gate: 33 queries; bench: cold + N warm reps
each). A bare ``transcripts_df(...).cache()`` inside the entry point
creates a FRESH cached DataFrame per call that nothing ever
unpersists: 3 bench reps of the PREC-0 query alone leaked 9 cached
inputs, and the accumulated storage (MEMORY_AND_DISK spills land in
the tmpfs spark.local.dir — i.e. back in RAM) degraded later queries
by 3-4x (round-5 profiling: prec0_triples rep 17s/12s/43s).

``shared_cached_df`` memoizes the cached DataFrame per (application,
key): every call reuses the ONE cache entry, exactly like a real
long-lived session that caches its inputs once. If the cache was
dropped externally (``spark.catalog.clearCache()`` between oracle-gate
queries), the entry is re-marked for caching on next use; if the
session changed, the registry resets.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_REG: dict[tuple[str, str], DataFrame] = {}


def shared_cached_df(
    spark: SparkSession, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return ``build()`` cached, memoized per (session, key)."""
    app = spark.sparkContext.applicationId
    k = (app, key)
    df = _REG.get(k)
    if df is None:
        if any(a != app for (a, _) in _REG):
            _REG.clear()  # previous session's entries are dead plans
        df = build().cache()
        _REG[k] = df
    elif not df.storageLevel.useMemory:
        # spark.catalog.clearCache() dropped it (oracle-gate hygiene):
        # re-mark so the next action re-populates the single entry
        df = df.cache()
        _REG[k] = df
    return df


_REG_CK: dict[tuple[str, str], DataFrame] = {}


def release_shared() -> None:
    """Drop the shared-frame memos so their storage can be reclaimed.

    For gate-style harnesses that run MANY queries through one
    small-heap session and free storage between them: ``clearCache()``
    drops the columnar-cached frames (shared_cached_df re-marks them on
    next use), but localCheckpoint blocks are pinned by the _REG_CK
    references and would accumulate for the whole session.  Dropping
    the registries makes those blocks unreferenced, so the caller's
    driver GC releases them via the ContextCleaner; the next consumer
    rebuilds through the memo-miss path — the same
    drop-and-rebuild-on-demand lifecycle the cached frames already
    have.  The bench and production sessions never call this: their
    shared frames stay resident by design."""
    _REG.clear()
    _REG_CK.clear()


def shared_checkpointed_df(
    spark: SparkSession, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return ``build().localCheckpoint()``, memoized per (session, key).

    The checkpoint sibling of ``shared_cached_df``, for shared frames
    that downstream loops SCAN repeatedly WITHOUT relying on a cached
    partitioning contract: checkpoint blocks read back as rows, with no
    per-scan columnar decode (measured 25-30% on the walk corpora at
    sf0.1), and match the eager materialization the walk operators
    already use for their own intermediates.  NOT for the
    hash-partitioned round frames (iund/iund_sl/edsl/wund_sl, the
    s-partitioned KG cache): under AQE a localCheckpoint surfaces as a
    LogicalRDD with UNKNOWN partitioning, so the exchange-elision those
    frames were cached for would be lost and every consumer would
    re-shuffle — verified by plan inspection, see OPTIMIZATION_r06.md.
    Blocks live at MEMORY_AND_DISK until the session (or the memoized
    reference) goes away; ``spark.catalog.clearCache()`` does not drop
    them, which is exactly right for a session-scoped shared input."""
    app = spark.sparkContext.applicationId
    k = (app, key)
    df = _REG_CK.get(k)
    if df is None:
        if any(a != app for (a, _) in _REG_CK):
            _REG_CK.clear()  # previous session's entries are dead plans
        df = build().localCheckpoint()
        _REG_CK[k] = df
    return df


def cached_transcripts_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transcripts PG input cached once per session, augmented with
    ``next_idx`` (the NEXT-edge lead) computed once at cache build so
    the PG edge projection needs no per-call window.

    ONLY valid for the full, unfiltered table: a caller that filters
    turns (kg_asof) must NOT reuse the precomputed lead — consecutive
    surviving turns differ — so such callers pass the plain frame and
    pg_edges falls back to its window."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .transcripts import transcripts_df

    def build() -> DataFrame:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        return transcripts_df(spark, sf_dir).withColumn(
            "next_idx", F.lead("turn_idx").over(w)
        )

    return shared_cached_df(spark, f"transcripts:{sf_dir}", build)


def cached_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transcripts PG input, cached once per session (driver-gated
    schema — the next_idx helper column is projected away)."""
    return cached_transcripts_aug(spark, sf_dir).drop("next_idx")
