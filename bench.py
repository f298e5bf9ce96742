#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric (BASELINE.json): triples/sec for the end-to-end
extract -> link -> canonicalize -> materialize pipeline at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS].

Usage:
    python bench.py               # one JSON line for the driver
    python bench.py --scaling     # N vs 4N cores on the same enlarged
                                  # input (evidences the two-cluster-size
                                  # rule in this single-machine sandbox)

Scaling methodology (see BENCH.md): the same job runs warm (JIT +
Python workers primed, best of SPARK_GRAFT_BENCH_REPS) at both
parallelism levels on an input enlarged SPARK_GRAFT_BENCH_MULT x
(deterministic conv_id-suffixed replication — both levels see the
identical input). A pure-JVM compute microbenchmark (md5 fold) is
reported alongside as the machine's parallel-scaling ceiling: this
sandbox is a single shared VM, so wall-clock scaling saturates well
below a real multi-executor cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd


def _build(master: str, shuffle_partitions: int):
    from prec_spark.session import build_session

    return build_session(
        app_name=f"prec-spark-bench-{master}",
        master=master,
        shuffle_partitions=shuffle_partitions,
        # tmpfs shuffle dir: this sandbox's /tmp disk serializes shuffle
        # writes across threads (measured: a 20M-row groupBy runs 0.56x
        # SLOWER at 32 cores than 8 on disk, 1.07x on tmpfs). A real
        # cluster has per-node local SSDs; tmpfs stands in for them.
        # 12g driver: the per-query loop holds the session-scoped shared
        # input caches (transcripts, PG, fingerprints, vectors) for the
        # whole 29-query run — size the heap to that working set (the
        # round-4 lesson) or storage eviction + GC churn taxes the tail
        # queries at 32 threads.
        extra_conf={
            "spark.local.dir": "/dev/shm/prec-spark-bench",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "12g"
            ),
        },
    )


def _kg(spark, sf_dir: str, mult: int, cores: int):
    from pyspark.sql import functions as F

    from prec_spark.flagship import flagship_triples
    from prec_spark.text.mentions import entity_triples
    from prec_spark.transcripts import transcripts_df

    t = transcripts_df(spark, sf_dir)
    if mult > 1:
        t = (
            t.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
            .withColumn(
                "conv_id",
                F.concat(F.col("rep").cast("string"), F.lit("-"), F.col("conv_id")),
            )
            .drop("rep")
        )
    # hash-partition the cache BY conv_id: the NEXT-edge window then
    # reuses the cached partitioning (no exchange inside the timed
    # job). Conversations are uniform-sized, so the distribution is
    # even without salting.
    t = t.repartition(4 * cores, "conv_id").cache()
    t.count()
    return flagship_triples(spark, sf_dir, transcripts=t).unionByName(
        entity_triples(spark, sf_dir, t)
    )


#: CPU-share weights of the timed kg job's two dominant workload
#: classes, measured via /proc/stat around each component at 32 cores,
#: mult=48 (round 3): PRSC/string materialization 945 of 1608 CPU-s,
#: arrow-python entity extraction 551, PG projection + misc ~110
#: (folded into the materialize class — same traffic profile).
CEILING_WEIGHTS = {"materialize": 0.64, "pyarrow": 0.36}


def _ceiling_probes(cores: int) -> dict[str, float]:
    """Machine parallel-scaling ceiling probes, one per workload class.

    Each timing builds a FRESH query (collect() on a reused Dataset
    replays its already-materialized AQE stages and measures nothing —
    the round-1 probe had that bug). Classes:
    * alu    — md5 fold: pure compute, the optimistic ceiling
    * string — triple-shaped concat + regexp over generated strings
               (round 2's comparator; generates its input from range,
               so it carries none of the pipeline's memory traffic)
    * materialize — cached scan -> 6-way struct explode -> ~100 B
               concat strings, the measured shape of the PRSC
               materialization (6.4 triples/turn, 87.5 B mean triple
               at sf0.1); sized so the warm wall is seconds, not
               scheduling noise. This host saturates its memory
               system here (~20 GB/s): efficiency 0.52 at 8->32 with
               ZERO shuffles — a hardware ceiling, not a plan cost.
    * pyarrow — pandas-UDF str op over a cached column: the entity
               path's class (Arrow transfer + vectorized pandas)
    * shuffle — groupBy over 20M strings: local-mode shuffles are
               known to ANTI-scale on this host (measured 0.56x at
               32 vs 8 cores on disk); reported for transparency
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark = _build(f"local[{cores}]", 2 * cores)

    mat_src = (
        spark.range(32_000_000, numPartitions=4 * cores)
        .select(
            (F.col("id") % 997).cast("string").alias("conv"),
            F.repeat(F.md5(F.col("id").cast("string")), 3).alias("text"),
            F.col("id").cast("string").alias("idx"),
        )
        .cache()
    )
    py_src = (
        spark.range(8_000_000, numPartitions=4 * cores)
        .select(F.repeat(F.md5(F.col("id").cast("string")), 8).alias("text"))
        .cache()
    )

    @pandas_udf("int")
    def _hits(s: pd.Series) -> pd.Series:
        return s.str.count("[ab]{2}").astype("int32")

    def make(probe):
        if probe == "materialize":
            structs = [
                F.struct(
                    F.concat(
                        F.lit("<http://www.example.org/vocab/turn/"), F.col("conv"),
                        F.lit("_"), F.col("idx"), F.lit(">"),
                    ).alias("s"),
                    F.lit(f"<http://www.example.org/vocab/p{i}>").alias("p"),
                    F.concat(
                        F.lit('"'), F.col("text"), F.lit("-"), F.col("idx"),
                        F.lit(f'x{i}"'),
                    ).alias("o"),
                )
                for i in range(6)
            ]
            return mat_src.select(F.explode(F.array(*structs)).alias("t")).select(
                "t.*"
            ).groupBy().count()
        if probe == "pyarrow":
            return py_src.select(F.sum(_hits(F.col("text"))))
        df = spark.range(20_000_000, numPartitions=cores * 8)
        if probe == "alu":
            return df.select(
                F.avg(F.length(F.md5(F.concat(F.lit("x"), F.col("id").cast("string")))))
            )
        if probe == "string":
            s = F.concat(
                F.lit("<http://www.example.org/vocab/node/property/text/Turn-assistant/"),
                F.col("id").cast("string"), F.lit("> told <"),
                (F.col("id") % 97).cast("string"), F.lit("> about part "),
                F.md5(F.col("id").cast("string")),
            )
            return df.select(F.avg(F.length(F.regexp_replace(s, "a", "b"))))
        s = F.concat(F.lit("p-"), F.col("id").cast("string"), F.lit("-"),
                     F.md5(F.col("id").cast("string")))
        return df.select(s.alias("s")).groupBy(F.crc32(F.col("s")) % 4096).count()

    mat_src.count()
    py_src.count()
    out = {}
    for probe in ("alu", "string", "materialize", "pyarrow", "shuffle"):
        make(probe).collect()  # warm (JIT)
        best = 1e18
        for _ in range(2):
            t0 = time.time()
            make(probe).collect()
            best = min(best, time.time() - t0)
        out[probe] = best
    spark.stop()
    return out


def _proc_stat_busy() -> float:
    """Whole-machine busy CPU seconds (user+nice+system+irq+softirq+steal)
    from /proc/stat; deltas around a timed run give the run's true CPU
    cost regardless of how many JVMs did the work."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    user, nice, system, _idle, _iowait, irq, softirq, steal = vals
    hz = os.sysconf("SC_CLK_TCK")
    return (user + nice + system + irq + softirq + steal) / hz


def scaling_run(master: str, cores: int, sf_dir: str, mult: int, reps: int):
    # AQE off for the warm fixed-size loop: re-running an identical job
    # gains nothing from runtime re-planning, and AQE's per-stage
    # materialization adds ~10% wall at 32 cores (measured 52.7 ->
    # 47.7 s at mult=48). The driver bench and production keep AQE on.
    spark = _build(master, 2 * cores)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        kg = _kg(spark, sf_dir, mult, cores)
        n = kg.count()  # warm (JIT, python workers)
        best = 1e18
        best_cpu = 1e18
        for _ in range(reps):
            c0 = _proc_stat_busy()
            t0 = time.time()
            n = kg.count()
            wall = time.time() - t0
            if wall < best:
                best = wall
                best_cpu = _proc_stat_busy() - c0
        return n, best, best_cpu
    finally:
        spark.stop()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    if "--scaling" in sys.argv:
        mult = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "6"))
        reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
        if "--cluster" in sys.argv:
            # SEPARATE-JVM scaling: local-cluster[n,c,m] launches real
            # standalone Worker/executor processes — own heaps, GC, and
            # shuffle writers — so N vs 4N is EXECUTORS (the north
            # rule's framing), not threads sharing one JVM. Per-executor
            # cores stay fixed; only the executor count scales.
            cpe = int(os.environ.get("SPARK_GRAFT_BENCH_CORES_PER_EXEC", "4"))
            # 12 GiB/executor: at mult=48 the per-executor working set
            # overruns a 6 GiB heap at the 4N level and GC churn masks
            # the true scaling (measured 51.9 s vs 30.6 s at 8
            # executors, identical work — see BENCH.md); size heaps to
            # the working set before reading scaling numbers
            mem_mb = int(os.environ.get("SPARK_GRAFT_BENCH_EXEC_MEM_MB", "12288"))
            hi_exec = max(1, cpus // cpe)
            lo_exec = max(1, hi_exec // 4)
            os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
            # standalone Workers ignore spark.local.dir (the cluster
            # manager overrides it); the env var routes executor shuffle
            # files to tmpfs like the local-mode conf does
            os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/prec-spark-bench")
            # executor counts per level: default N and 4N; an explicit
            # list (e.g. "2,4,8") draws the full scaling curve
            counts = [
                int(c)
                for c in os.environ.get(
                    "SPARK_GRAFT_BENCH_CLUSTER_EXECS", f"{lo_exec},{hi_exec}"
                ).split(",")
            ]
            levels = [
                (
                    "N" if n == counts[0] else f"{n // counts[0]}N",
                    f"local-cluster[{n},{cpe},{mem_mb}]",
                    n * cpe,
                )
                for n in counts
            ]
        else:
            lo = max(2, cpus // 4)
            levels = [
                ("N", f"local[{lo}]", lo),
                ("4N", f"local[{cpus}]", cpus),
            ]
        results = {}
        for label, master, n_cores in levels:
            triples, wall, cpu_sec = scaling_run(master, n_cores, sf_dir, mult, reps)
            results[label] = {
                "cores": n_cores,
                "master": master,
                "triples": triples,
                "wall_sec": round(wall, 2),
                "cpu_sec": round(cpu_sec, 1),
                "triples_per_sec": round(triples / wall, 1),
            }
        eff = (
            results["4N"]["triples_per_sec"] / results["N"]["triples_per_sec"]
        ) / (results["4N"]["cores"] / results["N"]["cores"])
        if "--cluster" in sys.argv:
            # separate-JVM mode reports RAW efficiency plus the per-level
            # CPU cost of the identical work (the cpu_sec ratio shows
            # whether a sub-1.0 raw number is per-core CPU inflation —
            # memory-system contention — or idle cores)
            cpu_inflation = (
                results["4N"]["cpu_sec"] / results["N"]["cpu_sec"]
                if results["N"]["cpu_sec"]
                else None
            )
            print(
                json.dumps(
                    {
                        "mode": "local-cluster (separate executor JVMs)",
                        "cores_per_executor": int(
                            os.environ.get("SPARK_GRAFT_BENCH_CORES_PER_EXEC", "4")
                        ),
                        "scaling": results,
                        "efficiency": round(eff, 3),
                        "cpu_inflation_4N_vs_N": round(cpu_inflation, 3)
                        if cpu_inflation
                        else None,
                        "input_multiplier": mult,
                        "sf": sf,
                    }
                )
            )
            return
        probes_lo, probes_hi = _ceiling_probes(lo), _ceiling_probes(cpus)
        ratio = cpus / lo
        ceilings = {
            k: round((probes_lo[k] / probes_hi[k]) / ratio, 3) for k in probes_lo
        }
        # the representative ceiling blends the two classes the timed
        # job actually spends CPU in (weights = measured /proc/stat CPU
        # shares, see CEILING_WEIGHTS + BENCH.md): harmonic mean, since
        # the job's wall is the sum of per-class walls
        ceiling = 1.0 / sum(
            w / max(ceilings[k], 1e-9) for k, w in CEILING_WEIGHTS.items()
        )
        print(
            json.dumps(
                {
                    "scaling": results,
                    "efficiency": round(eff, 3),
                    "machine_parallel_ceilings": ceilings,
                    "ceiling_weights": CEILING_WEIGHTS,
                    "machine_parallel_ceiling": round(ceiling, 3),
                    "efficiency_vs_ceiling": round(eff / ceiling, 3) if ceiling else None,
                    "input_multiplier": mult,
                    "sf": sf,
                }
            )
        )
        return

    spark = _build(f"local[{cpus}]", 2 * cpus)
    from prec_spark.entry_queries import queries

    q = queries()
    headline = [
        "transcripts", "pg_nodes", "pg_edges", "prsc_transcript_triples",
        "mentions", "entity_links", "canonical_entities", "kg_triples",
        "prec0_triples", "dedup_minhash", "ann_bruteforce", "text_stats",
    ]
    # correctness-gate-only queries excluded from the per-round bench:
    # the roundtrips re-run PREC-0 reversion / PREC-C application over
    # the full 9M-quad expansion at sf0.1 — they are verified at sf0.01
    # by the driver's oracle gate, and benching them would double the
    # round wall without measuring a new hot path.
    # kg_stream_triples is the stream==batch equivalence gate: it runs
    # the SAME triple families through Structured Streaming — timing it
    # here would measure micro-batch orchestration, not a new hot path.
    skip = {"prsc_roundtrip", "prec0_roundtrip", "precc_triples", "kg_stream_triples"}
    # cold = first run in this session (JIT + codegen + python-worker
    # spinup included); warm_best = best of WARM_REPS further runs —
    # the steady-state number comparable across rounds on this +-40%
    # noisy shared host (the round-2 cold-single-shot headline looked
    # like a 1.45x regression that controlled warm runs contradicted).
    warm_reps = int(os.environ.get("SPARK_GRAFT_BENCH_WARM_REPS", "2"))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    n_triples = 0
    for name in headline + [k for k in q if k not in headline and k not in skip]:
        fn = q.get(name)
        if fn is None:
            continue
        t0 = time.time()
        cnt = fn(spark, sf_dir).count()
        cold[name] = round(time.time() - t0, 3)
        best = cold[name]
        for _ in range(warm_reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        if name == "kg_triples":
            n_triples = cnt
    kg_sec = timings.get("kg_triples", 0.0) or 1e-9
    print(
        json.dumps(
            {
                "metric": "kg_construct end-to-end wall (extract->link->canonicalize->materialize)",
                "value": round(kg_sec, 3),
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "warm_reps": warm_reps,
                "sf": sf,
                "triples": n_triples,
                "triples_per_sec": round(n_triples / kg_sec, 1),
                "cores": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
