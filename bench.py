#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric (BASELINE.json): triples/sec for the end-to-end
extract -> link -> canonicalize -> materialize pipeline at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS].

Usage:
    python bench.py               # one JSON line for the driver
    python bench.py --scaling     # run at two parallelism levels and
                                  # report throughput + scaling efficiency
                                  # (evidences the N vs 4N executor rule
                                  # in this single-machine sandbox)
"""

from __future__ import annotations

import json
import os
import sys
import time


def _build(master: str, shuffle_partitions: int):
    from prec_spark.session import build_session

    return build_session(
        app_name=f"prec-spark-bench-{master}",
        master=master,
        shuffle_partitions=shuffle_partitions,
    )


def run_queries(spark, sf_dir: str) -> tuple[dict, int]:
    """Time each headline query; returns ({name: sec}, kg_triple_count)."""
    from prec_spark.entry_queries import queries

    q = queries()
    headline = [
        "transcripts",
        "pg_nodes",
        "pg_edges",
        "prsc_transcript_triples",
        "mentions",
        "entity_links",
        "canonical_entities",
        "kg_triples",
        "prec0_triples",
    ]
    extra = [k for k in q if k not in headline]
    timings: dict[str, float] = {}
    n_triples = 0
    for name in headline + extra:
        fn = q.get(name)
        if fn is None:
            continue
        t0 = time.time()
        cnt = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        if name == "kg_triples":
            n_triples = cnt
    return timings, n_triples


def one_run(master: str, cpus: int, sf_dir: str):
    spark = _build(master, shuffle_partitions=2 * cpus)
    try:
        t0 = time.time()
        from prec_spark.entry_queries import queries

        n_triples = queries()["kg_triples"](spark, sf_dir).count()
        wall = time.time() - t0
        return n_triples, wall
    finally:
        spark.stop()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    if "--scaling" in sys.argv:
        lo_cpus = max(2, cpus // 4)
        results = {}
        for label, n in [("N", lo_cpus), ("4N", cpus)]:
            triples, wall = one_run(f"local[{n}]", n, sf_dir)
            results[label] = {
                "cores": n,
                "triples": triples,
                "wall_sec": round(wall, 2),
                "triples_per_sec": round(triples / wall, 1),
            }
        eff = (
            results["4N"]["triples_per_sec"] / results["N"]["triples_per_sec"]
        ) / (results["4N"]["cores"] / results["N"]["cores"])
        print(json.dumps({"scaling": results, "efficiency": round(eff, 3), "sf": sf}))
        return

    spark = _build(f"local[{cpus}]", shuffle_partitions=2 * cpus)
    t0 = time.time()
    timings, n_triples = run_queries(spark, sf_dir)
    total = time.time() - t0
    kg_sec = timings.get("kg_triples", total)
    print(
        json.dumps(
            {
                "metric": "kg_construct end-to-end wall (extract->link->canonicalize->materialize)",
                "value": round(kg_sec, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "triples": n_triples,
                "triples_per_sec": round(n_triples / kg_sec, 1) if kg_sec else None,
                "cores": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
