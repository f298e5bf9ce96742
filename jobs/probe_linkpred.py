"""Stage-level timing of kg_linkpred's subtrees (noop sink, warm).

Times, separately: (1) the wedge pairs aggregation (scores before the
anti join), (2) scores + the edge anti-join, (3) the full query — and
an A/B of the anti-join formulation: current (join keys (a,b) against
the cached iund, which re-exchanges it) vs a scores-side repartition
by ``a`` aligned with iund's cached isrc partitioning.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from prec_spark.session import build_session

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
spark = build_session(
    app_name="probe-linkpred",
    master=f"local[{cpus}]",
    shuffle_partitions=2 * cpus,
    extra_conf={
        "spark.local.dir": "/dev/shm/prec-spark-bench",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
    },
)

from prec_spark.entry_queries import _kg_instance_graph
from prec_spark.plans.components import fits_broadcast
from prec_spark.plans.linkpred import DMAX, MIN_CN, linkpred_scores_ids

ids, iund, _sl = _kg_instance_graph(spark, sf_dir)
ids.count(); iund.count()  # warm the caches

def t(name, df, reps=3):
    best = 1e18
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"{name}: {best:.2f}s")
    return best

bcast = F.broadcast if fits_broadcast(spark, ids.count()) else (lambda d: d)
deg = iund.groupBy(F.col("isrc").alias("n")).agg(F.count(F.lit(1)).alias("deg"))
centers = deg.filter(F.col("deg") <= DMAX).select(F.col("n").alias("isrc"), "deg")
nbrs = iund.join(bcast(centers), "isrc")
adj = nbrs.groupBy(F.col("isrc").alias("z"), F.col("deg").alias("dz")).agg(
    F.collect_list("idst").alias("nbs")
)
half = adj.select("dz", F.explode("nbs").alias("a"), "nbs")
pairs = half.select(
    "dz", "a", F.explode(F.filter("nbs", lambda x: x > F.col("a"))).alias("b")
)
scores = (
    pairs.groupBy("a", "b")
    .agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum(F.expr("1000000000 div dz")).cast("long").alias("ra_nano"),
    )
    .filter(F.col("cn") >= MIN_CN)
)
print("n pairs rows:", pairs.count())
print("n scores rows:", scores.count())

t("1-scores (wedge agg only)", scores)

anti_cur = scores.join(
    iund, (scores["a"] == iund["isrc"]) & (scores["b"] == iund["idst"]), "left_anti"
)
t("2a-anti current (iund re-exchange)", anti_cur)

parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
scores_a = scores.repartition(parts, "a")
anti_ali = scores_a.join(
    iund, (scores_a["a"] == iund["isrc"]) & (scores_a["b"] == iund["idst"]), "left_anti"
)
t("2b-anti aligned (scores repart by a)", anti_ali)
print("=== aligned anti plan ===")
anti_ali.explain("formatted")

t("3-full linkpred_scores_ids", linkpred_scores_ids(ids, iund))
spark.stop()
