"""Stage-level timing of kg_triangles' subtrees (noop sink, warm),
plus an A/B of the closing join: current (b,c) shuffle join vs a
packed-key broadcast semi-join."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from prec_spark.session import build_session

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
spark = build_session(
    app_name="probe-tri",
    master=f"local[{cpus}]",
    shuffle_partitions=2 * cpus,
    extra_conf={
        "spark.local.dir": "/dev/shm/prec-spark-bench",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
    },
)

from prec_spark.entry_queries import _kg_instance_graph
from prec_spark.plans.components import fits_broadcast
from prec_spark.plans.triangles import triangle_counts_ids

ids, iund, _sl = _kg_instance_graph(spark, sf_dir)
ids.count(); iund.count()

def t(name, df, reps=3):
    best = 1e18
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"{name}: {best:.2f}s", flush=True)
    return best

bcast = F.broadcast if fits_broadcast(spark, ids.count()) else (lambda d: d)
deg = iund.groupBy(F.col("isrc").alias("n")).agg(F.count(F.lit(1)).alias("deg"))
ds = deg.select(F.col("n").alias("isrc"), F.col("deg").alias("dsrc"))
dd = deg.select(F.col("n").alias("idst"), F.col("deg").alias("ddst"))
e_plan = (
    iund.join(bcast(ds), "isrc")
    .join(bcast(dd), "idst")
    .filter(
        (F.col("dsrc") < F.col("ddst"))
        | ((F.col("dsrc") == F.col("ddst")) & (F.col("isrc") < F.col("idst")))
    )
    .select("isrc", "idst", "ddst")
)
t("0-oriented e build (no checkpoint)", e_plan)
t0 = time.time()
e = e_plan.localCheckpoint()
n_e = e.count()
print(f"e checkpoint+count: {time.time()-t0:.2f}s rows={n_e}", flush=True)

adj = e.groupBy(F.col("isrc").alias("a")).agg(
    F.collect_list(F.struct("ddst", "idst")).alias("nbs")
)
half = adj.select("a", F.explode("nbs").alias("x"), "nbs")
wedges = half.select(
    "a",
    F.col("x.idst").alias("b"),
    F.explode(
        F.filter(
            "nbs",
            lambda y: (F.col("x.ddst") < y["ddst"])
            | ((F.col("x.ddst") == y["ddst"]) & (F.col("x.idst") < y["idst"])),
        )
    ).alias("y"),
).select("a", "b", F.col("y.idst").alias("c"))
print("n wedges:", wedges.count(), flush=True)
t("1-wedges", wedges)

closing = e.select(F.col("isrc").alias("b"), F.col("idst").alias("c"))
tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
t("2-tri current (shuffle close)", tri)

# packed-key broadcast semi close (nid < 2^31 both here and at any
# practical scale; broadcast ~8B/row for n_e rows)
packed_e = e.select((F.col("isrc") * F.lit(1 << 32) + F.col("idst")).alias("bc"))
tri_b = (
    wedges.join(
        F.broadcast(packed_e),
        wedges["b"] * F.lit(1 << 32) + wedges["c"] == packed_e["bc"],
        "leftsemi",
    )
)
t("2b-tri broadcast-packed close", tri_b)

corners = (
    tri.select(F.col("a").alias("n"))
    .unionAll(tri.select(F.col("b").alias("n")))
    .unionAll(tri.select(F.col("c").alias("n")))
)
cnt = corners.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
out = ids.join(bcast(cnt), ids["nid"] == cnt["n"]).select("node", "n_tri")
t("3-full current-style from e", out)

corners_b = (
    tri_b.select(F.col("a").alias("n"))
    .unionAll(tri_b.select(F.col("b").alias("n")))
    .unionAll(tri_b.select(F.col("c").alias("n")))
)
cnt_b = corners_b.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
out_b = ids.join(bcast(cnt_b), ids["nid"] == cnt_b["n"]).select("node", "n_tri")
t("3b-full broadcast-close from e", out_b)

import pandas as pd  # noqa: F401
a = out.orderBy("node").toPandas()
b = out_b.orderBy("node").toPandas()
print("identical:", a.equals(b), "rows:", len(a), flush=True)

t("4-full triangle_counts_ids (incl e rebuild)", triangle_counts_ids(ids, iund))
spark.stop()
