"""Degree distribution of the KG instance graph.

The first profiling question about any graph at scale — is it
power-law, where does the hub tail start, which degree cap will the
walk corpora actually bite on (plans/walks.py) — answered as a
log2-bucketed histogram.  The bucket is the BIT LENGTH of the degree
(`length(bin(deg))`): an exact integer operation in both engines, so
no floating log2 whose floor could straddle a boundary differently
(Spark log2 is Math.log(x)/log(2) and is NOT exactly k at powers of
two).  Bucket b holds degrees in [2^(b-1), 2^b).

One aggregation over the (already session-cached) symmetric edge
list, then a tiny histogram aggregation — nothing here is wider than
the degree count itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import graph_ctes


def degree_histogram(und: DataFrame) -> DataFrame:
    """(bucket, n_nodes, min_deg, max_deg): log2 buckets by bit length
    over the per-node degree of the symmetric edge list."""
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    bucket = F.length(F.conv(F.col("deg"), 10, 2)).cast("int")
    return (
        deg.select(bucket.alias("bucket"), "deg")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("deg").cast("long").alias("min_deg"),
            F.max("deg").cast("long").alias("max_deg"),
        )
    )


def degree_oracle_sql(triples_sql: str) -> str:
    return f"""
WITH {graph_ctes(triples_sql)},
deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src)
SELECT CAST(length(bin(deg)) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(deg) AS BIGINT) AS min_deg,
       CAST(MAX(deg) AS BIGINT) AS max_deg
FROM deg GROUP BY 1
"""
