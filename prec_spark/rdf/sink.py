"""RDF sinks (S6 in SURVEY.md §2.1).

The canonical term-string encoding makes N-Triples serialization a
single concat — `write_ntriples` emits a standard .nt dataset as
Spark text partitions (plus parquet for the structured form). Nested
RDF-star terms serialize in the `<< ... >>` RDF-star N-Triples syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ntriples_lines(triples: DataFrame) -> DataFrame:
    return triples.select(
        F.concat(F.col("s"), F.lit(" "), F.col("p"), F.lit(" "), F.col("o"), F.lit(" .")).alias(
            "value"
        )
    )


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite"):
    ntriples_lines(triples).write.mode(mode).text(path)


def write_triples_parquet(
    triples: DataFrame, path: str, mode: str = "overwrite", partitions: int | None = None
):
    df = triples if partitions is None else triples.repartition(partitions)
    df.write.mode(mode).parquet(path)
