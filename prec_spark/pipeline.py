"""The end-to-end KG-construction pipeline (BASELINE.json north_star):

    transcripts -> PG projection -> [mention detect -> entity link ->
    canonicalize] -> PRSC context application -> triple materialize

Stage boundaries are checkpoint-resumable (prec_spark.checkpoint); the
final triples are written partitioned. `run_pipeline` is what bench.py
times and what a spark-submit job on a real cluster would call.

Scale design notes:
* transcripts are the only big input; every derived stage either
  shuffles by conv_id (the natural partitioning key) once, or is a
  narrow map
* the rule catalog and the entity dictionary are broadcast
* canonicalization is a salted two-phase aggregation (hot entities)
* the final dropDuplicates is the single unavoidable wide shuffle on
  the output key (set semantics of an RDF graph)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .checkpoint import CheckpointedPipeline
from .contexts.model import PRSCCatalog
from .flagship import TRANSCRIPT_CONTEXT
from .pg.projection import pg_edges, pg_nodes
from .prsc.apply import apply_prsc
from .text.mentions import canonical_entities, entity_links, entity_triples
from .transcripts import transcripts_df


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    context_ttl: str = TRANSCRIPT_CONTEXT,
    collect_lineage: bool = True,
) -> tuple[DataFrame, CheckpointedPipeline]:
    """Run (or resume) the full pipeline; returns (triples, pipeline)."""
    pipe = CheckpointedPipeline(spark, workdir, collect_lineage=collect_lineage)
    catalog = PRSCCatalog.from_turtle(context_ttl)

    transcripts = pipe.stage("transcripts", lambda: transcripts_df(spark, sf_dir))
    nodes = pipe.stage("pg_nodes", lambda: pg_nodes(transcripts))
    edges = pipe.stage("pg_edges", lambda: pg_edges(transcripts))
    links = pipe.stage("entity_links", lambda: entity_links(spark, sf_dir, transcripts))
    pipe.stage("canonical_entities", lambda: canonical_entities(spark, sf_dir, transcripts))

    def build_triples():
        prsc_triples, quarantine = apply_prsc(spark, nodes, edges, catalog)
        quarantine.write.mode("overwrite").parquet(os.path.join(workdir, "_quarantine"))
        ment_triples = entity_triples(spark, sf_dir, transcripts)
        # branches are internally dedup'd and disjoint by subject/predicate
        return prsc_triples.unionByName(ment_triples)

    triples = pipe.stage("kg_triples", build_triples)
    return triples, pipe
