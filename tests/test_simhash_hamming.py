"""Banded SimHash Hamming search: EXACTNESS property.

4 bands x 4 bits: any pair within Hamming distance 3 differs in <= 3
bits spread over 4 bands, so at least one band matches (pigeonhole) —
the banded candidate join must find EXACTLY the brute-force pair set.
"""

from pyspark.sql import functions as F

from prec_spark.dedup.simhash import (
    HAMMING_MAX,
    _HAMMING_SQL,
    dedup_simhash_hamming,
)
from prec_spark.text.analysis import doc_fingerprint


def test_banded_equals_bruteforce(spark, sf_dir):
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup_simhash_hamming(spark, sf_dir).collect()
    }
    fp = doc_fingerprint(spark, sf_dir).select("doc_id", "simhash16")
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash16").alias("sim_a"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash16").alias("sim_b"))
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .withColumn("hamming", F.expr(_HAMMING_SQL.format(a="sim_a", b="sim_b")))
            .filter(F.col("hamming") <= HAMMING_MAX)
            .collect()
        )
    }
    assert banded == brute and len(banded) > 0


def test_fuzzy_links_resolve_abbreviations(spark, sf_dir):
    """Abbreviated surfaces ('Bid', 'Ter', ...) must still link, with
    score < 1 (the matcher genuinely ranks by edit distance)."""
    from prec_spark.text.mentions import fuzzy_links

    links = fuzzy_links(spark, sf_dir)
    abbrev = links.filter(F.length("surface") == 3).filter(
        ~F.col("surface").isin("Ann", "Dan")  # these are full names
    )
    rows = abbrev.limit(200).collect()
    assert rows and all(0.5 <= r.score < 1.0 for r in rows)
    # 'Ter' must resolve to Teresa (entity 3): unique best candidate
    ter = links.filter(F.col("surface") == "Ter").select("entity_id").distinct().collect()
    assert [r.entity_id for r in ter] == [3]
