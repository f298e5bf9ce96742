"""Deduplication suite over the `documents` table."""

from .exact import dedup_exact, dedup_exact_oracle_sql  # noqa: F401
from .minhash import dedup_minhash_pairs, dedup_minhash_oracle_sql  # noqa: F401
from .ngram import dedup_ngram_jaccard, dedup_ngram_oracle_sql  # noqa: F401
from .simhash import (  # noqa: F401
    dedup_simhash_cc,
    dedup_simhash_cc_oracle_sql,
    dedup_simhash_groups,
    dedup_simhash_hamming,
    dedup_simhash_hamming_oracle_sql,
    dedup_simhash_oracle_sql,
)
from .embedding import (  # noqa: F401
    embedding_neardup,
    embedding_neardup_oracle_sql,
)
