"""Approximate-nearest-neighbor search over embeddings."""

from .search import (  # noqa: F401
    ann_bruteforce,
    ann_bruteforce_oracle_sql,
    ann_ivf,
    ann_ivf_oracle_sql,
    ann_lsh,
    ann_lsh_oracle_sql,
)
