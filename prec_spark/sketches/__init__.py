from .cms import cms_heavy_hitters, cms_heavy_hitters_oracle_sql, cms_sketch_df
from .hll import (
    hll_estimate,
    hll_merge,
    hll_merge_oracle_sql,
    hll_registers,
    hll_registers_oracle_sql,
)

__all__ = [
    "cms_heavy_hitters",
    "cms_heavy_hitters_oracle_sql",
    "cms_sketch_df",
    "hll_estimate",
    "hll_merge",
    "hll_merge_oracle_sql",
    "hll_registers",
    "hll_registers_oracle_sql",
]
