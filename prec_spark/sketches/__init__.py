from .cms import cms_heavy_hitters, cms_heavy_hitters_oracle_sql, cms_sketch_df

__all__ = [
    "cms_heavy_hitters",
    "cms_heavy_hitters_oracle_sql",
    "cms_sketch_df",
]
