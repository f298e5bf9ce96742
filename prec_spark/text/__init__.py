"""Text stages: mention detection, entity linking, text analytics."""

from .mentions import (  # noqa: F401
    canonical_entities,
    entity_links,
    entity_triples,
    mentions_df,
)
