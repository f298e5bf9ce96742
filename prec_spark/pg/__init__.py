"""Property-graph projection: transcripts -> nodes/edges DataFrames."""

from .projection import pg_edges, pg_nodes, sanitize_id_col  # noqa: F401
