"""prec_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of BruJu/PREC (a
property-graph -> RDF converter, reference at /root/reference) as an
idiomatic, scale-out PySpark pipeline over transcript tables:

* transcripts (conv_id, turn_idx, role, text, tool, ts) are projected
  into a property graph (turns = nodes; conversation / next-turn /
  tool-use edges),
* a driver-side context compiler parses Turtle-star PRSC / PREC-C rule
  catalogs (reference: src/prsc/PrscRule.ts, src/prec-c/context-loader.ts),
* rule application is a broadcast join + generated column expressions
  (reference: src/prsc/PrscContext.ts buildRdfTriplesFromRule),
* triples are materialized as canonical N-Triples-style term strings in
  a (s, p, o) DataFrame with set semantics.

Everything distributed is plain DataFrame ops (joins, explode, window,
groupBy); Python only appears driver-side (context compilation) and in
Arrow-vectorized pandas UDFs (mention detection / entity linking).
"""

__version__ = "0.1.0"
