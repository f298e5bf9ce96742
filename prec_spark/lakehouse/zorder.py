"""Z-order (Morton) clustering for IceLite data layout.

Multi-column file skipping: min/max stats prune a file only when the
predicate column is CLUSTERED across files. A linear sort clusters one
column perfectly and leaves every other dimension striped through all
files; interleaving the bits of k columns (the Z-curve, the same layout
``OPTIMIZE ZORDER BY`` computes in Delta/Iceberg) gives every dimension
~N^(1/k) locality, so a box predicate on ANY clustered column prunes.

The key is pure JVM integer arithmetic (shifts/masks — whole-stage
codegen, no UDF), and it has an exact DuckDB twin, so the zkey itself
is hash-gateable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Interleaved Morton key: bit ``i`` of column ``j`` lands at
    position ``i * len(cols) + j``. Columns must already be non-negative
    integers below ``2**bits`` (rank/truncate upstream)."""
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError("zorder_key needs 1..63 total bits")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = F.col(c).cast("long")
        for i in range(bits):
            # (x & 2^i) << (i*(n-1) + j) moves bit i to i*n + j
            z = z.bitwiseOR(
                F.shiftleft(x.bitwiseAND(F.lit(1 << i)), i * (n - 1) + j)
            )
    return z


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The exact DuckDB twin of :func:`zorder_key` (disjoint-bit terms,
    so summing them equals OR-ing them)."""
    n = len(cols)
    terms = [
        f"(({c} & {1 << i}) << {i * (n - 1) + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"
