"""Exact discrete percentiles (streaming/events.py): exactness against
an independent Python reference over the real events table."""

from decimal import ROUND_HALF_UP, Decimal


def _cents(v: float) -> int:
    # Spark F.round is HALF_UP; Python round() is banker's — quantize
    # via Decimal like the other driver-side references
    return int(
        Decimal(repr(v * 100)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def reference_percentiles(rows):
    by_type = {}
    for event_id, event_type, value in rows:
        by_type.setdefault(event_type, []).append((_cents(value), event_id))
    out = {}
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        pick = lambda q: vals[((n - 1) * q) // 100][0]
        out[t] = (n, pick(50), pick(90), pick(99))
    return out


def test_events_percentiles_match_reference(spark, sf_dir):
    from prec_spark.streaming.events import events_percentiles

    got = {
        r["event_type"]: (
            r["n_events"], r["p50_cents"], r["p90_cents"], r["p99_cents"]
        )
        for r in events_percentiles(spark, sf_dir).collect()
    }
    raw = [
        (r["event_id"], r["event_type"], r["value"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "value")
        .collect()
    ]
    assert got == reference_percentiles(raw)
