"""Training-pair extraction, negative sampling, co-occurrence lift:
full Python replays over the corpus + the oracle replicas."""

import hashlib
from collections import defaultdict

from prec_spark.cached import cached_transcripts
from prec_spark.training_pairs import (
    CTX_TURNS,
    NEG_K,
    context_windows,
    context_windows_oracle_sql,
    entity_cooccur,
    entity_cooccur_oracle_sql,
    kg_negative_samples,
    kg_negative_samples_oracle_sql,
)
from prec_spark.text.mentions import entity_links
from prec_spark.transcripts import ENTITIES

from .conftest import SF_DIR
from .oracle_util import compare


def test_context_windows_matches_python_replay(spark):
    rows = cached_transcripts(spark, SF_DIR).collect()
    convs = defaultdict(list)
    for r in rows:
        convs[r.conv_id].append(r)
    expect = {}
    for cid, turns in convs.items():
        turns.sort(key=lambda r: r.turn_idx)
        for i, r in enumerate(turns):
            if r.role != "assistant":
                continue
            ctx = "\n".join(
                f"<{p.role}> {p.text}" for p in turns[max(0, i - CTX_TURNS):i]
            )
            expect[(cid, r.turn_idx)] = (ctx, r.text)
    got = {
        (r.conv_id, r.turn_idx): (r.context, r.response)
        for r in context_windows(spark, SF_DIR).collect()
    }
    assert got == expect
    # first assistant turn of some conversation has a non-empty context
    # (user speaks first) and short conversations produce short contexts
    assert any(v[0].startswith("<user> ") for v in got.values())


def test_negative_samples_replay_and_invariants(spark):
    from collections import Counter

    link_rows = entity_links(spark, SF_DIR).collect()
    pos = {
        (r.conv_id, r.turn_idx, r.mention): r.entity_id for r in link_rows
    }
    # entity_links is per mention OCCURRENCE: a turn mentioning the
    # same entity twice contributes two identical link rows, so the
    # per-key negative count is NEG_K x multiplicity
    mult = Counter((r.conv_id, r.turn_idx, r.mention) for r in link_rows)
    got = kg_negative_samples(spark, SF_DIR).collect()
    per_link = defaultdict(list)
    for r in got:
        assert r.neg_entity_id != r.entity_id
        key = (r.conv_id, r.turn_idx, r.mention)
        assert pos[key] == r.entity_id
        h = hashlib.md5(
            f"neg#{r.conv_id}#{r.turn_idx}#{r.mention}#{r.k}".encode()
        ).hexdigest()[:8]
        assert int(h, 16) % len(ENTITIES) == r.neg_entity_id
        per_link[key].append(r.k)
    assert all(
        len(ks) <= NEG_K * mult[key] for key, ks in per_link.items()
    )
    # accidental-positive filtering must actually fire somewhere
    assert any(
        len(ks) < NEG_K * mult[key] for key, ks in per_link.items()
    )


def test_entity_cooccur_replay(spark):
    inc = {
        (r.conv_id, r.mention)
        for r in entity_links(spark, SF_DIR).select("conv_id", "mention").collect()
    }
    by_ent = defaultdict(set)
    for c, m in inc:
        by_ent[m].add(c)
    n = len({c for c, _ in inc})
    got = {(r.e1, r.e2): (r.c_xy, r.lift_x1000)
           for r in entity_cooccur(spark, SF_DIR).collect()}
    for (e1, e2), (c_xy, lift) in got.items():
        assert e1 < e2
        both = len(by_ent[e1] & by_ent[e2])
        assert c_xy == both
        assert lift == (n * both * 1000) // (len(by_ent[e1]) * len(by_ent[e2]))
    # every co-occurring unordered pair is present exactly once
    expect_pairs = {
        (a, b)
        for a in by_ent for b in by_ent
        if a < b and by_ent[a] & by_ent[b]
    }
    assert set(got) == expect_pairs


def test_training_pairs_oracles(spark):
    compare(context_windows(spark, SF_DIR), context_windows_oracle_sql(), SF_DIR)
    compare(kg_negative_samples(spark, SF_DIR),
            kg_negative_samples_oracle_sql(), SF_DIR)
    compare(entity_cooccur(spark, SF_DIR), entity_cooccur_oracle_sql(), SF_DIR)
