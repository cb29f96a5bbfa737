"""Unit invariants for the round-3 additions: PII redaction, next-fit
sequence packing, and fuzzy (levenshtein) entity linking.

The gated queries prove hash-exact parity vs DuckDB; these tests pin
the *semantic* invariants the hash can't explain on its own (no PII
survives redaction, no bin overflows, blocking loses no candidate).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gfftoneo4j_spark.functions.pii import (
    PII_PATTERNS,
    pii_count,
    pii_counts,
    redact_pii,
)
from gfftoneo4j_spark.operators.linking import link_mentions_fuzzy
from gfftoneo4j_spark.operators.packing import pack_next_fit


def test_redaction_removes_every_match(spark):
    rows = [
        Row(i=0, t="mail a.b-c@x-corp.co.uk or b@c.io, ip 10.0.0.1"),
        Row(i=1, t="call 555-123-4567 then 555-000-0000; 999.12.1.255"),
        Row(i=2, t="no pii at all, just 1234 and a-b-c"),
        Row(i=3, t=""),
    ]
    out = (
        spark.createDataFrame(rows)
        .select(
            "i",
            redact_pii(F.col("t")).alias("red"),
            *[pii_count(F.col("t"), k).alias(k) for k in PII_PATTERNS],
        )
        .collect()
    )
    by_i = {r["i"]: r for r in out}
    for r in out:
        for kind, (pat, _) in PII_PATTERNS.items():
            assert not re.search(pat, r["red"]), (r["i"], kind, r["red"])
    assert (by_i[0]["email"], by_i[0]["ipv4"]) == (2, 1)
    assert (by_i[1]["phone"], by_i[1]["ipv4"]) == (2, 1)
    assert by_i[2]["email"] == by_i[2]["phone"] == by_i[2]["ipv4"] == 0
    assert by_i[0]["red"] == "mail <EMAIL> or <EMAIL>, ip <IP>"


def test_pii_counts_shared_chain_matches_per_kind(spark):
    # pii_counts builds ONE progressive redaction chain; it must agree
    # with the per-kind pii_count (which recomputes the prefix) on
    # every kind, including the cross-kind shadowing cases
    rows = [
        Row(i=0, t="mail a.b-c@x-corp.co.uk or b@c.io, ip 10.0.0.1"),
        Row(i=1, t="call 555-123-4567 then 555-000-0000; 999.12.1.255"),
        Row(i=2, t="x 555-123-4567@ex.com y"),
        Row(i=3, t=""),
    ]
    df = spark.createDataFrame(rows)
    shared = pii_counts(F.col("t"))
    out = df.select(
        "i",
        *[shared[k].alias(f"s_{k}") for k in PII_PATTERNS],
        *[pii_count(F.col("t"), k).alias(f"p_{k}") for k in PII_PATTERNS],
    ).collect()
    for r in out:
        for k in PII_PATTERNS:
            assert r[f"s_{k}"] == r[f"p_{k}"], (r["i"], k)


def test_email_redacted_before_phone_digits_counted(spark):
    # an email whose local part looks phone-ish must count once, as email
    row = spark.createDataFrame([Row(t="x 555-123-4567@ex.com y")]).select(
        pii_count(F.col("t"), "email").alias("e"),
        redact_pii(F.col("t")).alias("red"),
    ).first()
    assert row["e"] == 1
    assert row["red"] == "x <EMAIL> y"


@pytest.mark.parametrize("capacity", [5, 16, 100])
def test_packing_invariants(spark, capacity):
    rows = [
        Row(shard=i % 3, doc_id=i, tok=(i * 7) % 13 + 1) for i in range(60)
    ]
    # one oversized doc: must land alone in its own bin, not crash
    rows.append(Row(shard=0, doc_id=999, tok=capacity + 50))
    df = spark.createDataFrame(rows)
    out = pack_next_fit(df, capacity=capacity).collect()
    assert len(out) == len(rows)

    by_shard_bin = {}
    for r in out:
        by_shard_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    for (shard, b), docs in by_shard_bin.items():
        total = sum(r["tok"] for r in docs)
        # a bin only overflows when a single doc alone exceeds capacity
        if total > capacity:
            assert any(r["tok"] > capacity for r in docs), (shard, b, total)
        # fill of the last-placed doc equals the bin total
        assert max(r["fill"] for r in docs) == total

    # bins are contiguous 0..max and packing order is ascending doc_id
    for shard in {r["shard"] for r in out}:
        srows = sorted(
            (r for r in out if r["shard"] == shard), key=lambda r: r["doc_id"]
        )
        bins = [r["bin"] for r in srows]
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))


def test_packing_deterministic(spark):
    rows = [Row(shard=0, doc_id=i, tok=10) for i in range(20)]
    df = spark.createDataFrame(rows)
    a = sorted(map(tuple, pack_next_fit(df, 35).collect()))
    b = sorted(map(tuple, pack_next_fit(df.repartition(7), 35).collect()))
    assert a == b
    # capacity 35, tok 10 -> exactly 3 docs per bin
    assert all(r[4] <= 30 for r in a)


def test_fuzzy_linking_blocking_completeness(spark):
    dict_df = spark.createDataFrame(
        [
            Row(alias="click0", entity_id="E_click0"),
            Row(alias="click1", entity_id="E_click1"),
            Row(alias="view0", entity_id="E_view0"),
        ]
    )
    mentions = spark.createDataFrame(
        [
            Row(mention_id=1, alias="click0"),   # exact
            Row(mention_id=2, alias="clck0"),    # deletion (len-1)
            Row(mention_id=3, alias="cclick0"),  # insertion (len+1)
            Row(mention_id=4, alias="klick0"),   # substitution (same len)
            Row(mention_id=5, alias="zzzzzz"),   # no match -> NULLs
            Row(mention_id=6, alias="click2"),   # dist 1 to BOTH 0 and 1
        ]
    )
    out = {
        r["mention_id"]: r
        for r in link_mentions_fuzzy(mentions, dict_df, max_dist=1).collect()
    }
    assert out[1]["matched_alias"] == "click0" and out[1]["dist"] == 0
    for i in (2, 3, 4):
        assert out[i]["matched_alias"] == "click0" and out[i]["dist"] == 1
    assert out[5]["matched_alias"] is None and out[5]["entity_id"] is None
    # tie on dist -> lexicographically smallest alias wins
    assert out[6]["matched_alias"] == "click0"


def test_overlapping_kinds_count_once(spark):
    # the phone-shaped digits INSIDE an email span must not also count
    # as a phone: counts are taken on progressively-redacted text
    # (ADVICE r3), so the per-kind counts partition the PII spans
    row = spark.createDataFrame([Row(t="x 555-123-4567@ex.com y")]).select(
        pii_count(F.col("t"), "email").alias("e"),
        pii_count(F.col("t"), "phone").alias("p"),
        pii_count(F.col("t"), "ipv4").alias("i"),
    ).first()
    assert (row["e"], row["p"], row["i"]) == (1, 0, 0)
    # a standalone phone still counts
    row2 = spark.createDataFrame([Row(t="call 555-123-4567 now")]).select(
        pii_count(F.col("t"), "phone").alias("p")
    ).first()
    assert row2["p"] == 1
