"""Tests for rich-club curve, water-filling allocation and Markov
removal-effect attribution."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_rich_club_recompute(spark, sf_dir):
    rows = QUERIES["rich_club_coefficient"](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents").count()
    edges = set()
    for i in range(docs):
        for t in [(i + 1) % docs, (i * 2) % docs, (i * 3) % docs]:
            if i != t:
                edges.add((min(i, t), max(i, t)))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    for r in rows:
        k = r["k"]
        club = {n for n, d in deg.items() if d > k}
        e_k = sum(1 for a, b in edges if a in club and b in club)
        assert r["n_nodes"] == len(club)
        assert r["n_edges"] == e_k
        want = 2 * e_k / (len(club) * (len(club) - 1))
        assert abs(r["phi"] - want) < 1e-5


def test_waterfill_budget_conserved_and_capped(spark, sf_dir):
    rows = QUERIES["waterfill_mixture"](spark, sf_dir).collect()
    assert rows
    tot = sum(r["tokens"] for r in rows)
    budget = 2 * tot
    alloc = sum(r["alloc_micro"] for r in rows) / 1e6
    # floor loses < 1 micro-token per source
    assert budget - len(rows) * 1e-6 <= alloc <= budget + 1e-6
    for r in rows:
        assert r["alloc_micro"] <= r["cap"] * 1000000 + 1
        if r["saturated"]:
            assert abs(r["alloc_micro"] - r["cap"] * 1000000) <= 1
    # heterogeneous caps: someone saturates, someone doesn't
    sats = {r["saturated"] for r in rows}
    assert sats == {0, 1}


def test_markov_attribution_properties(spark, sf_dir):
    rows = QUERIES["markov_attribution"](spark, sf_dir).collect()
    assert len(rows) == 4
    base = rows[0]["p_conv"]
    assert all(r["p_conv"] == base for r in rows)
    assert 0 < base <= 1
    for r in rows:
        # removing a channel can only lose conversion probability
        assert r["p_removed"] <= base + 1e-9
        assert -1e-9 <= r["removal_effect"] <= 1 + 1e-9
    assert abs(sum(r["credit"] for r in rows) - 1.0) < 1e-4


def test_markov_attribution_recompute(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(
            (e["ts"], e["event_id"], e["event_type"])
        )
    trans = Counter()
    for seq in by_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        try:
            p = types.index("purchase")
        except ValueError:
            p = None
        journey = types[: p if p is not None else len(types)]
        term = "conv" if p is not None else "null"
        if not journey:
            trans[("start", "conv")] += 1
            continue
        trans[("start", journey[0])] += 1
        for a, b in zip(journey, journey[1:]):
            trans[(a, b)] += 1
        trans[(journey[-1], term)] += 1
    out_tot = Counter()
    for (f, t), n in trans.items():
        out_tot[f] += n
    channels = ["click", "error", "signup", "view"]
    states = ["start", *channels]

    def absorb(removed):
        v = {s: 0.0 for s in states}
        for _ in range(16):
            acc = defaultdict(float)
            for (f, t), n in sorted(trans.items()):
                if removed is not None and t == removed:
                    continue
                p = n / out_tot[f]
                w = 1.0 if t == "conv" else (
                    0.0 if t == "null" else v.get(t, 0.0)
                )
                acc[f] += p * w
            v = {s: acc.get(s, 0.0) for s in states}
        return v["start"]

    base = absorb(None)
    got = {
        r["channel"]: r for r in QUERIES["markov_attribution"](
            spark, sf_dir
        ).collect()
    }
    assert abs(got["click"]["p_conv"] - base) < 1e-5
    for c in channels:
        assert abs(got[c]["p_removed"] - absorb(c)) < 1e-5
