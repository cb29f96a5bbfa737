"""Semantic checks for the BGP/motif/timeseries/embedding batch — the
cross-engine gate proves value equality vs DuckDB; these pin MEANING:
BGP path counts reconcile with an independent recount of the triple
store, the motif census matches brute force on a small graph, ACF
hits exactly +/-1 on an alternating series, the Hurst exponent
separates a trend from an anti-persistent series, and Matryoshka
recall is perfect when the signal lives entirely in the kept prefix.
"""

import datetime
import itertools

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES

SF001 = "/root/testdata/sf0.001"

_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_bgp_counts_reconcile_with_triples(spark):
    out = QUERIES["kg_bgp_entity_paths"](spark, SF001).collect()
    assert out
    assert all(r["e1"] != r["e2"] and r["n_paths"] > 0 for r in out)
    # independent recount: walk the links edges through refers_to in
    # plain python over the collected triple store
    t = QUERIES["kg_triples"](spark, SF001).collect()
    ref = {r["subj"]: r["obj"] for r in t if r["pred"] == "refers_to"}
    links = [(r["subj"], r["obj"]) for r in t if r["pred"] == "links"]
    want = {}
    for m1, m2 in links:
        e1, e2 = ref.get(m1), ref.get(m2)
        if e1 and e2 and e1 != e2:
            want[(e1, e2)] = want.get((e1, e2), 0) + 1
    got = {(r["e1"], r["e2"]): r["n_paths"] for r in out}
    assert got == want


def test_motif_census_matches_brute_force(spark, tmp_path):
    m = 12
    rows = [(i, "t", "en", "s", 1) for i in range(m)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["motif"]: r["n"]
        for r in QUERIES["graph_motif_census"](spark, str(tmp_path)).collect()
    }
    edges = set()
    for i in range(m):
        for off in (1, 2, 3, m - 3):
            t = (i + off) % m
            if t != i:
                edges.add((i, t))
    ffl = cyc = 0
    for a, b, c in itertools.permutations(range(m), 3):
        if (a, b) in edges and (b, c) in edges:
            if (a, c) in edges:
                ffl += 1
            if (c, a) in edges:
                cyc += 1
    assert out["feed_forward"] == ffl
    assert out["cycle"] == cyc // 3


def test_acf_alternating_series(spark, tmp_path):
    """Hourly counts 1,3,1,3,... => ACF is exactly -1 at odd lags and
    +1 at even lags."""
    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for h in range(48):
        for _ in range(1 if h % 2 == 0 else 3):
            rows.append(
                (eid, base + datetime.timedelta(hours=h), 1, "x", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(rows, _EVENT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = {
        r["lag"]: r["acf_fp"]
        for r in QUERIES["acf_lags"](spark, str(tmp_path)).collect()
    }
    assert out[1] == -1_000_000
    assert out[2] in (999_999, 1_000_000)  # floor of a 1.0 corr
    assert out[3] == -1_000_000


def test_hurst_separates_trend_from_alternation(spark, tmp_path):
    """A linear ramp is maximally persistent (H -> 1); a +1/-1
    alternation is anti-persistent (H -> 0)."""
    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for i in range(40 * 48):  # 40 days at 30-min cadence
        ts = base + datetime.timedelta(minutes=30 * i)
        rows.append((eid, ts, 1, "trend", float(i), "{}"))
        eid += 1
        rows.append((eid, ts, 2, "alt", 1.0 if i % 2 == 0 else -1.0, "{}"))
        eid += 1
    spark.createDataFrame(rows, _EVENT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = {
        r["event_type"]: r
        for r in QUERIES["hurst_exponent"](spark, str(tmp_path)).collect()
    }
    assert out["trend"]["n_scales"] == 3
    assert out["trend"]["hurst_fp"] > 800_000
    assert out["alt"]["hurst_fp"] < 300_000
    assert out["trend"]["hurst_fp"] > out["alt"]["hurst_fp"]


def test_matryoshka_perfect_when_signal_in_prefix(spark, tmp_path):
    """Vectors whose dims 9..64 are all zero: truncated-to-8 cosine is
    IDENTICAL to full cosine, so recall@3 must be exactly 1."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        head = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, [float(x) for x in head] + [0.0] * 56, i % 3))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = QUERIES["matryoshka_eval"](spark, str(tmp_path)).collect()
    assert len(out) == 5
    assert all(r["n_common"] == 3 and r["recall_fp"] == 1_000_000 for r in out)
    # and on real embeddings truncation must COST something overall
    real = QUERIES["matryoshka_eval"](spark, SF001).collect()
    assert any(r["n_common"] < 3 for r in real)
