"""Semantic checks for the round-5 selection/robust/audit queries —
the cross-engine gate proves value equality vs DuckDB; these pin the
MEANING: DSIR prefers the target domain, temperature flattens skew,
winsorized bounds clamp correctly on a hand-computed group, SemDeDup
recalls the injected near-dups and nothing else, and the KG audit
detectors fire on exactly the injected corruptions.
"""

import pytest
from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES


@pytest.fixture(scope="module")
def sf001():
    return "/root/testdata/sf0.001"


def test_dsir_prefers_target_domain(spark, tmp_path):
    """On a corpus where the target ('en') slice genuinely uses a
    different vocabulary, every on-distribution doc must outrank every
    off-distribution doc. (The shared sf* corpus draws all langs from
    ONE vocabulary, so lang shares there are uninformative by
    construction — this toy makes the domains separable.)"""
    rows = []
    for i in range(10):
        rows.append((i, "alpha beta gamma alpha beta", "en", "s", 27))
    for i in range(10, 20):
        rows.append((i, "delta epsilon zeta delta zeta", "de", "s", 29))
    # off-target docs that still reuse some target tokens rank between
    for i in range(20, 25):
        rows.append((i, "alpha delta beta epsilon", "de", "s", 24))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    top = QUERIES["dsir_resample"](spark, str(tmp_path)).collect()
    assert len(top) == 25
    by_rank = [r["doc_id"] for r in top]
    # pure-target docs first, mixed next, pure-off-target last
    assert set(by_rank[:10]) == set(range(10))
    assert set(by_rank[10:15]) == set(range(20, 25))
    assert set(by_rank[15:]) == set(range(10, 20))
    # rank contiguous, scores sorted desc
    assert [r["rk"] for r in top] == list(range(1, 26))
    scores = [r["score_fp"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_temperature_mixture_flattens_skew(spark, sf001):
    rows = QUERIES["temperature_mixture"](spark, sf001).collect()
    assert rows
    quotas = {r["lang"]: r["quota"] for r in rows}
    counts = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{sf001}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # exact-k per stratum: every stratum fills its quota
    per = {}
    for r in rows:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    assert per == {k: v for k, v in quotas.items() if v > 0}
    # alpha=0.5 flattening: the majority lang's share of the sample is
    # strictly below its share of the corpus, minority's at or above
    tot_n = sum(counts.values())
    tot_q = sum(quotas.values())
    hi = max(counts, key=lambda k: counts[k])
    lo = min(counts, key=lambda k: counts[k])
    assert quotas[hi] / tot_q < counts[hi] / tot_n
    assert quotas[lo] / tot_q >= counts[lo] / tot_n


def test_winsorized_stats_toy(spark, tmp_path):
    """20 values 1..20 in one group: lo rank ceil(.05*20)=1, hi rank
    ceil(.95*20)=19 -> bounds 1.0 and 19.0; winsorized sum replaces the
    single 20 with 19; trimmed keeps ranks 1..19."""
    rows = [("g", i, float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    # drive the same logic through a local copy of the registry query by
    # monkeypatching load_table's directory contract: simplest is to
    # rebuild the expression inline via the registered callable on a
    # fabricated sf_dir layout.
    import os

    os.makedirs(str(tmp_path / "sf"), exist_ok=True)
    # load_table reads <sf_dir>/<name>.parquet
    df.write.mode("overwrite").parquet(str(tmp_path / "sf" / "events.parquet"))
    out = {r["event_type"]: r for r in QUERIES["winsorized_stats"](
        spark, str(tmp_path / "sf")).collect()}
    g = out["g"]
    assert g["n"] == 20
    assert g["lo_fp"] == 1_000_000
    assert g["hi_fp"] == 19_000_000
    assert g["wins_sum_fp"] == (sum(range(1, 20)) + 19) * 1_000_000
    assert g["trim_n"] == 19
    assert g["trim_sum_fp"] == sum(range(1, 20)) * 1_000_000


def test_semantic_dedup_recall_and_precision(spark, sf001):
    pairs = QUERIES["semantic_dedup"](spark, sf001).collect()
    assert pairs
    injected = {(r["id_a"], r["id_b"]) for r in pairs
                if r["id_b"] == r["id_a"] + 1_000_000}
    # precision: nothing but injected perturbations crosses 0.9 (the
    # measured natural cosine ceiling on this corpus is ~0.41)
    assert len(injected) == len(pairs)
    # recall: most perturbed twins land in the same cluster and score
    n_csv = spark.read.parquet(f"{sf001}/embeddings.parquet").where(
        F.col("vec_id") % 7 == 0).count()
    assert len(injected) >= 0.8 * n_csv
    assert all(r["score"] >= 0.9 for r in pairs)


def test_kg_integrity_audit_detects_injections(spark, sf001):
    got = {r["check_name"]: r["n_bad"]
           for r in QUERIES["kg_integrity_audit"](spark, sf001).collect()}
    assert got == {
        "refers_to_fanout": 1,      # the injected duplicate refers_to
        "mention_no_entity": 0,
        "links_dangling_src": 1,    # ghost links source
        "links_dangling_dst": 1,    # ghost links target
        "next_turn_fanin": 0,
    }
