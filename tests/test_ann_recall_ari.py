"""Tests for ANN recall eval and ARI/NMI agreement."""

import math
from collections import Counter

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_ann_recall_is_hit_fraction(spark, sf_dir):
    rows = QUERIES["ann_recall_eval"](spark, sf_dir).collect()
    assert len(rows) == 5
    exact = QUERIES["embedding_topk"](spark, sf_dir).collect()
    lsh = QUERIES["ann_lsh_topk"](spark, sf_dir).collect()
    eset = {(r["query_id"], r["neighbor_id"]) for r in exact}
    lset = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    for r in rows:
        mine = {p for p in eset if p[0] == r["query_id"]}
        hits = len(mine & lset)
        assert r["n_exact"] == len(mine)
        assert r["n_hit"] == hits
        assert abs(r["recall"] - hits / len(mine)) < 1e-6
        assert 0.0 <= r["recall"] <= 1.0


def test_ari_nmi_recompute(spark, sf_dir):
    import hashlib

    r = QUERIES["ari_nmi_agreement"](spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select("doc_id").collect()
    pairs = []
    for d in docs:
        did = d["doc_id"]
        latent = did % 3
        ha = hashlib.md5(str(did).encode()).hexdigest()[0]
        hb = hashlib.md5((str(did) + "b").encode()).hexdigest()[0]
        a = (latent + (1 if ha < "3" else 0)) % 3
        b = (latent + (2 if hb < "3" else 0)) % 3
        pairs.append((a, b))
    n = len(pairs)
    ct = Counter(pairs)
    ai = Counter(a for a, _ in pairs)
    bj = Counter(b for _, b in pairs)
    sij = sum(v * (v - 1) // 2 for v in ct.values())
    sa = sum(v * (v - 1) // 2 for v in ai.values())
    sb = sum(v * (v - 1) // 2 for v in bj.values())
    sn = n * (n - 1) // 2
    ari = (sij - sa * sb / sn) / (0.5 * (sa + sb) - sa * sb / sn)
    mi = sum(
        (v / n) * math.log(n * v / (ai[a] * bj[b]))
        for (a, b), v in ct.items()
    )
    hA = -sum((v / n) * math.log(v / n) for v in ai.values())
    hB = -sum((v / n) * math.log(v / n) for v in bj.values())
    nmi = mi / math.sqrt(hA * hB)
    assert r["n"] == n
    assert abs(r["ari"] - ari) < 1e-5
    assert abs(r["nmi"] - nmi) < 1e-5
    # both raters track the same latent signal: well above chance
    assert r["ari"] > 0.2 and r["nmi"] > 0.2
