"""Independent recomputation checks for graph_random_walks /
graph_assortativity / association_rules / seasonal_residuals."""

from collections import defaultdict

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.graph import deterministic_walks
from gfftoneo4j_spark.queries import QUERIES


def _toy_edges(spark):
    rows = [(f"n{i}", f"n{(i * 5 + 1) % 17}") for i in range(60)]
    return spark.createDataFrame(rows, "u string, v string")


def test_walks_follow_edges_and_are_deterministic(spark):
    edges = _toy_edges(spark)
    eset = {(r["u"], r["v"]) for r in edges.distinct().collect()}
    out = deterministic_walks(edges, steps=3).collect()
    pos = {(r["start"], r["step"]): r["node"] for r in out}
    for (start, step), node in pos.items():
        if step == 0:
            assert node == start
        else:
            prev = pos[(start, step - 1)]
            assert (prev, node) in eset  # every hop is a real edge
    # bit-identical under a different partitioning
    out2 = deterministic_walks(edges.repartition(7), steps=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_assortativity_matches_numpy(spark, sf_dir):
    import numpy as np

    row = QUERIES["graph_assortativity"](spark, sf_dir).collect()[0]
    t = QUERIES["kg_triples"](spark, sf_dir)
    e = [
        (r["subj"], r["obj"])
        for r in t.select("subj", "obj").distinct().collect()
    ]
    od, idg = defaultdict(int), defaultdict(int)
    for u, v in e:
        od[u] += 1
        idg[v] += 1
    xs = np.array([od[u] for u, _ in e], dtype=float)
    ys = np.array([idg[v] for _, v in e], dtype=float)
    want = float(np.corrcoef(xs, ys)[0, 1])
    assert abs(row["assortativity"] - round(want, 6)) < 1e-5
    assert row["n_edges"] == len(e)


def test_association_rules_formulas(spark, sf_dir):
    rows = QUERIES["association_rules"](spark, sf_dir).collect()
    assert rows
    from gfftoneo4j_spark.sources.transcripts import load_table

    li = load_table(spark, sf_dir, "lineitem")
    lp = sorted(
        {(r["l_orderkey"], r["l_partkey"]) for r in li.collect()}
    )
    baskets = defaultdict(list)
    for o, p in lp:
        baskets[o].append(p)
    capped = {o: sorted(ps)[:5] for o, ps in baskets.items()}
    sup = defaultdict(int)
    for ps in capped.values():
        for p in ps:
            sup[p] += 1
    n = len(capped)
    pairw = defaultdict(int)
    for ps in capped.values():
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pairw[(a, b)] += 1
    for r in rows[:300]:
        a, c = r["ante"], r["cons"]
        w = pairw[(min(a, c), max(a, c))]
        assert r["w"] == w and w >= 2
        assert abs(r["confidence"] - round(w / sup[a], 6)) < 1e-9
        assert abs(r["lift"] - round(w * n / (sup[a] * sup[c]), 6)) < 1e-9


def test_seasonal_residuals_exceed_cell_sigma(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    ev = load_table(spark, sf_dir, "events")
    pdf = ev.select(
        "event_id", "event_type", F.hour("ts").alias("hr"), "value"
    ).toPandas()
    g = pdf.groupby(["event_type", "hr"])["value"]
    stats = g.agg(["mean", "std"]).round(6)
    flagged = QUERIES["seasonal_residuals"](spark, sf_dir).collect()
    pdf_i = pdf.set_index("event_id")
    for r in flagged:
        row = pdf_i.loc[r["event_id"]]
        mu, sd = stats.loc[(row["event_type"], row["hr"])]
        assert abs(row["value"] - mu) > 3 * sd
