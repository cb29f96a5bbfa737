"""Seeded semantics for pmi_edges' scoring math and the containment
operator shape behind shingle_containment (the gated queries pin
SQL-twin equivalence on the KG / documents tables)."""

import pytest

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.dedup import shingles


def test_pmi_math_on_seeded_cooccurrence(spark):
    # 4 convs: {a,b} together twice, {a,c} once, {d} alone.
    # p(a)=3/4, p(b)=2/4, p(a,b)=2/4 -> pmi(a,b)=log2(2*4/(3*2))=.415
    ce = spark.createDataFrame(
        [("c1", "a"), ("c1", "b"), ("c2", "a"), ("c2", "b"),
         ("c3", "a"), ("c3", "c"), ("c4", "d")],
        "conv string, ent string",
    )
    n_conv = ce.select(F.countDistinct("conv").alias("n"))
    ec = ce.groupBy("ent").agg(F.count(F.lit(1)).alias("n_e"))
    a = ce.select("conv", F.col("ent").alias("ent_a"))
    b = ce.select("conv", F.col("ent").alias("ent_b"))
    pairs = (
        a.join(b, "conv").where(F.col("ent_a") < F.col("ent_b"))
        .groupBy("ent_a", "ent_b").agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    out = (
        pairs
        .join(ec.withColumnRenamed("ent", "ent_a")
                .withColumnRenamed("n_e", "na"), "ent_a")
        .join(ec.withColumnRenamed("ent", "ent_b")
                .withColumnRenamed("n_e", "nb"), "ent_b")
        .crossJoin(F.broadcast(n_conv))
        .select("ent_a", "ent_b", "n_ab",
                F.round(F.log2(F.col("n_ab") * F.col("n")
                               / (F.col("na") * F.col("nb"))), 4)
                .alias("pmi"))
        .collect()
    )
    # only (a,b) survives n_ab >= 2; (a,c) is a singleton pair
    assert len(out) == 1
    r = out[0]
    assert (r["ent_a"], r["ent_b"], r["n_ab"]) == ("a", "b", 2)
    assert r["pmi"] == pytest.approx(0.415, abs=1e-3)


def _containment(spark, docs, max_small=40, thresh=0.8):
    sh = shingles(docs, width=5, hash_shingles=True).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    short = sh.join(
        sizes.where(F.col("n") <= max_small).select("doc_id"), "doc_id"
    )
    inter = (
        short.withColumnRenamed("doc_id", "small_id")
        .join(sh.withColumnRenamed("doc_id", "big_id"), "sk")
        .where(F.col("small_id") != F.col("big_id"))
        .groupBy("small_id", "big_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "small_id")
            .withColumnRenamed("n", "n_small"), "small_id"
        )
        .where(F.col("n_common") / F.col("n_small") >= thresh)
        .select("small_id", "big_id",
                F.round(F.col("n_common") / F.col("n_small"), 4)
                .alias("containment"))
        .collect()
    )


def test_containment_catches_quote_jaccard_misses(spark):
    quote = "alpha beta gamma delta epsilon zeta"
    article = (
        "intro words before the excerpt now " + quote +
        " and a long tail of unrelated commentary follows here with "
        "many more tokens stretching the article far beyond the quote"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, article)], "doc_id long, text string"
    )
    out = _containment(spark, docs)
    # the quote's 2 shingles both occur in the article -> containment 1.0
    assert [(r["small_id"], r["big_id"], r["containment"]) for r in out] == [
        (1, 2, 1.0)
    ]


def test_containment_is_asymmetric_and_thresholded(spark):
    # doc 3 shares nothing; the big article is never a small candidate
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six"),
            (3, "totally different words in this other document here"),
        ],
        "doc_id long, text string",
    )
    assert _containment(spark, docs) == []


def test_embedding_drift_identical_halves_have_zero_drift(spark):
    from gfftoneo4j_spark.queries import QUERIES  # noqa: F401
    from pyspark.sql import functions as F

    # halves 0/1 get the SAME two vectors per label -> centroids equal
    rows = [(i, [1.0, 2.0, 2.0], 5) for i in range(4)] + [
        (i, [0.0, 1.0, 0.0], 6) for i in range(10, 14)
    ]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    d = e.select(
        "label", (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "x"),
    )
    c = d.groupBy("label", "half", "dim").agg(F.avg("x").alias("m"))
    a = c.where(F.col("half") == 0).select("label", "dim", F.col("m").alias("ma"))
    b = c.where(F.col("half") == 1).select("label", "dim", F.col("m").alias("mb"))
    out = {
        r["label"]: r
        for r in a.join(b, ["label", "dim"]).groupBy("label").agg(
            F.round(F.sum(F.col("ma") * F.col("mb"))
                    / (F.sqrt(F.sum(F.col("ma") ** 2))
                       * F.sqrt(F.sum(F.col("mb") ** 2))), 6).alias("cos_sim"),
            F.round(F.sqrt(F.sum((F.col("ma") - F.col("mb")) ** 2)), 6)
            .alias("l2_dist"),
        ).collect()
    }
    assert out[5]["cos_sim"] == 1.0 and out[5]["l2_dist"] == 0.0
    assert out[6]["cos_sim"] == 1.0 and out[6]["l2_dist"] == 0.0


def test_phrase_search_finds_all_and_only_adjacent_runs(spark):
    from gfftoneo4j_spark.queries import QUERIES
    import gfftoneo4j_spark.queries as Q
    from pyspark.sql import functions as F

    # inline replica of the gated plan with a custom phrase set
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma end"),
            (2, "alpha beta x gamma"),       # broken adjacency: no hit
            (3, "pre alpha beta gamma post alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    ph = spark.createDataFrame(
        [("alpha beta gamma", "alpha", "beta", "gamma")],
        "phrase string, w1 string, w2 string, w3 string",
    )
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all("text", F.lit("[A-Za-z0-9]+"), 0)
        ).alias("p0", "term"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "term")
    a = tok.join(F.broadcast(ph), F.col("term") == F.col("w1")).select(
        "doc_id", "pos", "phrase", "w2", "w3"
    )
    b = tok.select(F.col("doc_id").alias("doc_b"),
                   F.col("pos").alias("pos_b"), F.col("term").alias("t_b"))
    c = tok.select(F.col("doc_id").alias("doc_c"),
                   F.col("pos").alias("pos_c"), F.col("term").alias("t_c"))
    out = sorted(
        (r["doc_id"], r["pos"])
        for r in a.join(
            b, (F.col("doc_b") == F.col("doc_id"))
            & (F.col("pos_b") == F.col("pos") + 1)
            & (F.col("t_b") == F.col("w2")))
        .join(
            c, (F.col("doc_c") == F.col("doc_id"))
            & (F.col("pos_c") == F.col("pos") + 2)
            & (F.col("t_c") == F.col("w3")))
        .select("doc_id", "pos").collect()
    )
    assert out == [(1, 1), (3, 2), (3, 6)]
