"""Property tests for compaction_plan (offset packing is a faithful
recomputation) and stats_pruning_audit (skipping is SOUND: a skipped
file can contain no qualifying row)."""

from collections import defaultdict

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_compaction_offset_packing_recompute(spark, sf_dir):
    rows = QUERIES["compaction_plan"](spark, sf_dir).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    assert by_src
    for src, files in by_src.items():
        files.sort(key=lambda r: (-r["bytes"], r["file_id"]))
        cum = 0
        for r in files:
            assert r["target_bin"] == cum // 4096, (src, r)
            cum += r["bytes"]
        # bins are contiguous from 0
        bins = {r["target_bin"] for r in files}
        assert bins == set(range(max(bins) + 1))


def test_pruning_is_sound(spark, sf_dir):
    """Every file the audit skips must truly contain zero rows
    matching n_chars > 600 AND lang = 'en' (zone maps may be
    conservative, never lossy)."""
    d = load_table(spark, sf_dir, "documents")
    files = d.groupBy(
        "source", F.expr("doc_id DIV 20").alias("file_id")
    ).agg(
        F.max("n_chars").alias("max_nc"),
        F.min("lang").alias("min_lang"),
        F.max("lang").alias("max_lang"),
        F.sum(
            F.when(
                (F.col("n_chars") > 600) & (F.col("lang") == "en"), 1
            ).otherwise(0)
        ).alias("qualifying"),
    )
    bad = files.where(
        (
            (F.col("max_nc") <= 600)
            | (F.col("min_lang") > "en")
            | (F.col("max_lang") < "en")
        )
        & (F.col("qualifying") > 0)
    ).count()
    assert bad == 0
    # and the audit's totals agree with a direct recount
    audit = {
        r["source"]: r
        for r in QUERIES["stats_pruning_audit"](spark, sf_dir).collect()
    }
    direct = {
        r["source"]: r["ns"]
        for r in files.groupBy("source")
        .agg(
            F.sum(
                F.when(
                    (F.col("max_nc") <= 600)
                    | (F.col("min_lang") > "en")
                    | (F.col("max_lang") < "en"),
                    1,
                ).otherwise(0)
            ).alias("ns")
        )
        .collect()
    }
    for src, r in audit.items():
        assert r["n_skipped"] == direct[src]
