"""Entity linking: broadcast alias-dictionary join with lineage split.

The reference probes a single in-memory hash index for every parent
lookup (GffLinesRepository, GeneReader.scala:43-56,162). The Spark-native
shape is a *broadcast hash join* against the (small) alias dictionary:
no shuffle of the big mention table at all.

Semantics frozen with oracle.build_graph:
- alias matching is case-insensitive (dictionary aliases lowercased);
- 0 candidates  -> mention dropped, lineage reason ``unlinked_alias``
  (the ParentInfoNotFound path, GeneReader.scala:85-90);
- >1 candidates -> dropped, ``ambiguous_alias`` (exactly-one rule,
  GeneReader.scala:210-218, quirk Q9);
- exactly 1     -> linked, score 1.0 (exact match).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class LinkResult:
    linked: DataFrame  # mention cols + entity_id, entity_type, link_score
    unlinked: DataFrame  # mention cols (misses)
    ambiguous: DataFrame  # mention cols (alias with >1 entity)


def resolve_alias_dict(alias_dict: DataFrame) -> DataFrame:
    """Collapse the dictionary to one row per (lowercased) alias:
    candidate entity set + count. This is the build side of the
    broadcast join and stays tiny (aliases ≪ mentions)."""
    return (
        alias_dict.select(
            F.lower("alias").alias("alias_key"),
            F.col("entity_id"),
            F.col("entity_type"),
        )
        .groupBy("alias_key")
        .agg(
            F.collect_set("entity_id").alias("candidates"),
            F.min("entity_type").alias("entity_type"),
        )
        .select(
            "alias_key",
            F.size("candidates").alias("n_candidates"),
            # deterministic single candidate when unambiguous
            F.array_min("candidates").alias("entity_id"),
            "entity_type",
        )
    )


def link_mentions(mentions: DataFrame, alias_dict: DataFrame) -> LinkResult:
    """``mentions`` must carry an ``alias`` column (already lowercased by
    the extraction stage). The dictionary side is explicitly broadcast —
    the probe side never shuffles."""
    resolved = resolve_alias_dict(alias_dict)
    joined = mentions.join(
        F.broadcast(resolved),
        mentions["alias"] == resolved["alias_key"],
        "left",
    ).drop("alias_key")

    linked = (
        joined.where(F.col("n_candidates") == 1)
        .withColumn("link_score", F.lit(1.0))
        .drop("n_candidates")
    )
    unlinked = joined.where(F.col("n_candidates").isNull()).drop(
        "n_candidates", "entity_id", "entity_type"
    )
    ambiguous = joined.where(F.col("n_candidates") > 1).drop(
        "n_candidates", "entity_id", "entity_type"
    )
    return LinkResult(linked=linked, unlinked=unlinked, ambiguous=ambiguous)


def link_mentions_fuzzy(
    mentions: DataFrame,
    alias_dict: DataFrame,
    max_dist: int = 1,
) -> DataFrame:
    """Fuzzy entity linking: levenshtein-scored candidate match with
    length-band blocking.

    The reference's id index is exact-probe only (GeneReader.scala:43-56);
    real transcript mentions carry typos, so the linking stage needs a
    fuzzy tier behind the exact one. Semantics: for each mention find
    the dictionary alias with minimum edit distance <= ``max_dist``
    (ties broken by lexicographically smallest alias); unmatched
    mentions survive with NULL entity columns (the quarantine path).

    Scale shape: the dictionary is small (aliases << mentions), so the
    candidate join is a BROADCAST on a *blocking key* — the alias length
    banded to +-max_dist via an exploded dict side — never a cross
    join. Probe-side work per mention is |aliases in band|, and the
    mention table itself never shuffles for candidate generation; only
    the best-pick window repartitions by mention id. An edit distance
    <= d requires a length difference <= d, so banding loses no
    candidates (classic blocking completeness argument).

    ``mentions`` must carry ``mention_id`` and ``alias`` (lowercased).
    Returns mention cols + (matched_alias, entity_id, dist).
    """
    bands = F.sequence(
        F.length("alias") - max_dist, F.length("alias") + max_dist
    )
    dict_side = (
        alias_dict.select(
            F.lower("alias").alias("cand_alias"),
            "entity_id",
            F.explode(bands).alias("len_key"),
        )
        .where(F.col("len_key") > 0)
    )
    cand = (
        mentions.withColumn("len_key", F.length("alias"))
        .join(F.broadcast(dict_side), "len_key")
        .withColumn("dist", F.levenshtein("alias", "cand_alias"))
        .where(F.col("dist") <= max_dist)
        .drop("len_key")
    )
    w = Window.partitionBy("mention_id").orderBy("dist", "cand_alias")
    best = (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .drop("rk")
    )
    return mentions.join(
        best.select(
            "mention_id",
            F.col("cand_alias").alias("matched_alias"),
            "entity_id",
            "dist",
        ),
        "mention_id",
        "left",
    )
