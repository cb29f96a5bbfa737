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

from pyspark.sql import DataFrame
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
