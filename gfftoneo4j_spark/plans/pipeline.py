"""End-to-end transcript -> knowledge-graph pipeline.

Spark-native re-expression of the reference's driver flow
(Application.scala:30-40: read -> parse -> group by sequence -> assemble
hierarchy -> write graph), with semantics frozen in
``gfftoneo4j_spark.oracle``:

    transcripts ──quarantine──> turns ──window──> next_turn / in_conv
        └─pandas-UDF extract──> mentions ──broadcast link──> linked
              └─ CC canonicalization (same-as chains) ──> refers_to
    edges = next_turn ∪ in_conv ∪ has_mention ∪ mentions_seq ∪ links
            ∪ refers_to, dropDuplicates (the `create unique` analogue)
    triples = (subj, pred, obj) view of edges

Scale notes (100 TB / 10^12 turns):
- The ONLY wide exchanges are the per-conversation windows (one shuffle
  on conv_id — all four sequence-edge families reuse the same
  partitioning) and the final dropDuplicates. Linking is a broadcast
  join (zero shuffle of the mention table); canonicalization shuffles
  only the tiny entity edge set.
- Mega-conversations make conv_id a skewed window key; the window is
  semantically sequential per conversation, so we cap skew damage by
  AQE + `repartition(conv_id)` before the window rather than salting
  (salting would break lead() chains).
- Node ids are deterministic strings (content-addressed), so re-runs
  and resumed runs produce identical graphs — unlike the reference's
  server-assigned Neo4j ids (Neo4JUtils.scala:38).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfftoneo4j_spark.functions.extraction import (
    extract_mentions_sql,
    extract_mentions_udf,
)
from gfftoneo4j_spark.operators.connected_components import connected_components
from gfftoneo4j_spark.operators.linking import link_mentions
from gfftoneo4j_spark.operators.windows import stable_turn_order
from gfftoneo4j_spark.plans.checkpoint import StageCheckpointer
from gfftoneo4j_spark.plans.lineage import (
    lineage_for,
    per_partition_counts,
    score_histogram,
    union_lineage,
)


@dataclass
class KGResult:
    turns: DataFrame
    mentions_linked: DataFrame
    nodes: DataFrame
    edges: DataFrame
    triples: DataFrame
    lineage: DataFrame
    metrics: DataFrame


def _canonicalize_entities(alias_dict: DataFrame) -> DataFrame:
    """(entity_id -> canonical id) from parent_id same-as chains via
    distributed CC; entities without chains map to themselves via the
    left join in the caller."""
    parent_edges = (
        alias_dict.where(F.col("parent_id").isNotNull())
        .select(F.col("entity_id").alias("u"), F.col("parent_id").alias("v"))
        .distinct()
    )
    return connected_components(parent_edges)  # (node, component)


def build_kg(
    spark: SparkSession,
    transcripts: DataFrame,
    alias_dict: DataFrame,
    extraction: str = "pandas",
    checkpointer: StageCheckpointer | None = None,
    fingerprint: str = "default",
) -> KGResult:
    bad = (
        F.col("text").isNull()
        | (F.col("text") == "")
        | F.col("turn_idx").isNull()
    )
    quarantined = transcripts.where(bad)
    # turns fans out into 4 edge/node families — persist so the scan +
    # filter runs once per action, not once per branch
    turns = (
        transcripts.where(~bad)
        .withColumn(
            "turn_id",
            F.concat_ws(":", F.lit("turn"), F.col("conv_id"), F.col("turn_idx")),
        )
        .persist()
    )

    # --- structural + sequence edges in ONE window pass over turns:
    # lead() gives next_turn, the same row emits in_conv — a 2-struct
    # explode instead of two union branches re-shuffling turns
    w_turn = stable_turn_order()
    turn_edges = (
        turns.select(
            "turn_id",
            "conv_id",
            F.lead("turn_id").over(w_turn).alias("next_id"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("turn_id").alias("src"),
                        F.col("next_id").alias("dst"),
                        F.lit("next_turn").alias("type"),
                    ),
                    F.struct(
                        F.col("turn_id").alias("src"),
                        F.concat(F.lit("conv:"), F.col("conv_id")).alias("dst"),
                        F.lit("in_conv").alias("type"),
                    ),
                )
            ).alias("e")
        )
        .select("e.*")
        .where(F.col("dst").isNotNull())
    )

    # --- vectorized extraction (P1) ------------------------------------
    if extraction == "pandas":
        ms = extract_mentions_udf(F.col("text"))
    elif extraction == "sql":
        ms = extract_mentions_sql(F.col("text"))
    else:
        raise ValueError(f"unknown extraction mode {extraction!r}")
    mentions = (
        turns.select("conv_id", "turn_idx", "turn_id", F.explode(ms).alias("m"))
        .select(
            "conv_id",
            "turn_idx",
            "turn_id",
            F.col("m.pos").alias("pos"),
            F.col("m.alias").alias("alias"),
        )
    )
    if checkpointer is not None:
        mentions = checkpointer.stage(
            "mentions", mentions, f"{fingerprint}:extract:{extraction}"
        )

    # --- broadcast entity linking (J1/J2) -------------------------------
    lr = link_mentions(mentions, alias_dict)
    linked = lr.linked.withColumn(
        "mention_id",
        F.concat_ws(
            ":", F.lit("mention"), F.col("conv_id"), F.col("turn_idx"), F.col("pos")
        ),
    )

    # --- canonicalization (J4 -> CC) ------------------------------------
    canon = _canonicalize_entities(alias_dict)
    if checkpointer is not None:
        canon = checkpointer.stage("canon", canon, f"{fingerprint}:canon")
    linked = (
        linked.join(
            F.broadcast(canon), linked["entity_id"] == canon["node"], "left"
        )
        .withColumn("canonical_id", F.coalesce("component", "entity_id"))
        .drop("node", "component")
    )
    if checkpointer is not None:
        linked = checkpointer.stage(
            "linked", linked, f"{fingerprint}:link:{extraction}"
        )
    else:
        # linked feeds 4 edge families + 2 node sets: without a
        # checkpoint, persist so the pandas-UDF extraction and the
        # broadcast join execute once, not once per branch
        linked = linked.persist()

    # --- mention edge families in ONE window pass over linked ----------
    # The conv-wide lead() ordered by (turn_idx, pos) yields the `links`
    # chain; restricting it to same-turn successors yields the
    # `mentions_seq` chain (consecutive kept mentions within a turn) —
    # no second window shuffle. has_mention / refers_to ride the same
    # row via the 4-struct explode.
    w_conv_m = stable_turn_order(part=("conv_id",), order=("turn_idx", "pos"))
    mention_edges = (
        linked.select(
            "turn_id",
            "turn_idx",
            "mention_id",
            "canonical_id",
            F.lead("mention_id").over(w_conv_m).alias("next_m"),
            F.lead("turn_idx").over(w_conv_m).alias("next_t"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("turn_id").alias("src"),
                        F.col("mention_id").alias("dst"),
                        F.lit("has_mention").alias("type"),
                    ),
                    F.struct(
                        F.col("mention_id").alias("src"),
                        F.concat(F.lit("ent:"), F.col("canonical_id")).alias("dst"),
                        F.lit("refers_to").alias("type"),
                    ),
                    F.struct(
                        F.col("mention_id").alias("src"),
                        F.col("next_m").alias("dst"),
                        F.lit("links").alias("type"),
                    ),
                    F.struct(
                        F.col("mention_id").alias("src"),
                        F.when(
                            F.col("next_t") == F.col("turn_idx"), F.col("next_m")
                        ).alias("dst"),
                        F.lit("mentions_seq").alias("type"),
                    ),
                )
            ).alias("e")
        )
        .select("e.*")
        .where(F.col("dst").isNotNull())
    )

    edges = turn_edges.unionByName(mention_edges).dropDuplicates(
        ["src", "dst", "type"]
    )
    if checkpointer is not None:
        edges = checkpointer.stage("edges", edges, f"{fingerprint}:edges")

    triples = edges.select(
        F.col("src").alias("subj"), F.col("type").alias("pred"), F.col("dst").alias("obj")
    )

    # --- nodes (properties stringified, quirk Q8) ------------------------
    str_props = F.map_filter(
        F.create_map(
            F.lit("turn_idx"), F.col("turn_idx").cast("string"),
            F.lit("role"), F.col("role"),
            F.lit("tool"), F.col("tool"),
            F.lit("ts"), F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        ),
        lambda _, v: v.isNotNull(),
    )
    conv_nodes = (
        turns.select("conv_id")
        .distinct()
        .select(
            F.concat(F.lit("conv:"), F.col("conv_id")).alias("node_id"),
            F.lit("conversation").alias("label"),
            F.create_map(F.lit("conv_id"), F.col("conv_id")).alias("props"),
        )
    )
    turn_nodes = turns.select(
        F.col("turn_id").alias("node_id"),
        F.lit("turn").alias("label"),
        str_props.alias("props"),
    )
    mention_nodes = linked.select(
        F.col("mention_id").alias("node_id"),
        F.lit("mention").alias("label"),
        F.create_map(
            F.lit("alias"), F.col("alias"),
            F.lit("pos"), F.col("pos").cast("string"),
        ).alias("props"),
    )
    entity_nodes = (
        linked.select(F.col("canonical_id"))
        .distinct()
        .select(
            F.concat(F.lit("ent:"), F.col("canonical_id")).alias("node_id"),
            F.lit("entity").alias("label"),
            F.create_map(F.lit("entity_id"), F.col("canonical_id")).alias("props"),
        )
    )
    nodes = reduce(
        lambda a, b: a.unionByName(b),
        [conv_nodes, turn_nodes, mention_nodes, entity_nodes],
    ).dropDuplicates(["node_id"])

    # --- lineage + metrics (Writer analogue, kept not discarded: Q6) -----
    lineage = union_lineage(
        [
            lineage_for(quarantined, "quarantine", "quarantine_empty_text", "conv_id"),
            lineage_for(lr.unlinked, "linking", "unlinked_alias", "alias"),
            lineage_for(lr.ambiguous, "linking", "ambiguous_alias", "alias"),
        ]
    )
    metrics = per_partition_counts(triples, "triples_per_partition").select(
        "metric", F.col("partition_id").cast("string").alias("key"), "value"
    ).unionByName(
        score_histogram(linked, "link_score").select(
            F.lit("link_score_hist").alias("metric"),
            F.col("bin_lo").cast("string").alias("key"),
            F.col("n").alias("value"),
        )
    )

    return KGResult(
        turns=turns,
        mentions_linked=linked,
        nodes=nodes,
        edges=edges,
        triples=triples,
        lineage=lineage,
        metrics=metrics,
    )
