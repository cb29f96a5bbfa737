"""End-to-end transcript -> knowledge-graph pipeline.

Spark-native re-expression of the reference's driver flow
(Application.scala:30-40: read -> parse -> group by sequence -> assemble
hierarchy -> write graph), with semantics frozen in
``gfftoneo4j_spark.oracle``:

    transcripts ──quarantine──> turns ──window──> next_turn / in_conv
        └─pandas-UDF extract──> mentions ──broadcast link──> linked
              └─ CC canonicalization (same-as chains) ──> refers_to
    edges = next_turn ∪ in_conv ∪ has_mention ∪ mentions_seq ∪ links
            ∪ refers_to — unique by construction (`create unique`
            analogue): keys are deduped inside the window passes and
            contract violators land in lineage
    triples = (subj, pred, obj) view of edges

Scale notes (100 TB / 10^12 turns):
- The ONLY wide exchanges are the two per-conversation windows (one
  shuffle each on conv_id; every edge family rides one of them —
  key-dedup, lag-mark and lead() share the same exchange). There is NO
  global edge dedup: a dropDuplicates over 10^12 edges would build a
  corpus-sized hash map and a third full shuffle (profiled as the
  hottest operator in the pipeline before removal). Linking is a
  broadcast join (zero shuffle of the mention table); canonicalization
  shuffles only the tiny entity edge set.
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
from gfftoneo4j_spark.operators.windows import (
    segmented_lag,
    segmented_lead,
    stable_turn_order,
)
from gfftoneo4j_spark.plans.checkpoint import StageCheckpointer
from gfftoneo4j_spark.plans.lineage import (
    lineage_for,
    per_partition_counts,
    score_histogram,
    union_lineage,
)


class StrictModeViolation(ValueError):
    """Raised by ``build_kg(..., strict=True)`` when any input row
    would be quarantined — the analogue of the reference's fail-fast
    parse (Application.scala:47 throws IllegalArgumentException on the
    first bad line). Carries the violation count and a bounded sample
    so the error is actionable without collecting the quarantine set."""

    def __init__(self, n_bad: int, sample: list[tuple]):
        self.n_bad = n_bad
        self.sample = sample
        super().__init__(
            f"strict mode: {n_bad} transcript row(s) failed the parse "
            f"contract (null/empty text or null turn_idx); first "
            f"{len(sample)} (conv_id, turn_idx): {sample}. Re-run with "
            f"strict=False to quarantine them to lineage instead."
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
    persist_intermediates: bool = False,
    segment_rows: int | None = None,
    strict: bool = False,
) -> KGResult:
    """``persist_intermediates`` caches ``linked`` for interactive
    sessions that act on many outputs (nodes AND edges AND metrics...).
    Off by default: building the columnar cache costs more than one
    recompute (measured at local[32]: +40s cache build vs 11s recompute
    of the extraction+linking plan), and production multi-output runs
    pass a ``checkpointer``, which materializes stages as parquet
    snapshots — the resumable, cluster-correct equivalent.

    ``strict=True`` raises :class:`StrictModeViolation` if any row
    fails the parse contract instead of quarantining it — the
    reference's abort-on-bad-line semantics (Application.scala:47) for
    invariant testing and data-quality gates; default ``False`` keeps
    the engine's quarantine-to-lineage behavior (quirk Q3)."""
    bad = (
        F.col("text").isNull()
        | (F.col("text") == "")
        | F.col("turn_idx").isNull()
    )
    quarantined = transcripts.where(bad)
    if strict:
        # Fail-fast data-quality gate (quirk Q3, Application.scala:47;
        # SURVEY §3.3). The limit(6) probe short-circuits: Spark stops
        # scanning once 6 violations surface, so a CLEAN corpus pays
        # one pushed-filter scan and a dirty one aborts early; the full
        # count runs only on the failure path.
        sample = [
            (r["conv_id"], r["turn_idx"])
            for r in quarantined.select("conv_id", "turn_idx").limit(6).collect()
        ]
        if sample:
            raise StrictModeViolation(quarantined.count(), sample[:5])
    # turns fans out into 4 edge/node families. Deliberately NOT
    # persisted: the source is columnar parquet, so each branch re-scans
    # only the columns it needs (pruned, ~free), while caching 10^12
    # text-bearing rows would pay columnar re-compression up front
    # (measured 63s for 4M rows at local[32] — slower than every
    # downstream branch combined) and then read *slower* than parquet.
    turns_raw = transcripts.where(~bad)
    turns = turns_raw.withColumn(
        "turn_id",
        F.concat_ws(":", F.lit("turn"), F.col("conv_id"), F.col("turn_idx")),
    )
    # id-string constructors, evaluated POST-shuffle everywhere below:
    # exchanges carry only (conv_id, turn_idx[, pos, ts]) — at 10^12 rows
    # the "turn:"/"mention:" prefixes and stringified ints would roughly
    # double the shuffled bytes (and cross executor sockets twice)
    _turn_id = F.concat_ws(":", F.lit("turn"), F.col("conv_id"), F.col("turn_idx"))
    _mention_id = F.concat_ws(
        ":", F.lit("mention"), F.col("conv_id"), F.col("turn_idx"), F.col("pos")
    )

    # --- structural + sequence edges in ONE window pass over turns:
    # lead() gives next_turn, the same row emits in_conv — a 2-struct
    # explode instead of two union branches re-shuffling turns.
    #
    # Edge uniqueness (the reference's `create unique`, Neo4JUtils.scala:43)
    # is enforced HERE, not by a global dropDuplicates: every edge family
    # is unique by construction once (conv_id, turn_idx) is unique, so we
    # dedup the *keys* with a lag() inside the window shuffle that already
    # exists (zero extra exchanges) and quarantine violators to lineage.
    # A global dropDuplicates on the edge set would build a
    # 10^12-entry string-keyed hash map + a full extra shuffle — measured
    # as the single hottest operator in the pipeline before removal
    # (FastHashMap.findOrInsert + copyMemory dominating task CPU).
    # Order by turn_idx alone: rows tied on (conv_id, turn_idx) build the
    # SAME turn_id string, so the survivor of the lag()-dedup and every
    # lead() target are invariant to tie order — carrying ts as a
    # tie-break would add 8 bytes x 10^12 rows to the pipeline's largest
    # exchange for zero semantic effect (the oracle agrees: its
    # (turn_idx, ts) sort yields key-identical survivors).
    #
    # segment_rows: mega-conversation hardening. A plain window puts a
    # whole conversation in ONE task; a 10^10-turn conversation is a
    # straggler/OOM. segmented_lead/lag (operators/windows.py)
    # range-split each conversation into turn_idx segments and stitch
    # boundaries through a tiny per-segment table — identical output
    # (pytest-asserted), bounded task size.
    turn_cols = turns_raw.select("conv_id", "turn_idx")
    if segment_rows:
        marked_turns = segmented_lag(
            turn_cols, "conv_id", ["turn_idx"], ["turn_idx"], segment_rows
        ).withColumnRenamed("prev_turn_idx", "prev_idx")
    else:
        w_turn = stable_turn_order(order=("turn_idx",))
        marked_turns = turn_cols.select(
            "conv_id",
            "turn_idx",
            F.lag("turn_idx").over(w_turn).alias("prev_idx"),
        )
    dup_turns = marked_turns.where(
        F.col("prev_idx") == F.col("turn_idx")
    ).select(_turn_id.alias("turn_id"), "conv_id")
    kept_turns = marked_turns.where(
        F.col("prev_idx").isNull() | (F.col("prev_idx") != F.col("turn_idx"))
    ).drop("prev_idx")
    if segment_rows:
        _next_turn_id = F.when(
            F.col("next_turn_idx").isNotNull(),
            F.concat_ws(
                ":", F.lit("turn"), F.col("conv_id"), F.col("next_turn_idx")
            ),
        )
        led_turns = segmented_lead(
            kept_turns, "conv_id", ["turn_idx"], ["turn_idx"], segment_rows
        ).select(
            _turn_id.alias("turn_id"), "conv_id", _next_turn_id.alias("next_id")
        )
    else:
        # same window spec over the same partitioning: Catalyst reuses
        # the exchange and the sort order survives the filter, so this
        # second window adds no shuffle
        led_turns = kept_turns.select(
            _turn_id.alias("turn_id"),
            "conv_id",
            F.lead(_turn_id).over(w_turn).alias("next_id"),
        )
    turn_edges = (
        led_turns
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
        turns_raw.select("conv_id", "turn_idx", F.explode(ms).alias("m"))
        .select(
            "conv_id",
            "turn_idx",
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

    # --- canonicalization (J4 -> CC) ------------------------------------
    canon = _canonicalize_entities(alias_dict)
    if checkpointer is not None:
        canon = checkpointer.stage("canon", canon, f"{fingerprint}:canon")
    linked = (
        lr.linked.join(
            F.broadcast(canon), lr.linked["entity_id"] == canon["node"], "left"
        )
        .withColumn("canonical_id", F.coalesce("component", "entity_id"))
        .drop("node", "component")
    )
    if checkpointer is not None:
        linked = checkpointer.stage(
            "linked", linked, f"{fingerprint}:link:{extraction}"
        )
    elif persist_intermediates:
        linked = linked.persist()

    # --- mention edge families in ONE window pass over linked ----------
    # The conv-wide lead() ordered by (turn_idx, pos) yields the `links`
    # chain; restricting it to same-turn successors yields the
    # `mentions_seq` chain (consecutive kept mentions within a turn) —
    # no second window shuffle. has_mention / refers_to ride the same
    # row via the 4-struct explode.
    mention_cols = linked.select("conv_id", "turn_idx", "pos", "canonical_id")
    if segment_rows:
        marked_mentions = (
            segmented_lag(
                mention_cols,
                "conv_id",
                ["turn_idx", "pos"],
                ["turn_idx", "pos"],
                segment_rows,
            )
            .withColumnRenamed("prev_turn_idx", "prev_t")
            .withColumnRenamed("prev_pos", "prev_p")
        )
    else:
        w_conv_m = stable_turn_order(part=("conv_id",), order=("turn_idx", "pos"))
        marked_mentions = mention_cols.select(
            "conv_id",
            "turn_idx",
            "pos",
            "canonical_id",
            F.lag("turn_idx").over(w_conv_m).alias("prev_t"),
            F.lag("pos").over(w_conv_m).alias("prev_p"),
        )
    dup_mentions = marked_mentions.where(
        (F.col("prev_t") == F.col("turn_idx")) & (F.col("prev_p") == F.col("pos"))
    ).select(_mention_id.alias("mention_id"))
    kept_mentions = marked_mentions.where(
        F.col("prev_t").isNull()
        | (F.col("prev_t") != F.col("turn_idx"))
        | (F.col("prev_p") != F.col("pos"))
    ).drop("prev_t", "prev_p")
    if segment_rows:
        _next_mention_id = F.when(
            F.col("next_turn_idx").isNotNull(),
            F.concat_ws(
                ":",
                F.lit("mention"),
                F.col("conv_id"),
                F.col("next_turn_idx"),
                F.col("next_pos"),
            ),
        )
        led_mentions = segmented_lead(
            kept_mentions,
            "conv_id",
            ["turn_idx", "pos"],
            ["turn_idx", "pos"],
            segment_rows,
        ).select(
            _turn_id.alias("turn_id"),
            "turn_idx",
            _mention_id.alias("mention_id"),
            "canonical_id",
            _next_mention_id.alias("next_m"),
            F.col("next_turn_idx").alias("next_t"),
        )
    else:
        led_mentions = kept_mentions.select(
            _turn_id.alias("turn_id"),
            "turn_idx",
            _mention_id.alias("mention_id"),
            "canonical_id",
            F.lead(_mention_id).over(w_conv_m).alias("next_m"),
            F.lead("turn_idx").over(w_conv_m).alias("next_t"),
        )
    mention_edges = (
        led_mentions
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

    # No dropDuplicates here: with (conv_id, turn_idx) and mention pos
    # deduped inside the window passes above, every family emits each
    # (src, dst, type) exactly once (next_turn/links: one lead per kept
    # row; in_conv/has_mention/refers_to/mentions_seq: one per kept
    # row). `create unique` write semantics for arbitrary inputs remain
    # available via dropDuplicates at the sink (see queries.dedup_on_write).
    edges = turn_edges.unionByName(mention_edges)
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
        _mention_id.alias("node_id"),
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
            lineage_for(dup_turns, "edges", "duplicate_turn_key", "turn_id"),
            lineage_for(dup_mentions, "edges", "duplicate_mention_key", "mention_id"),
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
        # id columns attached here only: consumers of the result get
        # them, while the edge plans above construct ids post-shuffle
        mentions_linked=linked.withColumn("turn_id", _turn_id).withColumn(
            "mention_id", _mention_id
        ),
        nodes=nodes,
        edges=edges,
        triples=triples,
        lineage=lineage,
        metrics=metrics,
    )
