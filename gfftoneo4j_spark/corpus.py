"""Deterministic synthetic transcript corpus generator.

Produces the engine's primary input shape (BASELINE.json ``input_hint``):

    transcripts(conv_id string, turn_idx int32, role string,
                text string, tool string?, ts timestamp)

plus the broadcast ``alias_dict`` (FIXTURES.md §3):

    alias_dict(alias string, entity_id string, entity_type string,
               parent_id string?)

Turn text embeds mention markers ``<<m:ALIAS>>`` — the transcript
analogue of the GFF attribute grammar the reference parses
(/root/reference/src/main/scala/corwur/gffparser/GffParser.scala:75-100).
Everything is seeded (numpy Generator); no wall-clock, no external data.

Skew knobs mirror the north_rule's hazards: a Zipf tail of hot entities
and a mega-conversation tail (a few conversations orders of magnitude
longer than the median).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "python", "browser", None)
FILLER = (
    "the quick analysis shows that we should consider".split()
    + "please run check result output data model graph query".split()
)

EPOCH = datetime(2024, 1, 1)


@dataclass
class CorpusConfig:
    n_conversations: int = 100
    mean_turns: int = 8
    n_entities: int = 50
    aliases_per_entity: int = 2
    mention_rate: float = 0.7  # P(turn has >=1 mention)
    max_mentions_per_turn: int = 4
    zipf_a: float = 1.5  # hot-entity skew
    mega_conv_frac: float = 0.02  # fraction of convs with ~50x turns
    unknown_alias_rate: float = 0.05  # mentions with no dict entry (lineage path)
    ambiguous_alias_rate: float = 0.03  # aliases mapping to 2 entities (Q9 analogue)
    parent_chain_frac: float = 0.3  # entities that are duplicates of another
    quarantine_rate: float = 0.01  # turns with empty text (Q3 analogue)
    seed: int = 42


def make_alias_dict(cfg: CorpusConfig) -> list[dict]:
    """Entity/alias rows. ``parent_id`` chains (depth>=1, incl. chains of
    chains) drive the connected-components canonicalization stage —
    the analogue of the reference's transitive parent walk
    (GeneReader.scala:165-175)."""
    rng = np.random.default_rng(cfg.seed + 1)
    rows: list[dict] = []
    ents = [f"E{i:04d}" for i in range(cfg.n_entities)]
    for i, ent in enumerate(ents):
        parent = None
        if i > 0 and rng.random() < cfg.parent_chain_frac:
            # point at a random earlier entity -> forests, chains depth>=1
            parent = ents[int(rng.integers(0, i))]
        etype = ["entity", "topic", "tool"][i % 3]
        for a in range(cfg.aliases_per_entity):
            rows.append(
                {
                    "alias": f"{ent.lower()}_a{a}",
                    "entity_id": ent,
                    "entity_type": etype,
                    "parent_id": parent,
                }
            )
    # ambiguous aliases: one surface form -> two entities (dropped w/ lineage,
    # mirroring the exactly-one-gene rule, GeneReader.scala:210-218)
    n_amb = max(0, int(cfg.n_entities * cfg.ambiguous_alias_rate))
    for j in range(n_amb):
        e1, e2 = ents[j % len(ents)], ents[(j * 7 + 1) % len(ents)]
        if e1 == e2:
            continue
        rows.append({"alias": f"amb_{j}", "entity_id": e1, "entity_type": "entity", "parent_id": None})
        rows.append({"alias": f"amb_{j}", "entity_id": e2, "entity_type": "entity", "parent_id": None})
    return rows


def make_transcripts(cfg: CorpusConfig) -> list[dict]:
    rng = np.random.default_rng(cfg.seed)
    dict_rows = make_alias_dict(cfg)
    aliases = sorted({r["alias"] for r in dict_rows})
    rows: list[dict] = []
    for c in range(cfg.n_conversations):
        conv_id = f"conv{c:06d}"
        n_turns = 1 + int(rng.poisson(cfg.mean_turns))
        if rng.random() < cfg.mega_conv_frac:
            n_turns *= 50  # mega-conversation skew tail
        t0 = EPOCH + timedelta(minutes=int(rng.integers(0, 500_000)))
        for i in range(n_turns):
            role = ROLES[i % 3 if rng.random() < 0.9 else int(rng.integers(0, 3))]
            tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else None
            if rng.random() < cfg.quarantine_rate:
                text = ""  # quarantine path (reference aborts; we quarantine, Q3)
            else:
                words = list(rng.choice(FILLER, size=int(rng.integers(3, 10))))
                if rng.random() < cfg.mention_rate:
                    k = 1 + int(rng.integers(0, cfg.max_mentions_per_turn))
                    for _ in range(k):
                        if rng.random() < cfg.unknown_alias_rate:
                            alias = f"ghost_{int(rng.integers(0, 1000))}"
                        else:
                            # Zipf-hot entities: small ranks dominate
                            r = min(int(rng.zipf(cfg.zipf_a)) - 1, len(aliases) - 1)
                            alias = aliases[r]
                        pos = int(rng.integers(0, len(words) + 1))
                        words.insert(pos, f"<<m:{alias}>>")
                text = " ".join(words)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": i,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": t0 + timedelta(seconds=30 * i),
                }
            )
    return rows


def make_transcripts_fast(
    n_turns: int,
    n_entities: int = 200,
    turns_per_conv: int = 20,
    seed: int = 42,
    unknown_alias_rate: float = 0.03,
    mention_rate: float = 0.8,
    conv_base: int = 0,
):
    """Vectorized generator for scale benchmarks: builds ``n_turns`` rows
    in numpy/pandas (no per-row Python loop), same schema and marker
    grammar as make_transcripts. Returns a pandas DataFrame.

    Skew is built in: entity popularity is Zipf, and conversation 0 is a
    mega-conversation holding ~1% of all turns (north_rule hazards).
    """
    import pandas as pd

    rng = np.random.default_rng(seed)
    mega = max(turns_per_conv, n_turns // 100)  # mega-conversation tail
    rest = n_turns - mega
    n_conv = max(1, rest // turns_per_conv)
    conv_sizes = np.full(n_conv + 1, turns_per_conv, dtype=np.int64)
    conv_sizes[0] = mega
    conv_sizes[-1] = rest - turns_per_conv * (n_conv - 1)
    conv_sizes = conv_sizes[conv_sizes > 0]
    conv_id = np.repeat(np.arange(len(conv_sizes)), conv_sizes)
    # per-conversation 0..k-1 turn index without a Python loop
    starts = np.concatenate(([0], np.cumsum(conv_sizes)[:-1]))
    turn_idx = (np.arange(conv_id.size) - np.repeat(starts, conv_sizes)).astype(
        np.int32
    )

    aliases = np.array([f"e{i:05d}_a0" for i in range(n_entities)])
    zipf = np.minimum(rng.zipf(1.3, size=conv_id.size) - 1, n_entities - 1)
    alias = aliases[zipf]
    ghost = rng.random(conv_id.size) < unknown_alias_rate
    alias = np.where(ghost, "ghost_x", alias)
    has_mention = rng.random(conv_id.size) < mention_rate

    phrases = np.array(
        [" ".join(rng.choice(FILLER, size=6)) for _ in range(512)]
    )
    base = phrases[rng.integers(0, len(phrases), size=conv_id.size)]
    text = pd.Series(base)
    marked = text + " <<m:" + pd.Series(alias) + ">> " + text
    text = pd.Series(np.where(has_mention, marked, text))

    roles = np.array(ROLES)[turn_idx % 3]
    ts = pd.Timestamp(EPOCH) + pd.to_timedelta(
        conv_id * 3600 + turn_idx * 30, unit="s"
    )
    return pd.DataFrame(
        {
            # vectorized zero-pad: a per-row f-string lambda costs ~60s
            # at 64M rows; conv_base keeps ids disjoint across blocks
            "conv_id": "conv"
            + pd.Series(conv_id + conv_base).astype("string").str.zfill(9),
            "turn_idx": turn_idx,
            "role": roles,
            "text": text,
            "tool": pd.Series([None] * conv_id.size, dtype="object"),
            "ts": ts,
        }
    )


def fast_alias_dict(n_entities: int = 200, parent_chain_frac: float = 0.3, seed: int = 42):
    """Dictionary matching make_transcripts_fast's alias space."""
    rng = np.random.default_rng(seed + 1)
    rows = []
    ents = [f"E{i:05d}" for i in range(n_entities)]
    for i, ent in enumerate(ents):
        parent = (
            ents[int(rng.integers(0, i))]
            if i > 0 and rng.random() < parent_chain_frac
            else None
        )
        rows.append(
            {
                "alias": f"e{i:05d}_a0",
                "entity_id": ent,
                "entity_type": "entity",
                "parent_id": parent,
            }
        )
    return rows


def write_corpus_fast(
    out_dir: str,
    n_turns: int,
    n_entities: int = 200,
    seed: int = 42,
    rows_per_file: int = 250_000,
    row_group_size: int = 50_000,
    block_rows: int = 4_000_000,
) -> tuple[str, str]:
    """Write a large benchmark corpus as multiple parquet files with
    small row groups (~1.3MB) so the Spark scan can be split to any
    parallelism level — the local stand-in for the tens of thousands of
    natural splits a 100 TB table has.

    Generation is blocked at ``block_rows`` per block (bounded memory,
    progress visible as files land); conversation ids are disjoint
    across blocks via ``conv_base``."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t_dir = os.path.join(out_dir, "transcripts.parquet")
    d_path = os.path.join(out_dir, "alias_dict.parquet")
    os.makedirs(t_dir, exist_ok=True)
    for f in os.listdir(t_dir):  # never mix with a stale corpus
        os.unlink(os.path.join(t_dir, f))
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    file_no = 0
    for b, blo in enumerate(range(0, n_turns, block_rows)):
        n_block = min(block_rows, n_turns - blo)
        pdf = make_transcripts_fast(
            n_block,
            n_entities=n_entities,
            seed=seed + b,
            conv_base=b * 10_000_000,
        )
        for lo in range(0, len(pdf), rows_per_file):
            chunk = pdf.iloc[lo : lo + rows_per_file]
            pq.write_table(
                pa.Table.from_pandas(chunk, schema=schema, preserve_index=False),
                os.path.join(t_dir, f"part-{file_no:04d}.parquet"),
                row_group_size=row_group_size,
            )
            file_no += 1
        del pdf
    d_schema = pa.schema(
        [
            pa.field("alias", pa.string()),
            pa.field("entity_id", pa.string()),
            pa.field("entity_type", pa.string()),
            pa.field("parent_id", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(fast_alias_dict(n_entities, seed=seed), schema=d_schema),
        d_path,
    )
    return t_dir, d_path


def write_corpus(out_dir: str, cfg: CorpusConfig | None = None) -> tuple[str, str]:
    """Write transcripts.parquet + alias_dict.parquet under ``out_dir``
    (pyarrow — generation shouldn't occupy the Spark cluster)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    cfg = cfg or CorpusConfig()
    os.makedirs(out_dir, exist_ok=True)
    t_rows = make_transcripts(cfg)
    d_rows = make_alias_dict(cfg)
    t_schema = pa.schema(
        [
            pa.field("conv_id", pa.string(), nullable=False),
            pa.field("turn_idx", pa.int32(), nullable=False),
            pa.field("role", pa.string(), nullable=False),
            pa.field("text", pa.string(), nullable=True),
            pa.field("tool", pa.string(), nullable=True),
            pa.field("ts", pa.timestamp("us"), nullable=False),
        ]
    )
    d_schema = pa.schema(
        [
            pa.field("alias", pa.string(), nullable=False),
            pa.field("entity_id", pa.string(), nullable=False),
            pa.field("entity_type", pa.string(), nullable=False),
            pa.field("parent_id", pa.string(), nullable=True),
        ]
    )
    t_path = os.path.join(out_dir, "transcripts.parquet")
    d_path = os.path.join(out_dir, "alias_dict.parquet")
    pq.write_table(pa.Table.from_pylist(t_rows, schema=t_schema), t_path)
    pq.write_table(pa.Table.from_pylist(d_rows, schema=d_schema), d_path)
    return t_path, d_path
