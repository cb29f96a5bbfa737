"""Persisted graph sink: durable, partitioned ``nodes`` / ``edges``
tables with dedup-on-write.

This is the reference's entire point — materializing the graph
(GenesToNeo4j.scala:9-25 walks sequences/genes and CREATEs nodes and
edges; Neo4JUtils.scala:30-48 stringifies properties and enforces
`create unique` per edge). Spark-first re-expression:

- nodes/ parquet partitioned by ``label`` (4 labels), edges/ parquet
  partitioned by ``type`` (6 predicates) — per-label / per-predicate
  reads prune to one partition directory at any scale.
- `create unique` (K2) = ``dropDuplicates`` on the natural key BEFORE
  the write, not a server-side constraint: one shuffle keyed exactly
  like the write.
- Atomicity (K3, Neo4JUtils.scala:22-28's transaction bracket) =
  parquet overwrite + a ``_GRAPH_MANIFEST.json`` written only AFTER
  both tables commit, via the Hadoop FileSystem API (works for
  hdfs:// and s3a:// paths, not only driver-local ones). A torn run
  never looks complete; Iceberg's ``writeTo(...).append()`` is the
  drop-in upgrade when that runtime is on the cluster.
- ``triples`` is a pure column-rename of ``edges`` — at 10^12 edges
  materializing it twice would double the largest table for zero new
  information, so readers get it as a projection (``read_graph``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfftoneo4j_spark.plans.checkpoint import _fs, fs_read_json, fs_write_json

GRAPH_MANIFEST = "_GRAPH_MANIFEST.json"


def write_graph(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    fingerprint: str = "default",
) -> dict:
    """Write ``{path}/nodes`` (partitioned by label) and ``{path}/edges``
    (partitioned by type), dedup-on-write, manifest-last. Returns the
    manifest dict."""
    path = path.rstrip("/")
    spark = nodes.sparkSession
    # Rewrite atomicity: the manifest lives OUTSIDE the table dirs, so
    # on a REwrite the old manifest would survive while nodes/ is
    # overwritten first and edges/ second — a crash between the two
    # overwrites would leave a valid-looking manifest over a
    # mixed-version graph (new nodes, old edges). Invalidate it FIRST:
    # a torn rewrite is then detectable exactly like a torn first write.
    fs, mpath = _fs(spark, f"{path}/{GRAPH_MANIFEST}")
    if fs.exists(mpath):
        fs.delete(mpath, False)
    # K2 `create unique`: unique by natural key at the sink boundary.
    # r06: repartition by (partition col, natural key) pinned to the
    # core count — keying on the partition column ALONE collapsed the
    # write to one task per label/type (a 30 TB type would be one
    # straggler at scale; measured 3-task serial writes at sf0.1).
    # Each task now writes at most one file per directory it holds, so
    # files per directory are bounded by the task count and file size
    # tracks data/cores (guide §6 sizing).
    n_par = spark.sparkContext.defaultParallelism
    (
        nodes.dropDuplicates(["node_id"])
        .repartition(n_par, "label", "node_id")
        .write.mode("overwrite")
        .partitionBy("label")
        .parquet(f"{path}/nodes")
    )
    (
        edges.dropDuplicates(["src", "dst", "type"])
        .repartition(n_par, "type", "src")
        .write.mode("overwrite")
        .partitionBy("type")
        .parquet(f"{path}/edges")
    )
    manifest = {"fingerprint": fingerprint, "tables": ["nodes", "edges"]}
    fs_write_json(spark, f"{path}/{GRAPH_MANIFEST}", manifest)
    return manifest


class GraphTables:
    def __init__(self, nodes: DataFrame, edges: DataFrame):
        self.nodes = nodes
        self.edges = edges

    @property
    def triples(self) -> DataFrame:
        return self.edges.select(
            F.col("src").alias("subj"),
            F.col("type").alias("pred"),
            F.col("dst").alias("obj"),
        )


def write_bucketed_graph(
    nodes: DataFrame,
    edges: DataFrame,
    table_prefix: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Bucketed variant of the sink for JOIN-heavy consumers.

    The partitioned layout (write_graph) prunes per-label/per-type
    scans, but every graph JOIN — edges x nodes attribute lookup,
    edges x edges multi-hop — still re-shuffles the edge table, and at
    10^12 edges that shuffle dominates every downstream query.
    ``bucketBy`` pre-pays it ONCE at write: ``<prefix>_nodes`` buckets
    + sorts on node_id, ``<prefix>_edges`` on src, with the same
    bucket count, so Catalyst plans bucket-local SortMergeJoins with
    ZERO Exchange on either side (asserted by
    tests/test_bucketed_sink.py). Dedup-on-write (K2) rides the
    bucketing shuffle itself.

    Requires saveAsTable (bucket metadata lives in the catalog — the
    in-memory catalog locally, a metastore on a cluster); ``path``
    makes the tables external. Pick ``n_buckets`` so one bucket is
    100-500 MB at the target scale: ~4096 for a 10^12-edge graph.
    """
    spark = nodes.sparkSession
    for name, df, key in (
        ("nodes", nodes.dropDuplicates(["node_id"]), "node_id"),
        ("edges", edges.dropDuplicates(["src", "dst", "type"]), "src"),
    ):
        table = f"{table_prefix}_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        w = df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
        if path:
            w = w.option("path", f"{path.rstrip('/')}/{name}")
        w.saveAsTable(table)


def read_graph(spark: SparkSession, path: str) -> GraphTables:
    """Read a written graph back; raises if the manifest is absent
    (i.e. the writing run tore before committing both tables)."""
    path = path.rstrip("/")
    m = fs_read_json(spark, f"{path}/{GRAPH_MANIFEST}")
    if m is None:
        raise FileNotFoundError(
            f"{path} has no {GRAPH_MANIFEST}: graph write never completed"
        )
    return GraphTables(
        nodes=spark.read.parquet(f"{path}/nodes"),
        edges=spark.read.parquet(f"{path}/edges"),
    )


# ---------------------------------------------------------------------------
# Snapshot-versioned sink (Iceberg-style pointer-swap commits)
# ---------------------------------------------------------------------------

SNAPSHOT_MANIFEST = "_SNAPSHOTS.json"


def _write_manifest_atomic(spark: SparkSession, path: str, obj: dict) -> None:
    """Create-temp-then-rename-over: FileContext.rename with
    Options.Rename.OVERWRITE replaces the live manifest in one
    operation on HDFS/local, so a concurrent reader always sees either
    the old or the new manifest — never the missing-manifest window a
    delete-then-rename opens. On S3A, rename is client-side copy+delete
    (no server-side atomic rename), so the guarantee weakens to
    "readers may briefly see the old manifest during the copy" — still
    never a missing or half-written one, since the copy itself is a
    single-object PUT. FileSystem delete+rename remains as the fallback
    for filesystems without a FileContext implementation."""
    fs, final = _fs(spark, path)
    tmp = f"{path}.tmp"
    fs_write_json(spark, tmp, obj)
    fs2, tpath = _fs(spark, tmp)
    try:
        jvm = spark._jvm
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            final.toUri(), spark._jsc.hadoopConfiguration()
        )
        rename_cls = getattr(jvm.org.apache.hadoop.fs, "Options$Rename")
        opts = spark.sparkContext._gateway.new_array(rename_cls, 1)
        opts[0] = rename_cls.OVERWRITE
        fc.rename(tpath, final, opts)
    except Exception:
        # e.g. an FS scheme with no AbstractFileSystem binding: fall
        # back to the non-atomic window rather than failing the commit
        if fs.exists(final):
            fs.delete(final, False)
        fs2.rename(tpath, final)


def _snapshots(spark: SparkSession, path: str) -> dict:
    m = fs_read_json(spark, f"{path.rstrip('/')}/{SNAPSHOT_MANIFEST}")
    return m or {"current": None, "versions": {}}


def write_graph_snapshot(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    fingerprint: str = "default",
) -> dict:
    """Commit a NEW immutable snapshot and atomically swap the current
    pointer to it — the Iceberg commit model over plain parquet.

    Unlike :func:`write_graph` (overwrite-in-place), concurrent readers
    of any existing snapshot are never disturbed: data lands in a fresh
    ``v<N>/`` directory first, and the ONLY mutation visible to readers
    is the single atomic manifest rename at the end. A crash mid-write
    leaves an orphan v<N> directory the next commit skips past (version
    numbers are taken from max(manifest, existing dirs) + 1), never a
    readable-but-torn graph. Old snapshots remain time-travel readable
    until expire_graph_snapshots.
    """
    path = path.rstrip("/")
    spark = nodes.sparkSession
    man = _snapshots(spark, path)
    used = {int(v) for v in man["versions"]}
    fs, root = _fs(spark, path)
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                used.add(int(name[1:]))
    version = (max(used) + 1) if used else 1
    vdir = f"{path}/v{version}"
    # r06: (partition col, natural key) spread — see write_graph
    n_par = spark.sparkContext.defaultParallelism
    (
        nodes.dropDuplicates(["node_id"])
        .repartition(n_par, "label", "node_id")
        .write.mode("errorifexists")
        .partitionBy("label")
        .parquet(f"{vdir}/nodes")
    )
    (
        edges.dropDuplicates(["src", "dst", "type"])
        .repartition(n_par, "type", "src")
        .write.mode("errorifexists")
        .partitionBy("type")
        .parquet(f"{vdir}/edges")
    )
    man["versions"][str(version)] = {"fingerprint": fingerprint}
    man["current"] = version
    _write_manifest_atomic(spark, f"{path}/{SNAPSHOT_MANIFEST}", man)
    return {"version": version, **man["versions"][str(version)]}


def read_graph_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> GraphTables:
    """Read the current snapshot, or time-travel to ``version``."""
    path = path.rstrip("/")
    man = _snapshots(spark, path)
    v = version if version is not None else man["current"]
    if v is None or str(v) not in man["versions"]:
        raise FileNotFoundError(
            f"{path}: no committed snapshot v{v} (committed: "
            f"{sorted(man['versions'])})"
        )
    return GraphTables(
        nodes=spark.read.parquet(f"{path}/v{v}/nodes"),
        edges=spark.read.parquet(f"{path}/v{v}/edges"),
    )


def rollback_graph(spark: SparkSession, path: str, version: int) -> dict:
    """Point current back at an older committed snapshot — one atomic
    manifest swap, no data movement."""
    path = path.rstrip("/")
    man = _snapshots(spark, path)
    if str(version) not in man["versions"]:
        raise ValueError(f"cannot roll back to uncommitted v{version}")
    man["current"] = version
    _write_manifest_atomic(spark, f"{path}/{SNAPSHOT_MANIFEST}", man)
    return man


def expire_graph_snapshots(
    spark: SparkSession, path: str, keep: int = 2
) -> list[int]:
    """GC: drop all but the newest ``keep`` committed snapshots (the
    current one is always kept). Orphan dirs from torn writes (present
    on disk, absent from the manifest) are removed too. Returns the
    deleted version numbers."""
    path = path.rstrip("/")
    man = _snapshots(spark, path)
    committed = sorted(int(v) for v in man["versions"])
    # keep<=0 must mean "keep nothing but current": committed[-0:] is
    # the WHOLE list, the exact opposite of the request
    newest = set(committed[-keep:]) if keep > 0 else set()
    keep_set = newest | ({man["current"]} - {None})
    fs, root = _fs(spark, path)
    deleted: list[int] = []
    on_disk: set[int] = set()
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not (name.startswith("v") and name[1:].isdigit()):
                continue
            v = int(name[1:])
            if v in keep_set:
                on_disk.add(v)
                continue
            fs.delete(st.getPath(), True)
            deleted.append(v)
            man["versions"].pop(str(v), None)
    # prune manifest entries whose v-dirs are already gone from disk
    # (e.g. removed out-of-band): a dangling entry would advertise a
    # time-travel target that can only raise on read. Never prune
    # current — a missing current dir is corruption worth surfacing.
    for v in committed:
        if v not in on_disk and v != man["current"] and str(v) in man["versions"]:
            man["versions"].pop(str(v), None)
    _write_manifest_atomic(spark, f"{path}/{SNAPSHOT_MANIFEST}", man)
    return sorted(deleted)


def diff_snapshots(
    spark: SparkSession, path: str, v_old: int, v_new: int
) -> DataFrame:
    """Edge-level diff between two committed snapshots: one row per
    added ('A') or removed ('R') edge. Two anti-joins on the natural
    edge key — each a single shuffle, no full sort, no collect; at
    10^12 edges this is the audit/debug primitive that answers "what
    did last night's ingest change" without replaying the ingest."""
    old = read_graph_snapshot(spark, path, v_old).edges.select(
        "src", "dst", "type"
    )
    new = read_graph_snapshot(spark, path, v_new).edges.select(
        "src", "dst", "type"
    )
    key = ["src", "dst", "type"]
    added = new.join(old, key, "left_anti").select(
        F.lit("A").alias("op"), *key
    )
    removed = old.join(new, key, "left_anti").select(
        F.lit("R").alias("op"), *key
    )
    return added.unionByName(removed)


EXPORT_FORMATS = ("jsonl", "csv", "parquet")


def export_graph(
    tables: GraphTables, path: str, fmt: str = "jsonl"
) -> None:
    """Interchange export of a graph: ``{path}/nodes`` + ``{path}/edges``
    as JSONL, CSV (with header), or parquet — the hand-off surface to
    consumers that are not Spark (a Neo4j bulk importer, a viz tool, a
    pandas notebook). Distributed writers, one file per task; schemas
    stay flat so every format round-trips losslessly."""
    if fmt not in EXPORT_FORMATS:
        raise ValueError(f"fmt must be one of {EXPORT_FORMATS}, got {fmt!r}")
    for name, df in (("nodes", tables.nodes), ("edges", tables.edges)):
        w = df.write.mode("overwrite")
        target = f"{path.rstrip('/')}/{name}"
        if fmt == "jsonl":
            w.json(target)
        elif fmt == "csv":
            w.option("header", True).csv(target)
        else:
            w.parquet(target)


def import_graph(
    spark: SparkSession, path: str, fmt: str = "jsonl"
) -> GraphTables:
    """Read an exported graph back. CSV/JSONL carry no types, so the
    reader re-applies the graph schema explicitly (inferSchema on
    100 TB means a full extra pass — never rely on it)."""
    if fmt not in EXPORT_FORMATS:
        raise ValueError(f"fmt must be one of {EXPORT_FORMATS}, got {fmt!r}")

    def _read(name: str, schema: str) -> DataFrame:
        target = f"{path.rstrip('/')}/{name}"
        if fmt == "jsonl":
            return spark.read.schema(schema).json(target)
        if fmt == "csv":
            return spark.read.option("header", True).schema(schema).csv(target)
        return spark.read.parquet(target)

    nodes = _read("nodes", "node_id string, label string, props string")
    edges = _read("edges", "src string, dst string, type string")
    return GraphTables(nodes=nodes, edges=edges)
