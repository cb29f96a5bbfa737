"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: broadcast the (small) query set against the
  full corpus; the corpus side never shuffles, top-k is a per-query
  window. The baseline — exact, O(|Q| * N).
- LSH-bucketed ANN: sign-bit buckets from fixed hyperplanes; candidate
  generation is an equi-join on bucket id, so the pair space is N/2^b
  per query instead of N. The 100 TB scale path (IVF-style: probe one
  bucket; recall traded for a 2^b fan-in reduction).

Dot products run JVM-side via zip_with + aggregate over array<double>
(no Python, no UDF). Scores are rounded before ranking so results are
reproducible across engines (fp-sum-order differences live far below
the rounding grain).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def n_planes_for(
    n_vectors: int, target_bucket_size: int = 1024, lo: int = 2, hi: int = 30
) -> int:
    """Hyperplane count scaled to the corpus: b ≈ log2(N / target) so
    the expected bucket holds ~``target_bucket_size`` vectors and the
    per-bucket self-join stays bounded as N grows. A FIXED b silently
    degenerates toward all-pairs: 16 buckets over 10^9 vectors is a
    cartesian in disguise."""
    if n_vectors <= target_bucket_size:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_vectors / target_bucket_size))))


def make_planes(
    spark, n_planes: int, dim: int, seed: int = 42, method: str = "gaussian"
) -> DataFrame:
    """Deterministic pseudo-random hyperplanes (plane_idx, plane) —
    tiny, driver-built, always broadcast. Pair with ``n_planes_for`` so
    bucket count tracks corpus size.

    ``method="gaussian"``: spherically-uniform numpy normals — the
    default for production recall.
    ``method="md5_rademacher"``: ±1 components from md5 digit parity,
    h[j][i] = +1 iff the first hex digit of md5("seed:j:i") >= '8'
    (i 1-based). Rademacher planes are valid sign-LSH hyperplanes
    (Achlioptas-style sparse projections), and — unlike numpy
    normals — any SQL engine with md5/substr reproduces them exactly,
    so the corpus-SCALED blocking path itself can face the DuckDB
    correctness gate (see queries.ann_scaled_topk)."""
    if method == "md5_rademacher":
        import hashlib

        rows = [
            (
                j,
                [
                    1.0
                    if hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[0] >= "8"
                    else -1.0
                    for i in range(1, dim + 1)
                ],
            )
            for j in range(n_planes)
        ]
        return spark.createDataFrame(rows, "plane_idx int, plane array<double>")
    if method != "gaussian":
        raise ValueError(f"unknown plane method {method!r}")
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = [
        (j, [float(x) for x in rng.standard_normal(dim)]) for j in range(n_planes)
    ]
    return spark.createDataFrame(rows, "plane_idx int, plane array<double>")


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left fold over the zipped arrays — deterministic
    summation order (unlike a shuffle-order SUM)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 3,
) -> DataFrame:
    """Exact top-k neighbors for each query id.

    ``query_ids`` is a 1-column DF of ids (small -> broadcast). Returns
    (query_id, neighbor_id, score, rank); rank ties broken by
    neighbor_id after rounding, so the ordering is total."""
    base = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q = emb.join(query_ids, emb[id_col] == query_ids[id_col], "left_semi").select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("v")), round_to).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_buckets(
    emb: DataFrame,
    planes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit LSH bucket per vector: bit j = (v . h_j > 0).

    ``planes`` carries (plane_idx int, plane array) — a handful of rows,
    broadcast; the bucket id is the order-free weighted sum of sign
    bits, one groupBy."""
    p = planes.select(
        F.col("plane_idx"), _as_double(F.col("plane")).alias("h")
    )
    v = emb.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    bits = v.crossJoin(F.broadcast(p)).select(
        "id",
        F.when(
            dot(F.col("v"), F.col("h")) > 0,
            F.pow(F.lit(2.0), F.col("plane_idx")).cast("int"),
        )
        .otherwise(F.lit(0))
        .alias("bit"),
    )
    return bits.groupBy("id").agg(F.sum("bit").cast("int").alias("bucket"))


def near_dup_pairs(
    emb: DataFrame,
    planes: DataFrame,
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked: the pair
    space is per-bucket (N/2^b per side), never corpus-quadratic.
    Identical vectors always share a bucket, so exact dups are never
    missed; near-dups are missed only when a hyperplane splits them
    (recall tunable via number of planes). Returns
    (id_a, id_b, score) with id_a < id_b."""
    from gfftoneo4j_spark.operators.dedup import bucket_candidate_pairs

    buckets = hyperplane_buckets(emb, planes, id_col, vec_col)
    # r06: candidate pairs from the (id, bucket) table ALONE (shared
    # salted/pinned self-join — a hot bucket can no longer serialize
    # its quadratic emission into one task), vectors re-attached per
    # pair so the arrays never ride the bucket join. unique=True: one
    # bucket per vector, so pairs can't repeat — no dedup shuffle.
    cand = bucket_candidate_pairs(buckets, ["bucket"], unique=True)
    v = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_to).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def _query_probes(
    emb: DataFrame,
    query_ids: DataFrame,
    planes: DataFrame,
    n_probes: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(query_id, qv, bucket) with ``1 + n_probes`` probe rows per query:
    the home bucket plus buckets reached by flipping the ``n_probes``
    LOWEST-MARGIN sign bits (smallest |v·h| — the planes the vector sits
    closest to, where its true neighbors most likely fell on the other
    side). Multi-probe recovers the recall a single-probe LSH loses
    without adding planes or copies of the corpus."""
    q = emb.join(query_ids, emb[id_col] == query_ids[id_col], "left_semi").select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    p = planes.select("plane_idx", _as_double(F.col("plane")).alias("h"))
    dots = q.crossJoin(F.broadcast(p)).select(
        "query_id",
        "qv",
        "plane_idx",
        dot(F.col("qv"), F.col("h")).alias("dp"),
    )
    home = dots.groupBy("query_id").agg(
        F.first("qv").alias("qv"),
        F.sum(
            F.when(
                F.col("dp") > 0, F.pow(F.lit(2.0), F.col("plane_idx")).cast("int")
            ).otherwise(F.lit(0))
        )
        .cast("int")
        .alias("bucket"),
    )
    if n_probes <= 0:
        return home
    wq = Window.partitionBy("query_id").orderBy(F.abs(F.col("dp")), "plane_idx")
    flips = (
        dots.withColumn("margin_rank", F.row_number().over(wq))
        .where(F.col("margin_rank") <= n_probes)
        .select(
            "query_id",
            F.pow(F.lit(2.0), F.col("plane_idx")).cast("int").alias("flip_bit"),
        )
        .join(home.select("query_id", "qv", "bucket"), "query_id")
        .select(
            "query_id",
            "qv",
            F.col("bucket").bitwiseXOR(F.col("flip_bit")).alias("bucket"),
        )
    )
    return home.unionByName(flips)


def lsh_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    planes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 3,
    n_probes: int = 0,
) -> DataFrame:
    """ANN: exact cosine ranking restricted to the query's LSH bucket(s).

    ``n_probes`` > 0 additionally probes the buckets across the query's
    lowest-margin hyperplanes (see _query_probes); candidates are
    deduped before scoring so fan-in grows by at most (1+n_probes)x."""
    buckets = hyperplane_buckets(emb, planes, id_col, vec_col)
    base = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v")
    ).join(buckets.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
    q = _query_probes(emb, query_ids, planes, n_probes, id_col, vec_col)
    scored = (
        base.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        # a candidate reachable through several probe buckets scores once
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("v")), round_to).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 3,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine (ties broken by smallest c_id).

    ``centroids`` carries (c_id int, centroid array) — a handful of
    rows, broadcast. The argmax is a map-side-combinable groupBy max
    over struct(score, -c_id): one unamplified shuffle on the vector
    id, no corpus-wide window sort. At 100 TB the assignment is the
    cheap pass you materialize once (bucketBy(c_id)) so every probe
    afterwards is partition-pruned.
    """
    c = centroids.select("c_id", _as_double(F.col("centroid")).alias("cv"))
    scored = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).crossJoin(F.broadcast(c)).select(
        "id",
        "c_id",
        F.round(cosine(F.col("v"), F.col("cv")), round_to).alias("cs"),
    )
    best = scored.groupBy("id").agg(
        F.max(F.struct(F.col("cs"), (-F.col("c_id")).alias("neg_c"))).alias("m")
    )
    return best.select("id", (-F.col("m.neg_c")).cast("int").alias("c_id"))


def train_centroids_kmeans(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    round_to: int = 3,
) -> DataFrame:
    """Deterministic in-engine k-means for the IVF coarse quantizer —
    the piece that makes the IVF family self-contained (previously the
    caller had to supply centroids from an offline job).

    Bit-exact across engines, runs, and cluster sizes, by the same two
    devices the other gated iterative operators use:

    - assignment = ``ivf_assign`` (cosine rounded to ``round_to`` before
      the argmax, ties to the smallest c_id) — fp-sum-order noise lives
      far below the rounding grain;
    - the centroid UPDATE is integer fixed-point (pagerank_fixed_point's
      discipline): components scale by ``scale``, truncate to BIGINT,
      sum (order-free, exact), then integer-divide by the member count.
      A double-precision mean would depend on distributed summation
      order and could flip a rounded cosine on the next assignment.

    Seeding: the ``k`` vectors with the smallest
    ``md5(seed || ':' || id)`` (ties by id) — a deterministic uniform
    draw both engines can reproduce; Spark executes the orderBy+limit
    as TakeOrdered (per-partition top-k, no global sort shuffle).

    Per iteration: one broadcast assignment pass + one
    map-side-combinable groupBy on (c_id, dim) — k*dim rows out, which
    collapse to the driver (centroids are broadcast-sized by
    definition). Empty clusters keep their previous centroid.
    Returns (c_id int, centroid array<double>).
    """
    spark = emb.sparkSession
    seed_rows = (
        emb.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .orderBy(F.md5(F.concat(F.lit(f"{seed}:"), F.col("id").cast("string"))), "id")
        .limit(k)
        .collect()
    )
    cents = [(i, list(r["v"])) for i, r in enumerate(seed_rows)]
    cent_schema = "c_id int, centroid array<double>"
    for _ in range(iters):
        cdf = spark.createDataFrame(cents, cent_schema)
        assign = ivf_assign(emb, cdf, id_col, vec_col, round_to)
        comp = (
            emb.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
            .join(assign, "id")
            .select("c_id", F.posexplode("v").alias("pos", "x"))
            .select(
                "c_id",
                "pos",
                (F.col("x") * scale).cast("long").alias("fx"),
            )
            .groupBy("c_id", "pos")
            .agg(F.sum("fx").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "c_id",
                "pos",
                # integer truncating division — Spark `div` and DuckDB
                # `//` agree (both round toward zero), so the oracle
                # reproduces the update bit-for-bit
                F.expr("s div n").alias("q"),
            )
            .groupBy("c_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "q"))),
                    lambda st: st["q"].cast("double") / scale,
                ).alias("centroid")
            )
            .collect()
        )
        updated = {r["c_id"]: list(r["centroid"]) for r in comp}
        cents = [(cid, updated.get(cid, v)) for cid, v in cents]
    return spark.createDataFrame(cents, cent_schema)


def ivf_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 3,
) -> DataFrame:
    """IVF-flat ANN: exact cosine ranking restricted to the query's
    ``n_probe`` nearest inverted lists (cells).

    Complements lsh_topk: IVF cells adapt to the data distribution
    (centroids live where vectors are dense) where hyperplane buckets
    are data-oblivious. Centroid *training* (k-means) is an offline
    job; this operator takes any deterministic centroid set. Probing
    n_probe cells bounds scanned fraction to ~n_probe/|C| of the
    corpus; the probe table is queries-only (tiny, broadcast), so the
    corpus side joins without shuffling beyond its one assignment
    groupBy."""
    assign = ivf_assign(emb, centroids, id_col, vec_col, round_to)
    v = emb.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    c = centroids.select("c_id", _as_double(F.col("centroid")).alias("cv"))
    # per-QUERY centroid ranking: semi-join first so the window only
    # ever sorts |Q| x |C| rows
    qcs = (
        v.join(query_ids, v["id"] == query_ids[id_col], "left_semi")
        .crossJoin(F.broadcast(c))
        .select(
            F.col("id").alias("query_id"),
            "c_id",
            F.round(cosine(F.col("v"), F.col("cv")), round_to).alias("cs"),
        )
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("c_id"))
    probes = (
        qcs.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "c_id")
    )
    qv = v.join(query_ids, v["id"] == query_ids[id_col], "left_semi").select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        assign.join(F.broadcast(probes), "c_id")
        .where(F.col("id") != F.col("query_id"))
        .join(v, "id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), round_to).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def gram_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """C = X'X over an embedding column, 6dp-rounded, as (i, j, c)
    with 1-based dims — per-partition numpy partials, never a join.

    One Arrow-batched ``mapInPandas`` accumulates a dense d x d
    ``X.T @ X`` across each partition's batches and emits exactly d^2
    rows per non-empty partition; one groupBy-sum folds the partials.
    Shuffle volume is |partitions| * d^2 rows — independent of corpus
    size — where the posexplode + self-join-on-row-id formulation this
    replaced shuffled |rows| * d^2 product rows (0.6M-16M intermediate
    rows PER DOCUMENT at real embedding widths d=768-4096). Plan shape
    is pytest-frozen: no Join, no Generate (test_modularity_cuped_pca).
    """

    def _gram_partials(batches):
        import numpy as np
        import pandas as pd

        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["_vec"]],
                dtype=np.float64,
            )
            g = x.T @ x
            acc = g if acc is None else acc + g
        if acc is not None:
            d = acc.shape[0]
            ii, jj = np.meshgrid(
                np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "p": acc.ravel(),
                }
            )

    partials = emb.select(F.col(vec_col).alias("_vec")).mapInPandas(
        _gram_partials, "i int, j int, p double"
    )
    return partials.groupBy("i", "j").agg(
        F.round(F.sum("p"), 6).alias("c")
    )


def gram_power_iteration(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
) -> DataFrame:
    """Power-iteration steps toward the gram matrix's dominant
    eigenvector, fully in-engine: C = X'X via PER-PARTITION numpy
    partials (one Arrow-batched ``mapInPandas`` computes a d x d
    ``X.T @ X`` per partition — the same vectorized escape hatch as
    functions/extraction.py), then one union + groupBy-sum over only
    |partitions| * d^2 rows; C is dims x dims = broadcast-sized at any
    corpus scale. A first cut built C by posexplode + self-join on the
    row id, which fans EVERY embedding row to d^2 product rows through
    the join before the map-side combine — benign at the fixture's
    d=64, but at a real embedding width (d=768-4096) that is 0.6M-16M
    intermediate rows PER DOCUMENT and the shuffle write alone dwarfs
    the corpus. The partial form shuffles a corpus-size-independent
    number of rows. Then ``iters`` rounds of w <- C v with L1
    normalization. C is rounded to 6dp BEFORE iterating and every
    normalized vector re-rounded, so engines iterate the SAME matrix
    and the result is reproducible — the same pinning discipline as
    graph_hits.

    Convergence is governed by the eigengap: on spiked spectra (a real
    drift direction, a dominant topic) two steps land on the
    eigenvector (pytest: cos > 0.99 on planted data); on a spectrally
    flat corpus the output is still deterministic — it is "the
    2-step power iterate", which is exactly what a drift MONITOR wants
    to diff run-over-run. Returns (dim int 1-based, loading)."""
    c = gram_matrix(emb, vec_col).localCheckpoint(eager=True)

    def normalize(w_df):
        s = w_df.agg(F.sum(F.abs(F.col("w"))).alias("s"))
        return w_df.crossJoin(F.broadcast(s)).select(
            "i", F.round(F.col("w") / F.col("s"), 6).alias("v")
        )

    v = normalize(c.groupBy("i").agg(F.sum("c").alias("w")))
    for _ in range(iters - 1):
        w = (
            c.join(v.withColumnRenamed("i", "j"), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
        )
        v = normalize(w)
    return v.select(
        F.col("i").cast("int").alias("dim"), F.col("v").alias("loading")
    )


def jl_project(
    emb: DataFrame,
    out_dim: int = 8,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection: reduce each
    embedding to ``out_dim`` components p_k = sum_i sign(k, i) * x_i,
    with sign(k, i) = +-1 from the first hex digit of
    md5('jl:<k>:<i>') — the content-addressed plane trick the LSH/ANN
    family uses, extended from sign-only hashing to the real-valued
    projection JL compression needs. Distances are preserved within
    the JL distortion bound in expectation; signs are a pure function
    of (k, i), so every engine draws the SAME matrix and the projection
    faces the exact-hash gate.

    Scale shape: the sign matrix is out_dim x in_dim scalars inlined
    as LITERALS (computed once, driver-side, from the same md5 both
    engines use), so the projection is a ZERO-SHUFFLE per-row
    zip_with + aggregate inside codegen — a 100 TB embedding table
    compresses 8x in a map-only stage. The explode to (id, k, proj)
    rows is for the gate; a pipeline would keep the wide form.

    Returns (id_col, k, proj) with proj rounded 6dp.
    """
    import hashlib

    def _sign(k: int, i: int) -> float:
        h = hashlib.md5(f"jl:{k}:{i}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) >= 8 else -1.0

    vec = F.col(vec_col).cast("array<double>")
    projs = []
    for k in range(out_dim):
        signs = F.array(
            *[F.lit(_sign(k, i)) for i in range(1, in_dim + 1)]
        )
        p = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        projs.append(
            F.struct(F.lit(k).alias("k"), F.round(p, 6).alias("proj"))
        )
    return emb.select(
        F.col(id_col), F.explode(F.array(*projs)).alias("p")
    ).select(id_col, F.col("p.k").alias("k"), F.col("p.proj").alias("proj"))


def pq_encode(
    emb: DataFrame,
    n_blocks: int = 4,
    block_dim: int = 16,
    k: int = 4,
    lloyd_rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization (Jegou 2011, public formulation): split
    each vector into ``n_blocks`` sub-vectors of ``block_dim`` dims,
    k-means each block independently (content-addressed seeding +
    ``lloyd_rounds`` rounds — the ann_ivf_topk training discipline,
    with L2 distance as PQ defines), and emit each vector's nearest
    sub-centroid id per block. The codes table is the 100 TB ANN
    artifact: n_blocks bytes per vector instead of 4 * dim, with
    distance estimation against a (k * n_blocks)-row codebook.

    Determinism (what makes a trained quantizer exact-hash gateable):
    seeds are the k lowest md5('pq:<block>:' || id) rows per block;
    distances are rounded to 6dp before the argmin with c_id
    tie-break; centroid updates are integer-truncated means
    (trunc(x * 1e6) // count) so float division order can't wobble the
    codebook; empty clusters carry their previous centroid.

    Scale shape per block & round: the sub-vector table never leaves
    its partition until ONE groupBy (vec_id, block) distance-argmin
    (combinable min_by) and one centroid-update aggregation whose
    state is k * block_dim — the classic mirror of IVF training. The
    blocks are independent; they share the single exploded pass over
    the corpus.

    Returns (id_col, block, code) — n_blocks rows per vector.
    """
    ex = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "i0", "x"
        ),
    ).select(
        "id",
        (F.col("i0") / block_dim).cast("int").alias("block"),
        (F.col("i0") % block_dim).alias("bi"),
        "x",
    ).where(F.col("block") < n_blocks)
    ex = ex.localCheckpoint(eager=True)

    # content-addressed seeds: k lowest md5 per block, rank = code id
    w = Window.partitionBy("block").orderBy(
        F.md5(
            F.concat(
                F.lit("pq:"),
                F.col("block").cast("string"),
                F.lit(":"),
                F.col("id").cast("string"),
            )
        ),
        "id",
    )
    seed_ids = (
        ex.select("block", "id")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("block", "id", (F.col("rn") - 1).alias("c_id"))
    )
    cent = (
        seed_ids.join(ex, ["block", "id"])
        .select("block", "c_id", "bi", F.col("x").alias("cx"))
        .localCheckpoint(eager=True)
    )

    def _assign(centroids):
        d = (
            ex.join(centroids, ["block", "bi"])
            .groupBy("id", "block", "c_id")
            .agg(
                F.round(
                    F.sum(
                        (F.col("x") - F.col("cx"))
                        * (F.col("x") - F.col("cx"))
                    ),
                    6,
                ).alias("dist2")
            )
        )
        return d.groupBy("id", "block").agg(
            F.min(F.struct("dist2", "c_id")).alias("best")
        ).select("id", "block", F.col("best.c_id").alias("code"))

    for _ in range(lloyd_rounds):
        assign = _assign(cent)
        upd = (
            assign.join(ex, ["id", "block"])
            .groupBy("block", F.col("code").alias("c_id"), "bi")
            .agg(
                # CAST toward zero == DuckDB trunc(); `s div cnt` ==
                # DuckDB `//` (both truncate) — train_centroids_kmeans'
                # cross-engine integer-mean discipline
                F.sum((F.col("x") * 1_000_000).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .select(
                "block",
                "c_id",
                "bi",
                (
                    F.expr("s div cnt").cast("double") / F.lit(1000000.0)
                ).alias("cx"),
            )
        )
        # empty clusters keep their previous centroid (the IVF trick)
        survivors = upd.select("block", "c_id").distinct()
        carried = cent.join(survivors, ["block", "c_id"], "left_anti")
        cent = upd.unionByName(carried).localCheckpoint(eager=True)

    out = _assign(cent)
    ex.unpersist(blocking=False)
    return out.select(F.col("id").alias(id_col), "block", "code")


def hard_negative_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 3,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar vectors whose LABEL DIFFERS — the examples a
    contrastive/embedding fine-tune learns most from (easy negatives
    are already far; hard negatives define the margin). Identical
    plan to cosine_topk (queries broadcast, corpus streamed, one
    bounded per-query window) plus the label inequality pushed BELOW
    the ranking window, so the k survivors are true cross-label
    neighbors, not a post-filter of a cross-label-blind top-k. At
    scale the broadcast-queries shape is the batch-mining pattern:
    a fixed query batch sweeps the corpus in one pass.

    Returns (query_id, neighbor_id, score, rank).
    """
    base = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("n_label"),
        _as_double(F.col(vec_col)).alias("v"),
    )
    q = emb.join(
        query_ids, emb[id_col] == query_ids[id_col], "left_semi"
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("q_label"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("n_label") != F.col("q_label"))
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("v")), round_to).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
