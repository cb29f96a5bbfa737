"""Deterministic mergeable sketches: KMV distinct-count estimation and
A-ES weighted sampling.

Classic sketch algorithms are randomized; these variants draw all
randomness from md5 of the VALUE (the same content-addressed trick as
dataset_split / mixture_sample / the ANN planes), which makes them
reproducible across engines, runs, and partitionings — and therefore
hash-gateable against an ANSI-SQL oracle, the property every other
operator in this engine holds. Estimation error then depends on the
corpus (md5 is a fixed uniform hash of it), carrying the usual KMV
guarantees for any corpus not adversarially chosen against md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 15 hex digits: fits a signed 64-bit int, uniform on [0, 16^15)
_HEX_DIGITS = 15
_HEX_SPACE = float(16**_HEX_DIGITS)


def _unit_hash(col) -> Column:
    """Deterministic uniform draw in (0, 1]: the first 15 hex digits of
    md5(value) as a fraction of the 60-bit space (+1 so 0 is excluded —
    A-ES exponentiates, and KMV divides by it)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, _HEX_DIGITS), 16, 10)
    return (h.cast("double") + F.lit(1.0)) / F.lit(_HEX_SPACE)


def kmv_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    k: int = 256,
) -> DataFrame:
    """Per-``keys`` distinct-count estimate of ``value`` via k-minimum
    values: keep each group's k smallest unit-hashes; with the k-th
    smallest at height h, the estimate is (k-1)/h. Exact below k
    (the sketch has seen every distinct hash).

    Scale shape: one distinct on (keys, hash) — two-phase, partial
    aggregation does the heavy dedup map-side — then one rank window
    per group that keeps <= k rows, then a combinable final fold. The
    sketch is MERGEABLE (k smallest of a union = k smallest of the
    merged k-smallest lists), which is the property that lets 1000
    executors sketch partitions independently; the Spark plan realizes
    the merge through the same two-phase aggregation. The rank window
    sorts each group's distinct hashes on one reducer — for a
    mega-group that sort is the dense_ids two-phase pattern's job, at
    which point k rows out of 10^9 still leave on one shuffle.

    Returns keys + (n_kept, distinct_est) — distinct_est exact when
    the group has < k distinct values.
    """
    hashed = df.select(*keys, _unit_hash(F.col(value)).alias("u")).distinct()
    w = Window.partitionBy(*keys).orderBy("u")
    topk = hashed.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return topk.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
        .otherwise(F.round((F.lit(k) - 1) / F.max("u"), 3))
        .alias("distinct_est"),
    )


def weighted_sample(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    weight: str,
    k: int = 5,
) -> DataFrame:
    """Weight-proportional sample of ``k`` rows per group without
    replacement (Efraimidis-Spirtsis A-ES): each row draws u =
    unit_hash(id) and scores u^(1/w); the k largest scores are the
    sample. Inclusion probability is proportional to weight, and the
    draw is a pure function of row identity — re-running, re-
    partitioning, or re-implementing in another engine selects the
    SAME rows (quality-weighted corpus sampling must be reproducible
    or ablations don't mean anything).

    Scale shape: one zero-shuffle projection computes the score, one
    rank window per group emits <= k rows. Rows with weight <= 0 are
    excluded (score undefined).

    Returns keys + (id_col, weight, score) for the k winners,
    score rounded to 6dp for cross-engine comparison.
    """
    scored = df.where(F.col(weight) > 0).select(
        *keys,
        id_col,
        F.col(weight).alias("weight"),
        F.pow(_unit_hash(F.col(id_col)), 1.0 / F.col(weight)).alias("_s"),
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("_s"), id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(*keys, id_col, "weight", F.round("_s", 6).alias("score"))
    )


def register_min_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    m: int = 256,
) -> DataFrame:
    """Per-``keys`` distinct-count estimate via register minima
    (MinCount / stochastic averaging, Giroire 2009 — the same
    accuracy class as HyperLogLog's ~1/sqrt(m) relative error, in a
    strictly better distributed shape than ``kmv_distinct``).

    Each value hashes to one of ``m`` registers (first md5 byte) and
    to a unit draw u (next 15 hex digits, independent md5 bits);
    every register keeps min(u). With n_j values in register j,
    E[min_j] = 1/(n_j + 1), so summing minima (counting an EMPTY
    register as 1, the max of the support) gives
    S ~= m^2 / (n + m)  =>  n_hat = m^2 / S - m.

    That inverse is Jensen-biased once n_j stops concentrating
    (n ~ m: E[1/(n_j+1)] >> 1/(E[n_j]+1), measured ~2x low at
    n = 0.6m), so exactly like HyperLogLog the small range switches
    to LINEAR COUNTING on the empty-register count V:
    n_hat = m * ln(m / V) when the raw estimate < 2.5 m and V > 0 —
    occupancy is Binomial(n, 1/m), so -ln of the empty fraction is
    the MLE of n/m.

    Scale shape — the reason this exists next to KMV: groupBy
    (keys, register) min(u), then groupBy keys sum — BOTH map-side
    combinable, no per-group rank window at all, aggregation state
    <= m doubles per group per task. The sketch is mergeable under
    elementwise min, which is exactly what Spark's two-phase
    aggregation performs; 1000 executors sketch independently and
    the merge is free. KMV's per-group top-k window sorts each
    group's distinct hashes on one reducer; this never sorts.

    Returns keys + (n_regs, distinct_est): registers hit, and the
    estimate rounded to 3 dp (content-addressed randomness: exact
    same value in any engine, so an approximate algorithm faces the
    exact-hash correctness gate).
    """
    return fold_registers(register_partials(df, keys, value, m), keys, m)


def register_partials(
    df: DataFrame, keys: list[str], value: str, m: int = 256
) -> DataFrame:
    """The mergeable half of `register_min_distinct`: per-(keys,
    register) minima of the unit draw. Two partial tables over the
    same key space merge by union + groupBy-min — the algebra the
    streaming sketch (streaming/sketch_stream.py) leans on: min is
    idempotent, so a REPLAYED batch's partials are absorbed for free,
    which is exactly-once without any dedup bookkeeping."""
    if m > 256:
        raise ValueError(
            f"register sketch supports m <= 256 (one md5 byte selects "
            f"the register); got m={m} — beyond 256 distinct registers "
            f"the extra ones are silently never hit and the estimator "
            f"degrades"
        )
    md5 = F.md5(F.col(value).cast("string"))
    reg = F.conv(F.substring(md5, 1, 2), 16, 10).cast("int") % m
    u = (
        F.conv(F.substring(md5, 3, _HEX_DIGITS), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(_HEX_SPACE)
    return (
        df.select(*keys, reg.alias("j"), u.alias("u"))
        .groupBy(*keys, "j")
        .agg(F.min("u").alias("umin"))
    )


def fold_registers(
    per_reg: DataFrame, keys: list[str], m: int = 256
) -> DataFrame:
    """Estimator half of `register_min_distinct`: fold (keys, j, umin)
    registers into (keys, n_regs, distinct_est), empty registers at
    the support max, linear-counting switch below 2.5m."""
    if m > 256:
        raise ValueError(
            f"register sketch supports m <= 256; got m={m}"
        )
    n_regs = F.count(F.lit(1))
    v_empty = F.lit(m) - n_regs
    raw = (
        F.lit(float(m * m)) / (F.sum("umin") + v_empty) - F.lit(float(m))
    )
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty)
    return per_reg.groupBy(*keys).agg(
        n_regs.alias("n_regs"),
        F.round(
            F.when((raw < 2.5 * m) & (v_empty > 0), linear).otherwise(raw),
            3,
        ).alias("distinct_est"),
    )


def bloom_build(
    df: DataFrame,
    value: str,
    m_bits: int = 2048,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom filter over the distinct values of ``value`` as
    ``ceil(m_bits / 63)`` (word_idx, bits) rows — the semi-join-reduction
    sketch: instead of shipping a build side's key SET to prune a huge
    probe table, ship a fixed-size bitset (2048 bits in 33 longs here)
    that broadcasts for free and never grows with the build side.
    Words hold 63 bits each (bit index <= 62): engines that check
    shift overflow reject ``1 << 63`` on signed 64-bit, and staying
    below the sign bit keeps every word positive and every shift
    engine-portable.

    Bit positions are the k md5 draws of the value (independent
    8-hex-digit slices), so membership is content-addressed and
    engine-portable. Build shape: distinct -> explode k -> groupBy
    word_idx bit_or — combinable, output <= ceil(m_bits/63) rows.
    Missing words (no bit set) are absent; the probe treats absent as
    zero. False positives only, never false negatives: rate
    ~= (1 - e^(-k n / m))^k, and the PROBE measures it against the
    exact semi-join in the gated query.
    """
    if k > 4:
        raise ValueError(
            f"bloom sketch supports k <= 4 (md5 yields 32 hex chars = "
            f"four independent 8-hex draws); got k={k} — a fifth draw "
            f"would read past the digest, conv('') -> NULL positions, "
            f"and membership checks would always miss"
        )
    pos = [
        F.conv(F.substring(F.md5(F.col("val")), 1 + 8 * i, 8), 16, 10)
        .cast("long") % m_bits
        for i in range(k)
    ]
    vals = df.select(F.col(value).cast("string").alias("val")).distinct()
    bits = vals.select(
        F.explode(F.array(*pos)).alias("p")
    ).select(
        (F.col("p") / 63).cast("int").alias("word_idx"),
        # the PySpark shiftleft wrapper takes only literal bit counts;
        # the SQL function accepts a column
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias("b"),
    )
    return bits.groupBy("word_idx").agg(F.bit_or("b").alias("bits"))


def bloom_probe(
    df: DataFrame,
    value: str,
    bloom: DataFrame,
    m_bits: int = 2048,
    k: int = 4,
) -> DataFrame:
    """Mark each row of ``df`` with ``candidate`` = true iff all k
    Bloom bits for ``value`` are set. The filter table broadcasts
    (<= ceil(m_bits/63) rows); the probe is explode-k -> broadcast-join ->
    groupBy(row key) checking hits == k — no shuffle of ``df`` wider
    than its own keys, which is the entire point at 100 TB: the
    pruned survivors, not the full probe table, flow to the real
    join."""
    from pyspark.sql.functions import broadcast

    if k > 4:
        raise ValueError(
            f"bloom sketch supports k <= 4 (md5 yields four independent "
            f"8-hex draws); got k={k}"
        )
    pos = [
        F.conv(F.substring(F.md5(F.col("val")), 1 + 8 * i, 8), 16, 10)
        .cast("long") % m_bits
        for i in range(k)
    ]
    probed = df.select(
        F.col(value).cast("string").alias("val")
    ).distinct().select(
        "val", F.posexplode(F.array(*pos)).alias("i", "p")
    ).select(
        "val",
        (F.col("p") / 63).cast("int").alias("word_idx"),
        (F.col("p") % 63).cast("int").alias("bit"),
    )
    hits = (
        probed.join(broadcast(bloom), "word_idx", "left")
        .select(
            "val",
            F.expr(
                "CAST(shiftright(coalesce(bits, CAST(0 AS BIGINT)), bit)"
                " & CAST(1 AS BIGINT) AS INT)"
            ).alias("hit"),
        )
        .groupBy("val")
        .agg((F.sum("hit") == k).alias("candidate"))
    )
    return hits


def misra_gries_candidates(
    df: DataFrame,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries (Misra & Gries
    1982; merge rule from Agarwal et al. 2013 "Mergeable Summaries"):
    each partition keeps at most ``k`` counters, so the candidate set
    shuffled off the mappers is <= partitions * k rows REGARDLESS of
    key cardinality. The classic guarantee survives batching and
    merging: any key with true frequency > n/(k+1) is present in the
    union of summaries.

    This is the candidate-generation half of heavy-hitter detection at
    10^9+ distinct keys, where a plain groupBy-count's map-side combine
    still emits one partial row per distinct key per mapper — the MG
    summary caps that at k. Arrow-batched: each batch is reduced with a
    vectorized value_counts before touching the Python dict, so the
    per-row loop never runs.

    Returns (key_col, mg) with the partition-summary counts; callers
    recount candidates exactly (see queries.py `heavy_hitters`) because
    MG counts undercount by up to n/(k+1).
    """
    key_type = df.schema[key_col].dataType.simpleString()

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for val, cnt in pdf[key_col].value_counts().items():
                counters[val] = counters.get(val, 0) + int(cnt)
            if len(counters) > k:
                # subtract the (k+1)-th largest count from everything,
                # drop the non-positive: the mergeable-summaries prune
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame(
            {key_col: list(counters.keys()), "mg": list(counters.values())}
        )

    return df.select(key_col).mapInPandas(
        summarize, f"{key_col} {key_type}, mg bigint"
    )


def rolling_register_min(
    df: DataFrame,
    bucket_col,
    value: str,
    lookback: int = 2,
    m: int = 256,
) -> DataFrame:
    """Sliding-window distinct-count: `register_min_distinct` per time
    bucket, MERGED across the trailing ``lookback`` buckets by
    elementwise register min — the property HLL-class sketches are
    built for, exercised INSIDE the plan instead of across tasks. A
    per-bucket exact distinct can't do this: distinct sets don't merge
    without re-scanning; register vectors do, so the rolling window
    costs one RANGE window over buckets * m rows (time-bounded, not
    corpus-bounded), never a re-scan of the raw events.

    The registers are densified over an explicit (bucket x register)
    grid first: a register untouched in bucket b but hit in b-1 must
    still carry its minimum into b's merged window — deriving the
    window only from existing (b, j) rows would silently count it
    empty and bias the estimate up.

    Returns (bucket, n_regs, distinct_est) with the same estimator and
    linear-counting switch as `register_min_distinct` (content-
    addressed md5 randomness: exact-hash gateable).
    """
    spark = df.sparkSession
    md5 = F.md5(F.col(value).cast("string"))
    reg = F.conv(F.substring(md5, 1, 2), 16, 10).cast("int") % m
    u = (
        F.conv(F.substring(md5, 3, _HEX_DIGITS), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(_HEX_SPACE)
    per = (
        df.select(bucket_col.alias("b"), reg.alias("j"), u.alias("u"))
        .groupBy("b", "j")
        .agg(F.min("u").alias("umin"))
    )
    regs = spark.range(m).select(F.col("id").cast("int").alias("j"))
    grid = per.select("b").distinct().crossJoin(F.broadcast(regs))
    dense = grid.join(per, ["b", "j"], "left")
    w = (
        Window.partitionBy("j")
        .orderBy("b")
        .rangeBetween(-lookback, Window.currentRow)
    )
    merged = dense.select(
        "b", "j", F.min("umin").over(w).alias("um")
    )
    n_regs = F.count("um")  # non-null = occupied after the merge
    v_empty = F.lit(m) - n_regs
    raw = (
        F.lit(float(m * m)) / (F.sum("um") + v_empty) - F.lit(float(m))
    )
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty)
    return merged.groupBy("b").agg(
        n_regs.alias("n_regs"),
        F.round(
            F.when((raw < 2.5 * m) & (v_empty > 0), linear).otherwise(raw),
            3,
        ).alias("distinct_est"),
    )


def countmin_counters(
    df: DataFrame, value: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch build: (j, pos, n) counters, depth x width rows
    total. Row r increments counter (j, h_j(value)) for each of the
    ``depth`` independent rows; h_j = first byte of md5('<j>:' || value)
    mod width — content-addressed like every sketch here, so the
    counters are bit-identical across engines and the ESTIMATES face
    the exact gate. One explode(depth) + combinable groupBy-count; the
    output is depth * width rows regardless of corpus size — the
    fixed-size frequency summary you ship instead of a 10^9-row
    count table when only point estimates are needed.

    Width is capped at 256 (one md5 byte addresses the row) — same
    silent-degradation guard as the register sketches."""
    if width > 256:
        raise ValueError(
            f"count-min sketch supports width <= 256 (one md5 byte"
            f" selects the counter); got width={width}"
        )
    rows = df.select(F.col(value).cast("string").alias("val")).select(
        "val", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    )
    pos = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("val"))),
                1,
                2,
            ),
            16,
            10,
        ).cast("int")
        % width
    )
    return (
        rows.select("j", pos.alias("pos"))
        .groupBy("j", "pos")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def countmin_estimate(
    counters: DataFrame,
    probes: DataFrame,
    value: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a Count-Min sketch: for each
    probe value, min over the depth rows of its counter — the classic
    one-sided estimator (est >= true always; overshoot bounded by
    collisions, pytest-pinned on the exact side). The counters table
    broadcasts (depth * width rows); probing is explode(depth) +
    broadcast join + a combinable min — the probe table never
    shuffles wider than itself."""
    p = probes.select(F.col(value).cast("string").alias("val")).select(
        "val", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    )
    pos = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("val"))),
                1,
                2,
            ),
            16,
            10,
        ).cast("int")
        % width
    )
    return (
        p.select("val", "j", pos.alias("pos"))
        .join(F.broadcast(counters), ["j", "pos"], "left")
        .groupBy("val")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_n"))
    )
