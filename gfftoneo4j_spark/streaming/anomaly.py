"""Stateful streaming anomaly scoring: per-user Welford moments via
applyInPandasWithState.

The batch twin (queries.prefix_zscore_anomaly) scores each event
against its user's PRIOR history with prefix sums inside a user-keyed
window. Over an unbounded stream that prefix is exactly what Welford's
online algorithm maintains: per user ONE (n, sum, sum-of-squares)
triple of state — O(1) per key, so 10^9 users is GBs of state store —
updated as each microbatch's arrivals fold in.

Scale properties:
- grouping shuffles only each microbatch's arrivals on user_id (the
  same single exchange as the batch window plan);
- moments are kept in exact centi-unit int64 (sum, sum of squares), so
  the streaming scores are BIT-IDENTICAL to the batch twin for
  in-order arrival — the parity pytest asserts it across microbatch
  boundaries;
- the Python function is Arrow-batched per group via pandas.

Semantics contract: events must arrive in (sec, event_id) order per
user for exact parity (append-only logs do); out-of-order stragglers
still score, but against the state at arrival time — the periodic
batch pass is the repair path, as with the next_turn operator.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("v100", T.LongType(), False),
        T.StructField("n_prior", T.LongType(), False),
        T.StructField("z", T.DoubleType(), False),
        T.StructField("is_anomaly", T.IntegerType(), False),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("n", T.LongType(), True),
        T.StructField("s100", T.LongType(), True),
        T.StructField("ss10000", T.LongType(), True),
    ]
)

_BURN_IN = 5


def _score_group(key, pdf_iter, state: GroupState):
    """One user. State = exact (n, sum, sum of squares) in centi-units;
    each arriving event scores against the PRIOR moments, then folds
    itself in — the same semantics as the batch prefix window."""
    (user_id,) = key
    n, s, ss = state.get if state.exists else (0, 0, 0)
    rows = []
    # concatenate ALL Arrow chunks before sorting: a user whose
    # microbatch spans multiple chunks (>~10k rows) would otherwise be
    # scored per-chunk — within-chunk order only — silently breaking
    # the documented bit-parity with the batch prefix-window twin
    # (ADVICE r05). Memory is bounded by one user's arrivals in one
    # microbatch, which the exact-order contract requires in hand
    # anyway before the first score can be emitted.
    chunks = list(pdf_iter)
    if chunks:
        ordered = pd.concat(chunks).sort_values(["sec", "event_id"])
        for ev_id, v100 in zip(ordered["event_id"], ordered["v100"]):
            ev_id, v100 = int(ev_id), int(v100)
            if n >= _BURN_IN:
                # batch twin scores rows with i > 5, i.e. >= 5 PRIOR
                # events; n here is exactly that prior count
                var_num = ss - (s * s) / n
                if var_num > 0:
                    mean = s / n
                    z = (v100 - mean) / math.sqrt(var_num / (n - 1))
                    rows.append(
                        (
                            user_id,
                            ev_id,
                            v100,
                            n,
                            round(z, 6),
                            1 if abs(z) > 3 else 0,
                        )
                    )
            n += 1
            s += v100
            ss += v100 * v100
    state.update((n, s, ss))
    if rows:
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id",
                "event_id",
                "v100",
                "n_prior",
                "z",
                "is_anomaly",
            ],
        )


def streaming_welford_anomaly(stream: DataFrame) -> DataFrame:
    """stream: event rows with (user_id, event_id, ts, value). Emits
    one scored row per event past the per-user burn-in, computed from
    exact state identical to the batch prefix-window twin."""
    ev = stream.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("bigint").alias("sec"),
        F.round(F.col("value") * 100).cast("bigint").alias("v100"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _score_group,
        outputStructType=ANOMALY_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
