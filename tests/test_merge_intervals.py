"""merge_intervals (operators/windows.py): island semantics, touching
vs gapped boundaries, order-invariance."""

from gfftoneo4j_spark.operators.windows import merge_intervals


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, start long, end long")


def test_overlap_touch_and_gap(spark):
    rows = [
        ("a", 0, 10),
        ("a", 5, 12),    # overlaps -> same island
        ("a", 12, 20),   # touches end=12 -> same island (start !> max_end)
        ("a", 25, 30),   # gap -> new island
        ("b", 0, 1),
    ]
    got = {
        (r["k"], r["start"], r["end"]): r["n_merged"]
        for r in merge_intervals(_df(spark, rows), "k").collect()
    }
    assert got == {("a", 0, 20): 3, ("a", 25, 30): 1, ("b", 0, 1): 1}


def test_contained_interval_does_not_split(spark):
    # [0,100] swallows [10,20]; [30,40] is inside the running max even
    # though the PREVIOUS row's end (20) is smaller — the running MAX
    # (not lag(end)) is what makes this correct
    rows = [("a", 0, 100), ("a", 10, 20), ("a", 30, 40), ("a", 150, 160)]
    got = sorted(
        (r["start"], r["end"], r["n_merged"])
        for r in merge_intervals(_df(spark, rows), "k").collect()
    )
    assert got == [(0, 100, 3), (150, 160, 1)]


def test_input_order_invariance(spark):
    rows = [("a", 25, 30), ("a", 12, 20), ("a", 0, 10), ("a", 5, 12)]
    got = sorted(
        (r["start"], r["end"])
        for r in merge_intervals(
            _df(spark, rows).repartition(7), "k"
        ).collect()
    )
    assert got == [(0, 20), (25, 30)]
