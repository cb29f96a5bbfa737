"""Semantic pins for the MI / target-encoding / PSI / Good-Turing /
Yule-K / readability batch. The cross-engine gate proves Spark ==
DuckDB on the same SQL; these tests pin MEANING against independent
Python reimplementations and constructed corner cases: MI is ~0 on an
independent table and exactly reproduces a hand-computed dependent
one, the LOO encoding matches the per-row exclusion formula, PSI is 0
on identical cohorts and positive under shift, Good-Turing reproduces
a planted count-of-counts grid, Yule's K matches the textbook formula,
and the readability numbers match Flesch/FK computed by hand.
"""

import datetime
import math

from gfftoneo4j_spark.queries import QUERIES

_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, _EVENT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))


def test_mutual_information_zero_on_independent_grid(spark, tmp_path):
    """A perfectly balanced (type x ybin) grid has p(x,y) =
    p(x)p(y) exactly -> every PMI and MI contribution is 0."""
    rows, eid = [], 0
    for day in range(1, 8):  # ybin = day % 7 covers 1..6,0
        ts = datetime.datetime(2024, 1, day)
        for t in ("aa", "bb", "cc"):
            for _ in range(4):
                rows.append((eid, ts, 1, t, 1.0, "{}"))
                eid += 1
    _write_events(spark, tmp_path, rows)
    out = QUERIES["mutual_information"](spark, str(tmp_path)).collect()
    assert len(out) == 21
    assert all(r["pmi_micro"] == 0 for r in out)
    assert all(r["mi_part_micro"] == 0 for r in out)


def test_mutual_information_matches_python_on_dependent_data(
    spark, tmp_path
):
    """Type 'aa' only fires on day 1, 'bb' only on day 2: MI must
    equal the hand-computed H(X) contribution cell by cell."""
    rows, eid = [], 0
    counts = {("aa", 1): 6, ("bb", 2): 10, ("cc", 1): 2, ("cc", 2): 2}
    for (t, day), n in counts.items():
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, day), 1, t, 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = {
        (r["event_type"], r["ybin"]): r
        for r in QUERIES["mutual_information"](spark, str(tmp_path)).collect()
    }
    n = sum(counts.values())
    nx = {}
    ny = {}
    for (t, day), c in counts.items():
        nx[t] = nx.get(t, 0) + c
        ny[day % 7] = ny.get(day % 7, 0) + c
    for (t, day), c in counts.items():
        y = day % 7
        ratio = (c * n) / (nx[t] * ny[y])
        r = out[(t, y)]
        assert r["n_xy"] == c
        assert r["pmi_micro"] == math.floor(1e6 * math.log(ratio))
        assert r["mi_part_micro"] == math.floor(
            1e6 * (c / n) * math.log(ratio)
        )
    # total MI of a dependent table is strictly positive
    assert sum(r["mi_part_micro"] for r in out.values()) > 0


def test_target_encoding_loo_matches_exclusion_formula(spark, tmp_path):
    ts = datetime.datetime(2024, 1, 1)
    vals = {"aa": [1.0, 3.0, 5.0], "bb": [10.0, 20.0]}
    rows, eid = [], 0
    for t, vs in vals.items():
        for v in vs:
            rows.append((eid, ts, 1, t, v, "{}"))
            eid += 1
    # singleton category must be dropped (n-1 = 0 denominator)
    rows.append((eid, ts, 1, "solo", 7.0, "{}"))
    _write_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in QUERIES["target_encoding_loo"](spark, str(tmp_path)).collect()
    }
    assert "solo" not in out
    for t, vs in vals.items():
        s = sum(vs)
        loo = [(s - v) / (len(vs) - 1) for v in vs]
        mean = sum(loo) / len(loo)
        sd = math.sqrt(
            sum((x - mean) ** 2 for x in loo) / (len(loo) - 1)
        )
        assert out[t]["n"] == len(vs)
        assert out[t]["avg_loo_micro"] == math.floor(1e6 * mean)
        assert out[t]["sd_loo_micro"] == math.floor(1e6 * sd)


def test_psi_zero_on_identical_cohorts_positive_on_shift(spark, tmp_path):
    rows, eid = [], 0
    # identical value mix on an odd day and an even day
    for day in (1, 2):
        for v in (5.0, 15.0, 25.0, 35.0):
            for _ in range(10):
                rows.append(
                    (eid, datetime.datetime(2024, 1, day), 1, "x", v, "{}")
                )
                eid += 1
    _write_events(spark, tmp_path, rows)
    out = QUERIES["psi_stability"](spark, str(tmp_path)).collect()
    assert sum(r["psi_part_micro"] for r in out) == 0
    assert all(r["n_a"] == r["n_b"] for r in out)
    # now shift the odd-day cohort upward: PSI must be positive
    rows2 = [
        (r[0], r[1], r[2], r[3], r[4] + (60.0 if r[1].day == 1 else 0.0), r[5])
        for r in rows
    ]
    _write_events(spark, tmp_path, rows2)
    out2 = QUERIES["psi_stability"](spark, str(tmp_path)).collect()
    assert sum(r["psi_part_micro"] for r in out2) > 100_000  # PSI > 0.1


def test_good_turing_reproduces_planted_count_of_counts(spark, tmp_path):
    """Plant a corpus where the within-doc bigram repeat grid is known:
    doc0 repeats bigram 'a b' 3x ('a b a b a b' has 'a b' 3x, 'b a'
    2x), doc1 has all-distinct bigrams."""
    docs = [
        (0, "a b a b a b", "en", "s", 1),
        (1, "c d e f", "en", "s", 1),
    ]
    _write_docs(spark, tmp_path, docs)
    out = {
        r["r"]: r
        for r in QUERIES["good_turing_smoothing"](
            spark, str(tmp_path)
        ).collect()
    }
    # (doc,bigram) counts: doc0: 'a b'x3, 'b a'x2; doc1: 3 singletons
    # N_1 = 3, N_2 = 1, N_3 = 1 -> r*=1: 2*N2/N1, r*=2: 3*N3/N2
    assert out[1]["n_r"] == 3
    assert out[1]["r_star_micro"] == math.floor(1e6 * 2 * 1 / 3)
    assert out[2]["n_r"] == 1
    assert out[2]["r_star_micro"] == math.floor(1e6 * 3 * 1 / 1)
    # r = 3 has no observed r+1 -> omitted (simple GT leaves undefined)
    assert 3 not in out


def test_yule_k_matches_textbook_formula(spark, tmp_path):
    docs = [
        (0, "w w w w", "mono", "s", 1),  # one type, N=4
        (1, "a b c d", "div", "s", 1),  # all distinct, K = 0
    ]
    _write_docs(spark, tmp_path, docs)
    out = {
        r["lang"]: r for r in QUERIES["yule_k"](spark, str(tmp_path)).collect()
    }
    # mono: sum r^2 = 16, N = 4 -> K = 1e4 * 12/16 = 7500
    assert out["mono"]["n_tokens"] == 4
    assert out["mono"]["vocab"] == 1
    assert out["mono"]["k_micro"] == math.floor(1e10 * 12 / 16.0)
    # fully diverse text has zero repeat mass
    assert out["div"]["k_micro"] == 0


def test_readability_matches_hand_computed_flesch(spark, tmp_path):
    docs = [
        (0, "the cat sat. the dog ran!", "en", "s", 1),
    ]
    _write_docs(spark, tmp_path, docs)
    out = QUERIES["readability_scores"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # words: 6 non-empty tokens ('sat.' etc count as words)
    assert r["tot_words"] == 6
    # vowel groups in 'the cat sat. the dog ran!': e,a,a,e,o,a = 6
    assert r["tot_syll"] == 6
    assert r["tot_sent"] == 2
    wps, spw = 6 / 2.0, 6 / 6.0
    assert r["fre_micro"] == math.floor(
        1e6 * (206.835 - 1.015 * wps - 84.6 * spw)
    )
    assert r["fk_grade_micro"] == math.floor(
        1e6 * (0.39 * wps + 11.8 * spw - 15.59)
    )


def test_readability_unpunctuated_doc_uses_sentence_floor(spark, tmp_path):
    _write_docs(spark, tmp_path, [(0, "aa bb cc", "en", "s", 1)])
    out = QUERIES["readability_scores"](spark, str(tmp_path)).collect()
    assert out[0]["tot_sent"] == 1  # greatest(count, 1) floor
    assert out[0]["tot_words"] == 3
