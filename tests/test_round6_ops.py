"""Round-6 operator tests: z-normalized SAX, claim-plan scale shape
adjuncts, and the auto-resolution sizing helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_spark.operators import timeseries

GAUSS4 = [(-6745, 10000), (0, 1), (6745, 10000)]


def _paa_from_rows(spark, rows):
    """rows: list of (key, [v0..v_{n-1}]) -> a PAA-shaped frame."""
    data = [
        (k, s, int(v)) for k, vals in rows for s, v in enumerate(vals)
    ]
    return spark.createDataFrame(data, "key string, seg long, mean_micro long")


def _words(df):
    return {r["key"]: r["word"] for r in df.collect()}


def test_znorm_offset_invariance(spark):
    """The whole point of z-normalization: adding a constant offset to a
    series must not change its word, while the absolute-scale variant
    (correctly) separates the levels."""
    base = [10, 20, 30, 40, 50, 60, 70, 80]
    paa = _paa_from_rows(
        spark,
        [
            ("lo", base),
            ("hi", [v + 100000 for v in base]),
            ("mid", [v + 5000 for v in base]),
        ],
    )
    zw = _words(timeseries.sax_words_znorm(paa, GAUSS4, 8))
    assert zw["lo"] == zw["hi"] == zw["mid"]
    aw = _words(timeseries.sax_words(paa, [50, 100000]))
    assert aw["lo"] != aw["hi"]  # absolute scale is level-sensitive


def test_znorm_amplitude_invariance(spark):
    """Positive scaling leaves z-scores unchanged (up to the one floor-sqrt
    boundary): 10x amplitude -> same word."""
    base = [100, 250, 400, 900, 400, 250, 100, 50]
    paa = _paa_from_rows(
        spark, [("x1", base), ("x10", [v * 10 for v in base])]
    )
    zw = _words(timeseries.sax_words_znorm(paa, GAUSS4, 8))
    assert zw["x1"] == zw["x10"]


def test_znorm_flat_series_share_one_block(spark):
    """v = 0 (zero variance) collapses to the last symbol repeated for
    every flat series — one shared block, documented behavior."""
    paa = _paa_from_rows(
        spark, [("f0", [7] * 8), ("f1", [12345] * 8), ("shaped", [0, 0, 0, 0, 9, 9, 9, 9])]
    )
    zw = _words(timeseries.sax_words_znorm(paa, GAUSS4, 8))
    assert zw["f0"] == zw["f1"] == "d" * 8
    assert zw["shaped"] != zw["f0"]


def test_znorm_matches_float_reference(spark):
    """The integer algebra must agree with a plain float z-norm SAX on
    cases away from the rounding boundary."""
    import math

    rows = [
        ("a", [10, 40, 90, 160, 250, 360, 490, 640]),
        ("b", [640, 490, 360, 250, 160, 90, 40, 10]),
        ("c", [5, 900, 5, 900, 5, 900, 5, 900]),
    ]
    paa = _paa_from_rows(spark, rows)
    zw = _words(timeseries.sax_words_znorm(paa, GAUSS4, 8))

    def ref_word(vals):
        n = len(vals)
        mu = sum(vals) / n
        sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / n)
        out = []
        for v in vals:
            z = (v - mu) / sd
            if z < -0.6745:
                out.append("a")
            elif z < 0:
                out.append("b")
            elif z < 0.6745:
                out.append("c")
            else:
                out.append("d")
        return "".join(out)

    for k, vals in rows:
        assert zw[k] == ref_word(vals), k


def test_znorm_rejects_empty_and_bad_breakpoints(spark):
    paa = _paa_from_rows(spark, [("a", [1, 2, 3, 4])])
    with pytest.raises(ValueError):
        timeseries.sax_words_znorm(paa, [], 4)
    with pytest.raises(ValueError):
        timeseries.sax_words_znorm(paa, [(1, 0)], 4)


def test_znorm_single_shuffle(spark):
    """Stats ride a key-partitioned window, not a join: one exchange for
    the whole words plan beyond the PAA input."""
    from flume_spark.plans import n_nodes

    paa = _paa_from_rows(spark, [("a", [1, 2, 3, 4]), ("b", [4, 3, 2, 1])])
    words = timeseries.sax_words_znorm(paa, GAUSS4, 4)
    assert n_nodes(words, "Exchange") <= 2  # parallelize input + key grain
