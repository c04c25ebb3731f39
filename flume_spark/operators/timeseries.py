"""Time-series similarity search over keyed event streams — PAA
segmentation + SAX-style symbolization as a BLOCKING key, then exact
distance verification of candidates only (the LSH-verified-pairs
treatment applied to series; pattern reference: "Time Series Similarity
Search for Streaming Data in Distributed Systems", EDBT 2019 — the
PAA/symbolize/block/verify pipeline, re-expressed Spark-first).

No reference analog (the queue processes jobs, not series);
engine-native per the pipeline mandate.

Exactness discipline (the repo's float policy, applied end to end):
- PAA segment means are integer micro-units via the round-half-up
  identity (2s + c) div (2c) — aggregation-order-independent, so the
  whole segmentation hash-checks cross-engine.
- Symbolization comes in two variants: `sax_words` is CASE thresholds on
  the absolute integer value scale (level-sensitive blocking, zero
  rounding boundaries), and `sax_words_znorm` is classic per-series
  z-normalized SAX with the float division eliminated algebraically —
  the symbol test is a pure BIGINT comparison against
  floor(sqrt(double(n·Σm²−S²))), whose one rounding boundary is
  engine-identical (see its docstring).  Use znorm when series differ
  mainly by offset/amplitude (shape search), absolute when the LEVEL is
  the signal (capacity bands, spend tiers).
- Pair distance is an exact BIGINT sum of squared integer differences.

Scale shape: one key-grain shuffle for segment sums; the key x segment
spine is a broadcast of `n_segments` rows; candidate pairs come from a
word-block equi-join (never all-pairs — block sizes bound the join);
verification joins each candidate to its 2 x n_segments PAA rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paa_segments(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    start_date: str,
    span_days: int,
    n_segments: int,
) -> DataFrame:
    """(key, seg, mean_micro): exact-integer piecewise-aggregate
    approximation of each key's value series over a FIXED window.

    seg = days_since(start) * n_segments div span_days (integer, both
    engines' truncating division on non-negatives); mean_micro is the
    segment's mean value in 1e-4 units via (2s + c) div (2c).  Segments
    with no rows are zero-filled through a key x segment spine (absent
    activity IS zero activity — the semantics a similarity search over
    activity series wants, and what keeps every word the same length).
    Rows outside [start, start + span_days) are excluded.
    """
    days = F.expr(
        f"datediff(to_date({ts_col}), DATE'{start_date}')"
    )
    base = (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            days.alias("_d"),
            F.round(F.col(value_col) * 10000).cast("long").alias("_v4"),
        )
        .filter((F.col("_d") >= 0) & (F.col("_d") < span_days))
        .select(
            "key",
            F.expr(f"CAST((_d * {n_segments}) div {span_days} AS BIGINT)").alias(
                "seg"
            ),
            "_v4",
        )
    )
    agg = base.groupBy("key", "seg").agg(
        F.sum("_v4").alias("_s"), F.count(F.lit(1)).alias("_c")
    )
    spine = base.select("key").distinct().crossJoin(
        F.broadcast(
            df.sparkSession.range(n_segments).select(F.col("id").alias("seg"))
        )
    )
    return spine.join(agg, ["key", "seg"], "left").select(
        "key",
        "seg",
        F.when(F.col("_c").isNull(), F.lit(0).cast("long"))
        .otherwise(F.expr("(2 * _s + _c) div (2 * _c)"))
        .alias("mean_micro"),
    )


def sax_words(paa: DataFrame, breakpoints: list[int]) -> DataFrame:
    """(key, word): one symbol per segment via CASE thresholds on
    mean_micro (alphabet a, b, c, ... — len(breakpoints)+1 symbols),
    concatenated in segment order.  Equal words = similar coarse shape:
    the blocking key for the candidate join."""
    if not breakpoints:
        raise ValueError(
            "sax_words requires at least one breakpoint: a 1-symbol "
            "alphabet maps every series to the same word, which is not "
            "a blocking key"
        )
    alphabet = [chr(ord("a") + i) for i in range(len(breakpoints) + 1)]
    expr = F.when(F.col("mean_micro") < breakpoints[0], F.lit(alphabet[0]))
    for i, bp in enumerate(breakpoints[1:], start=1):
        expr = expr.when(F.col("mean_micro") < bp, F.lit(alphabet[i]))
    sym = expr.otherwise(F.lit(alphabet[-1]))
    per = paa.select("key", "seg", sym.alias("sym"))
    return per.groupBy("key").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                lambda x: x["sym"],
            ),
        ).alias("word")
    )


def sax_words_znorm(
    paa: DataFrame,
    breakpoints: list[tuple[int, int]],
    n_segments: int,
) -> DataFrame:
    """(key, word): classic z-normalized SAX, exact-integer end to end.

    Per-series z-normalization makes the word a SHAPE key — two series
    differing only by offset/amplitude get the same word, which the
    absolute-scale `sax_words` cannot do (its documented trade).  The
    float division classic SAX needs is eliminated algebraically:

      z_i < b  ⟺  (m_i - μ)/σ < b  ⟺  d_i < b·sqrt(v)      where
      d_i = n·m_i - S (integer),  S = Σm,  v = n·Σm² - S² = n²σ² (integer,
      ≥ 0 by Cauchy-Schwarz).

    With rational breakpoints b = p/q (q > 0) the symbol test is the pure
    BIGINT comparison  d_i·q < p·s_v,  where s_v = floor(sqrt(double(v)))
    is THE one documented rounding boundary: int64→double is
    round-nearest-even and sqrt is IEEE-correctly-rounded in both
    engines, so s_v is engine-identical even where it differs from the
    true integer sqrt by 1.  Everything else is exact integers, so the
    whole word hash-checks cross-engine.

    Flat series (v = 0 ⇒ every d_i = 0) fail every `< p·0` test and all
    collapse to the LAST symbol repeated — one shared block, which is the
    right blocking outcome (flat series are all trivially similar).

    `breakpoints` are (numer, denom) rationals in z-units, ascending —
    e.g. the Gaussian equiprobable cuts for a 4-symbol alphabet:
    [(-6745, 10000), (0, 1), (6745, 10000)].  `n_segments` must match the
    PAA (the zero-filled spine guarantees exactly n rows per key, so n is
    a compile-time constant, not a per-key count).

    One shuffle: the per-key stats ride a key-partitioned window over the
    PAA rows instead of a join.
    """
    if not breakpoints:
        raise ValueError(
            "sax_words_znorm requires at least one breakpoint: a 1-symbol "
            "alphabet maps every series to the same word, which is not "
            "a blocking key"
        )
    for p, q in breakpoints:
        if q <= 0:
            raise ValueError(f"breakpoint denominators must be > 0, got {q}")
    from pyspark.sql.window import Window

    alphabet = [chr(ord("a") + i) for i in range(len(breakpoints) + 1)]
    wk = Window.partitionBy("key")
    n = F.lit(n_segments).cast("long")
    m = F.col("mean_micro")
    scored = paa.select(
        "key",
        "seg",
        m,
        F.sum(m).over(wk).alias("_S"),
        F.sum(m * m).over(wk).alias("_S2"),
    ).select(
        "key",
        "seg",
        (n * m - F.col("_S")).alias("_d"),
        F.floor(
            F.sqrt((n * F.col("_S2") - F.col("_S") * F.col("_S")).cast("double"))
        )
        .cast("long")
        .alias("_sv"),
    )
    p0, q0 = breakpoints[0]
    expr = F.when(
        F.col("_d") * F.lit(q0) < F.lit(p0) * F.col("_sv"), F.lit(alphabet[0])
    )
    for i, (p, q) in enumerate(breakpoints[1:], start=1):
        expr = expr.when(
            F.col("_d") * F.lit(q) < F.lit(p) * F.col("_sv"), F.lit(alphabet[i])
        )
    sym = expr.otherwise(F.lit(alphabet[-1]))
    per = scored.select("key", "seg", sym.alias("sym"))
    return per.groupBy("key").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                lambda x: x["sym"],
            ),
        ).alias("word")
    )


def ts_similar_pairs(
    paa: DataFrame, words: DataFrame, max_dist_micro2: int
) -> DataFrame:
    """(key_a, key_b, dist_micro2): candidate pairs from the word-block
    equi-join (key_a < key_b), verified by the EXACT integer PAA
    distance sum((m_a - m_b)^2) <= max_dist_micro2.  Never all-pairs:
    the block join bounds candidates, verification touches only
    candidates x n_segments rows."""
    cand = (
        words.select(F.col("key").alias("key_a"), "word")
        .join(words.select(F.col("key").alias("key_b"), "word"), "word")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )
    pa = paa.select(
        F.col("key").alias("key_a"), "seg", F.col("mean_micro").alias("m_a")
    )
    pb = paa.select(
        F.col("key").alias("key_b"), "seg", F.col("mean_micro").alias("m_b")
    )
    return (
        cand.join(pa, "key_a")
        .join(pb, ["key_b", "seg"])
        .groupBy("key_a", "key_b")
        .agg(
            F.sum(
                (F.col("m_a") - F.col("m_b")) * (F.col("m_a") - F.col("m_b"))
            ).alias("dist_micro2")
        )
        .filter(F.col("dist_micro2") <= max_dist_micro2)
    )
