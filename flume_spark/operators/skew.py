"""Skew mitigation — salted joins and salted distinct aggregation.

At 100 TB a handful of hot keys (a viral document, a default tenant id, a
null-ish sentinel) can put >100x the median load on one reducer.  AQE's
skew-join handles the sort-merge case at runtime; these operators are the
declarative fallback for when you know the skew up front or need it for
aggregation shapes AQE can't split:

- ``salted_join``: replicate the small side ``n_salt`` times and scatter the
  big side's hot keys across ``(key, salt)`` sub-partitions.  Result set is
  identical to the plain join (oracle-checked by the `join_skew_salted`
  declared query); only the physical distribution changes.
- ``salted_count_distinct``: two-phase exact distinct count.  Phase 1
  partitions each key's VALUE space by hash into ``n_salt`` disjoint slices
  (so per-slice distinct counts are additive); phase 2 sums the slices.
  Turns one giant per-key distinct hash table into ``n_salt`` bounded ones.

The reference engine has no relational surface (Redis job queue); these are
part of the engine-native scale toolkit mandated by SURVEY.md §2.3/§2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SALT = "__flume_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_src: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side to a replicable small side.

    ``salt_src`` is a big-side column (ideally unique-ish, e.g. the fact
    table's line id) hashed to pick the salt deterministically — same input,
    same plan, same partitioning, run after run.  The small side is exploded
    ``n_salt``x, so its shuffle volume grows by that factor: keep ``n_salt``
    around the skew ratio you're flattening, not higher.

    Equi-join semantics only (inner/left): every (key, salt) pair on the big
    side finds exactly the one replicated small-side row for its salt, so
    multiplicities match the unsalted join row-for-row.
    """
    assert how in ("inner", "left"), "salted_join is for equi inner/left joins"
    b = big.withColumn(
        SALT, F.pmod(F.crc32(F.col(salt_src).cast("string")), F.lit(n_salt)).cast("int")
    )
    s = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias(SALT)
    )
    return b.join(s, on=[*on, SALT], how=how).drop(SALT)


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    n_salt: int = 64,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-proof.

    ``xxhash64(value) % n_salt`` slices each key's value space into disjoint
    buckets; distinct counts of disjoint sets are additive, so the per-slice
    partial counts sum to the exact global distinct count.  Both phases are
    ordinary hash aggregations with map-side partials — no single reducer
    ever holds a hot key's full distinct set.
    """
    phase1 = df.groupBy(
        *keys, F.pmod(F.xxhash64(F.col(value)), F.lit(n_salt)).alias(SALT)
    ).agg(F.count_distinct(F.col(value)).alias("__partial"))
    return phase1.groupBy(*keys).agg(F.sum("__partial").alias(out_col))


def sketch_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    lg_k: int = 12,
    out_col: str = "sketch",
) -> DataFrame:
    """Per-key mergeable HLL sketch of DISTINCT(value) — the incremental
    form of distinct counting.  Where `salted_count_distinct` recomputes
    exactly, sketches persist: compute one sketch per key per ingest slice
    (day, partition, source), store the binary, and answer "distinct over
    any slice union" later by merging — no rescan of history.  Merge order
    is irrelevant (register state is max-per-bucket); merged and
    whole-corpus estimates agree to within the sketch's error bound, not
    bit-exactly (datasketches' sparse->dense transitions differ by path)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value), F.lit(lg_k)).alias(out_col)
    )


def skew_report(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Key-skew diagnostic — the measurement that decides whether a join/
    agg on `key_col` needs salting, AQE skew handling, or a broadcast:
    per-key row counts reduced to the top-N hottest keys plus the
    corpus-level ratios that matter (hottest/mean and hottest-key share).

    One partial-agg shuffle on the key (count per key), then a top-N and
    a 4-scalar global aggregate that both reuse it — never a second scan.
    All ratios are exact-integer divisions rounded at the end, so the
    report is engine-reproducible (oracled as skew_report_lineitem).

    Returns top-N rows: (key, n_rows, pct_of_total, hot_to_mean) ordered
    by n_rows desc with key tie-break.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") * 100.0 / F.col("total"), 6).alias(
                "pct_of_total"
            ),
            # hot/mean = n_rows / (total/n_keys).  The product goes through
            # DOUBLE first (n_rows * 1.0 * n_keys): a long*long product
            # overflows at ~1e10-row keys x 1e9 keys, and the two engines
            # disagree on overflow (Spark wraps, DuckDB errors) — doubles
            # lose ulps instead, identically on both sides.
            F.round(
                F.col("n_rows").cast("double")
                * F.col("n_keys")
                / F.col("total"),
                6,
            ).alias("hot_to_mean"),
        )
        .orderBy(F.col("n_rows").desc(), "key")
        .limit(top_n)
    )


def _cm_bucket(key_col: str, r: int, width: int, seed: str):
    """Row r's bucket for a key: leading 32 md5 bits mod width.  ONE
    definition shared by build and probe; countmin_bucket_sql generates
    the identical DuckDB text so the oracle can't drift."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:{r}:"), F.col(key_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )


def countmin_bucket_sql(key_sql: str, r: int, width: int, seed: str) -> str:
    return (
        f"CAST(CAST('0x' || substring(md5('{seed}:{r}:' || "
        f"CAST({key_sql} AS VARCHAR)), 1, 8) AS BIGINT) % {width} AS BIGINT)"
    )


def countmin_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    seed: str = "flume",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch as a (row, bucket, counter) table — the mergeable
    frequency-sketch counterpart of the HLL distinct sketch: d x w
    counters answer "how often did key k appear" within additive error
    εN (ε = e/width) at confidence 1-δ (δ = e^-depth), in O(d*w) space
    regardless of cardinality.  Merging slices = summing counter tables
    cell-wise (countmin_merge) — the property that lets a 100 TB pipeline
    keep per-day sketches and answer over any date range without rescans.

    Unlike the estimate (approximate by design), the TABLE is fully
    deterministic: row r's bucket for key k is the leading 32 bits of
    md5('<seed>:r:' || k) mod width — engine-reproducible, so the oracle
    hash-checks the whole sketch build.  `weight_col` makes it a weighted
    frequency sketch (e.g. token counts); default counts rows.

    Returns (row, bucket, counter): depth*width rows max (absent cells
    are zero — consumers take min over present rows, missing row => 0).
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = []
    for r in range(depth):
        bucket = _cm_bucket(key_col, r, width, seed)
        rows.append(
            df.select(
                F.lit(r).alias("row"), bucket.alias("bucket"), w.alias("_w")
            )
        )
    union = rows[0]
    for extra in rows[1:]:
        union = union.unionByName(extra)
    # one shuffle on (row, bucket) — d*w groups, never data-sized
    return union.groupBy("row", "bucket").agg(F.sum("_w").alias("counter"))


def countmin_estimate(
    table: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    seed: str = "flume",
) -> DataFrame:
    """Point-query the sketch for each key in `keys`: min over rows of the
    key's counter (missing cell = 0).  The estimate over-counts only
    (hash collisions add), bounded by εN — both properties are tested.
    The sketch table broadcasts (d*w cells), so estimation is map-side."""
    probes = []
    for r in range(depth):
        bucket = _cm_bucket(key_col, r, width, seed)
        probes.append(
            keys.select(
                F.col(key_col), F.lit(r).alias("row"), bucket.alias("bucket")
            )
        )
    probe = probes[0]
    for extra in probes[1:]:
        probe = probe.unionByName(extra)
    joined = probe.join(F.broadcast(table), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("freq_estimate")
    )


def countmin_merge(tables: DataFrame) -> DataFrame:
    """Merge per-slice sketch tables: cell-wise counter sum — order-free."""
    return tables.groupBy("row", "bucket").agg(
        F.sum("counter").alias("counter")
    )


def merge_sketch_estimate(
    sketches: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
    out_col: str = "n_distinct_approx",
) -> DataFrame:
    """Union per-key sketches (e.g. across ingest slices) and estimate."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(out_col)
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketch — the mergeable QUANTILE counterpart of the
# count-min frequency sketch: bounded-domain quantile telemetry in O(bins)
# state per slice, cell-wise-exact merge, fully deterministic build.
# ---------------------------------------------------------------------------


def histogram_bin(value_col: str, lo: float, hi: float, bins: int):
    """Bin index for a value: clamp(floor((x - lo) * bins / (hi - lo)),
    0, bins-1).  The expression tree is spelled EXACTLY as
    `histogram_bin_sql` emits it (same literals, same association), so
    IEEE float determinism makes the whole histogram engine-identical —
    the countmin_bucket treatment applied to range binning.  Values
    outside [lo, hi] clamp into the edge bins (documented semantics:
    the domain bound is part of the sketch's contract, like width)."""
    raw = F.floor(
        (F.col(value_col) - F.lit(lo)) * F.lit(float(bins)) / (F.lit(hi) - F.lit(lo))
    ).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("long")


def histogram_bin_sql(value_sql: str, lo: float, hi: float, bins: int) -> str:
    """The DuckDB-identical bin expression.  Two engine bridges: floor ->
    BIGINT cast (DuckDB floor returns DOUBLE, Spark BIGINT), and every
    numeric literal wrapped in CAST(... AS DOUBLE) — DuckDB parses bare
    decimal literals as DECIMAL, whose exact arithmetic diverges from
    (and at ~17 significant digits overflows on) the IEEE doubles Spark's
    F.lit emits; the cast pins both engines to the same double tree
    (property-tested across the parameter space in test_round5_ops)."""

    def d(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    return (
        f"least(greatest(CAST(floor(({value_sql} - {d(lo)}) * {d(float(bins))} "
        f"/ ({d(hi)} - {d(lo)})) AS BIGINT), 0), {bins - 1})"
    )


def histogram_table(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-bin histogram as a (bin, counter) table: ≤ `bins` rows of
    exact integer counts (NULL values dropped — they carry no position).
    ONE shuffle on bin (`bins` groups, never data-sized).  Merging slices
    = summing counters cell-wise (histogram_merge) — per-slice state is
    O(bins) regardless of row count, so a 100 TB pipeline keeps per-day
    histograms and answers quantiles over any date range without
    rescans.  Quantile error from the merged table is at most one bin
    width of the value domain ((hi-lo)/bins); tighten with more bins —
    state is still trivial at 4096.  Deterministic by construction
    (exact counts, engine-identical bin expression): the whole table
    hash-checks cross-engine, unlike sampling-based quantile sketches."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(histogram_bin(value_col, lo, hi, bins).alias("bin"), w.alias("_w"))
        .groupBy("bin")
        .agg(F.sum("_w").alias("counter"))
    )


def histogram_merge(tables: DataFrame) -> DataFrame:
    """Merge per-slice histograms: cell-wise counter sum — order-free."""
    return tables.groupBy("bin").agg(F.sum("counter").alias("counter"))


def histogram_quantile_est(
    table: DataFrame, qs: list[float], lo: float, hi: float, bins: int
) -> DataFrame:
    """Quantile estimates from a (merged) histogram: for each q, the
    first bin whose running count reaches rank ceil(q*N); the estimate
    is that bin's UPPER edge — an over-estimate by at most one bin
    width, and fully deterministic (exact integer ranks, one float
    expression in a pinned shape).  Returns (q, n_total, bin, est_hi).

    The cumsum window is over the ≤`bins`-row histogram — a bounded
    SinglePartition stage (the documented tiny-frame exception, same as
    running_distinct_users' day spine); the q probe is a ≤|qs|-row
    broadcast theta-join, the accepted non-equi form."""
    spark = table.sparkSession
    c = table.select(
        "bin",
        "counter",
        F.sum("counter").over(Window.orderBy("bin")).alias("cum"),
        F.sum("counter").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n_total"),
    )
    qdf = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    crossed = c.join(
        F.broadcast(qdf),
        F.col("cum") >= F.ceil(F.col("q") * F.col("n_total")),
    )
    return crossed.groupBy("q", "n_total").agg(
        F.min("bin").alias("bin"),
        (
            F.lit(lo)
            + (F.min("bin") + F.lit(1))
            * ((F.lit(hi) - F.lit(lo)) / F.lit(float(bins)))
        ).alias("est_hi"),
    )


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog — the DISTINCT-count member of the mergeable
# sketch family (count-min = frequency, histogram = quantiles, HLL =
# cardinality).  Unlike sketch_distinct (Spark's datasketches binary, whose
# sparse/dense encoding is path-dependent), this register TABLE is a pure
# function of the input set: md5-hashed, exact-integer registers, so build
# and merge hash-check cross-engine and merged == whole-corpus bit-for-bit.
# Flajolet et al., "HyperLogLog: the analysis of a near-optimal cardinality
# estimation algorithm" (AofA 2007).
# ---------------------------------------------------------------------------

# 60-bit hash (15 md5 hex chars — fits BIGINT), p bucket bits, 60-p rho bits.
_HLL_HASH_BITS = 60


def _hll_h60(value_col: str, seed: str):
    """60-bit uniform hash of the value, identical in Spark and DuckDB
    (hll_h60_sql) — leading 15 hex chars of md5(seed || ':' || value)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(value_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def hll_h60_sql(value_sql: str, seed: str) -> str:
    return (
        f"CAST('0x' || substring(md5('{seed}:' || CAST({value_sql} AS VARCHAR)),"
        f" 1, 15) AS BIGINT)"
    )


def hll_table(
    df: DataFrame,
    keys: list[str],
    value: str,
    p: int = 8,
    seed: str = "hll",
) -> DataFrame:
    """Per-key HLL register table: (keys..., bucket, reg), one row per
    NON-EMPTY bucket (reg >= 1; absent buckets mean register 0 — the
    estimator accounts for them arithmetically, so no m-row spine is ever
    materialized).

    bucket = low p bits of a 60-bit md5 hash; reg = max over values of
    rho(w) where w is the remaining 60-p bits and rho = leading zeros + 1
    (computed exactly as (60-p) - bitlength(w) + 1 via the binary-string
    length — no float log2, whose boundary rounding could disagree
    cross-engine).

    One hash-aggregate shuffle with map-side partial max; state is
    <= 2^p rows per key regardless of cardinality.  Merging slices =
    max per cell (hll_merge) — register max is associative/commutative/
    idempotent, so re-merges and replays are harmless (the property the
    streaming ingestor leans on).
    """
    m = 1 << p
    rho_bits = _HLL_HASH_BITS - p
    h = df.select(*keys, _hll_h60(value, seed).alias("h60"))
    w_expr = f"(h60 div {m})"
    return (
        h.select(
            *keys,
            (F.col("h60") % m).alias("bucket"),
            F.expr(
                f"CASE WHEN {w_expr} = 0 THEN {rho_bits + 1} "
                f"ELSE {rho_bits + 1} - length(bin({w_expr})) END"
            ).alias("rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(tables: DataFrame, keys: list[str]) -> DataFrame:
    """Merge per-slice register tables: cell-wise max — order-free,
    idempotent (safe under replay), and exactly equal to building one
    table over the unioned input."""
    return tables.groupBy(*keys, "bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(
    regs: DataFrame,
    keys: list[str],
    p: int = 8,
) -> DataFrame:
    """Cardinality estimate from a register table:
    (keys..., n_hit, harmonic_sum, hll_est).

    The harmonic sum S = sum over all m buckets of 2^(-reg) is kept EXACT
    by scaling: sum(1 << (rho_bits+1-reg)) over present rows plus
    (m - n_hit) << (rho_bits+1) for the absent (reg=0) buckets — max
    m * 2^(rho_bits+1) = 2^(p+rho_bits+2) < 2^63, so the BIGINT never
    overflows and both engines agree bit-for-bit.  The only float op is
    the final alpha*m^2*2^scale / S division of engine-identical inputs,
    so even the double estimate hash-checks.
    """
    m = 1 << p
    rho_bits = _HLL_HASH_BITS - p
    scale = rho_bits + 1  # reg ranges 1..scale; 2^-reg scaled by 2^scale
    alpha = 0.7213 / (1 + 1.079 / m)
    c = alpha * m * m * float(1 << scale)
    return (
        regs.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_hit"),
            # coalesce: a keyless aggregate over ZERO register rows (empty
            # slice) must yield the all-registers-zero harmonic sum — the
            # raw estimator's alpha*m floor — not a NULL estimate
            F.coalesce(
                F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - reg)")),
                F.lit(0).cast("long"),
            ).alias("__present"),
        )
        .select(
            *keys,
            "n_hit",
            (
                F.col("__present")
                + (F.lit(m) - F.col("n_hit")) * F.lit(1 << scale).cast("long")
            ).alias("harmonic_sum"),
        )
        .select(
            *keys,
            "n_hit",
            "harmonic_sum",
            (F.lit(c) / F.col("harmonic_sum").cast("double")).alias("hll_est"),
        )
    )
