"""Auto-resolution sizing for the blocked similarity operators.

The probe evidence (BASELINE.md: LSH x100 ingest, SAX ts_search x50,
cosine block matmul) all shows the same law: blocked similarity stays
sub-linear ONLY while the blocking resolution grows with the corpus —
at fixed resolution blocks densify ~linearly and verify cost tracks the
(growing) candidate count, not the plan.  These helpers derive the
resolution from corpus size / target occupancy so a 100x-scale user
lands on the documented curve instead of rediscovering it.

All pure integer/driver-side math (no Spark): call them once when
configuring a job, pass the result to the operator.

Derivations (each helper's docstring carries its own):
- block occupancy: n keys uniformly over W blocks collide in
  ~ n^2 / (2W) pairs, so W >= n^2 / (2 * target_pairs) bounds the
  EXPECTED candidate count; equivalently W >= n / target_block bounds
  the expected block SIZE.  Real spreads are skewed, so treat the
  result as a floor, not an exact guarantee (the probes measure the
  real skew: pairs/user 1.6-5 at suggested settings).
- LSH S-curve: a (bands=b, rows=r) MinHash scheme admits a pair of true
  Jaccard j with probability 1 - (1 - j^r)^b, whose inflection sits at
  j* ~ (1/b)^(1/r) (Leskovec/Rajaraman/Ullman, "Mining of Massive
  Datasets" §3.4.3 — public).  Given a hash budget, pick the divisor
  whose j* lands closest to the wanted threshold.
"""

from __future__ import annotations

import math

__all__ = [
    "suggest_block_space",
    "suggest_sax_resolution",
    "suggest_lsh_bands",
    "suggest_cosine_blocks",
    "suggest_hll_p",
]


def suggest_block_space(n_keys: int, target_pairs: int) -> int:
    """Minimum block-key-space size W so the EXPECTED candidate-pair count
    of a uniform blocking stays <= target_pairs: W = ceil(n^2 / (2*p)).
    The generic rule behind every helper here; use it directly when the
    blocking key space is a free parameter (e.g. a salted hash)."""
    if n_keys < 0 or target_pairs <= 0:
        raise ValueError("n_keys must be >= 0 and target_pairs > 0")
    if n_keys < 2:
        return 1
    return max(1, math.ceil(n_keys * n_keys / (2 * target_pairs)))


def suggest_sax_resolution(
    n_keys: int, target_block: int = 4, alphabet: int = 4
) -> int:
    """n_segments for the SAX word space: smallest s with
    alphabet^s >= n_keys / target_block, so the expected word-block size
    stays <= target_block as the corpus grows (the BASELINE.md ts_search
    rule: word space must grow with the corpus, like LSH bands).

    Reproduces the repo's settings from their corpus sizes: the declared
    sf0.01 query (150 users, alphabet 3, block ~2) -> 4 segments; the
    x50 probe (75k users, alphabet 4, block ~4) -> 8 segments (65k words
    — the resolution BASELINE.md names for that corpus).
    """
    if n_keys < 0 or target_block <= 0:
        raise ValueError("n_keys must be >= 0 and target_block > 0")
    if alphabet < 2:
        raise ValueError("alphabet must have >= 2 symbols to block on")
    need = max(1, math.ceil(n_keys / target_block))
    s = 1
    while alphabet**s < need:
        s += 1
    return s


def suggest_lsh_bands(num_hashes: int, threshold: float) -> int:
    """Band count for a MinHash budget: the divisor b of num_hashes whose
    S-curve inflection (1/b)^(b/num_hashes) lands closest to `threshold`
    (ties break toward MORE bands = higher recall).  Monotone: a lower
    threshold never yields fewer bands.

    Reproduces the repo's settings: (num_hashes=8, t=0.5) -> 4 bands
    (r=2, j* = 0.5 exactly — dedup_minhash_lsh's configuration) and
    (num_hashes=16, t=0.7) -> 4 bands (r=4, j* ~ 0.707 — the
    lsh_verified_pairs default, whose candidate cut sits above its 0.3
    verify threshold by design: LSH tunes recall at the similarity you
    care about, the exact verify then keeps everything above the looser
    report cut).
    """
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    divisors = [b for b in range(1, num_hashes + 1) if num_hashes % b == 0]
    # distance in log-threshold space (the curve is geometric in j);
    # tie-break toward more bands (recall): scan b DESCENDING and replace
    # only on strict improvement, so an equal-distance smaller b never
    # displaces the larger-b candidate seen first
    best_b, best_d = None, None
    for b in sorted(divisors, reverse=True):
        r = num_hashes // b
        j_star = (1.0 / b) ** (1.0 / r)
        d = abs(math.log(max(j_star, 1e-12)) - math.log(threshold))
        if best_d is None or d < best_d - 1e-12:
            best_b, best_d = b, d
    return best_b


def suggest_cosine_blocks(n_vecs: int, target_rows_per_block: int = 2048) -> int:
    """Block count for the block-matrix cosine join: blocks = ceil(n /
    target_rows), keeping per-block submatrices near-constant as the
    corpus grows (the BASELINE.md cosine probe picks blocks ~ sqrt(f)
    for an f-times corpus — which is exactly what a fixed rows-per-block
    target produces on each side of the pair grid)."""
    if n_vecs < 0 or target_rows_per_block <= 0:
        raise ValueError("n_vecs must be >= 0 and target_rows_per_block > 0")
    return max(1, math.ceil(n_vecs / target_rows_per_block))


def suggest_hll_p(n_expected: int, rel_err: float = 0.02) -> int:
    """Register-bit count p for the deterministic HLL (skew.hll_table):
    smallest p with 1.04 / sqrt(2^p) <= rel_err (the standard HLL
    standard-error law, Flajolet et al. 2007), then capped so the
    expected cardinality stays in the RAW estimator's valid regime
    (n > 2.5 * 2^p) — hll_estimate deliberately has no linear-counting
    small-range branch (ln() is not engine-identical), so over-sized
    register files at small n would bias high rather than get the
    standard correction.  Clamped to [4, 16]: the upper bound respects
    the 60-bit hash budget and marks where exact salted counting
    (skew.salted_count_distinct) is usually the better trade.
    """
    if n_expected < 0:
        raise ValueError("n_expected must be >= 0")
    if not (0.0 < rel_err < 1.0):
        raise ValueError("rel_err must be in (0, 1)")
    p = 4
    while p < 16 and 1.04 / math.sqrt(1 << p) > rel_err:
        p += 1
    # raw-regime cap: 2.5 * 2^p <= n  <=>  p <= log2(n / 2.5)
    if n_expected > 0:
        p_raw = max(4, int(math.floor(math.log2(max(n_expected / 2.5, 1.0)))))
        p = min(p, p_raw)
    return p
