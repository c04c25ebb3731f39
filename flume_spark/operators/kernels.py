"""Shared Arrow-batch kernels for grouped vectorized work.

`grouped_arrow_apply` is the repo's answer to a structural Spark cost:
`groupBy(keys).applyInPandas(fn)` pays a fixed Arrow/pandas boundary
(~ms) PER GROUP, which dominates wall-clock when the grouping is
thousands of small groups — exactly the regime SemDeDup-style operators
live in once k grows with the corpus (clusters are deliberately small).
The --semingest probe measured that overhead 4:1 against the math at
k=2420 (BASELINE.md, round 9).

The fix keeps the same shuffle (one exchange on the group keys) but moves
the pandas boundary to per-PARTITION: rows are hash-partitioned AND
sorted by the group keys, then a `mapInPandas` kernel walks each Arrow
batch and applies `fn` per group with pandas groupby (microseconds per
group).  Only the trailing group of a batch can straddle the batch
boundary — it carries over — so memory stays bounded by one group plus
one Arrow batch, never the whole partition.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd

from pyspark.sql import DataFrame


def walk_groups(
    batches,
    cols: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
):
    """The partition-walking core of `grouped_arrow_apply`, separated so
    the straddle/carry invariant is property-testable without Spark:
    `batches` is an iterator of pandas frames whose concatenation is
    group-CONTIGUOUS on `cols` (sorted within the partition); yields
    `fn(group)` for every group, applying `fn` exactly once per group no
    matter where the batch boundaries fall.  Only the trailing group of a
    batch can continue into the next, so it carries; everything earlier in
    the batch is complete by the contiguity contract."""
    cols = list(cols)
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if pdf.empty:
            continue
        last = tuple(pdf[c].iloc[-1] for c in cols)
        mask = pd.Series(True, index=pdf.index)
        for c, v in zip(cols, last):
            # null-safe equality: Spark's groupBy keeps a null-key group,
            # so the trailing-group carry must recognize it too (plain ==
            # is always False against NaN/None and would drop those rows).
            if pd.isna(v):
                mask &= pdf[c].isna()
            else:
                mask &= pdf[c] == v
        done = pdf[~mask]
        carry = pdf[mask]
        for _, g in done.groupby(cols, sort=False, dropna=False):
            out = fn(g)
            if len(out):
                yield out
    if carry is not None and not carry.empty:
        for _, g in carry.groupby(cols, sort=False, dropna=False):
            out = fn(g)
            if len(out):
                yield out


def grouped_arrow_apply(
    df: DataFrame,
    group_cols: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Apply `fn` to each group of `df` (grouped by `group_cols`), with the
    Arrow boundary paid per partition instead of per group.

    Semantically equivalent to `df.groupBy(*group_cols).applyInPandas(fn,
    schema)` for any `fn` that is a pure per-group function; `fn` receives
    each group's rows as one pandas frame (all group-column values equal)
    and returns a frame matching `schema`.  Empty returns are skipped.
    Null group keys form their own group, same as Spark's groupBy (the
    walk uses null-safe key equality and pandas `dropna=False`).
    """
    cols = list(group_cols)

    def _partition(batches):
        yield from walk_groups(batches, cols, fn)

    return (
        df.repartition(*cols)
        .sortWithinPartitions(*cols)
        .mapInPandas(_partition, schema=schema)
    )
