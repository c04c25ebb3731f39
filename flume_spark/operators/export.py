"""Training-shard export: the physical write path of a curation pipeline —
deterministically sharded parquet output plus a driver-side manifest, the
artifact a downstream training job consumes (sized shards for loader
parallelism, per-shard stats for mixing/accounting, counts to audit the
export against the logical corpus).

No reference analog (the reference moves jobs, not corpora); engine-native
per the LLM-pipeline mandate.  The logical manifest is the oracled query
`corpus_shard_manifest`; `write_training_shards` materializes exactly that
assignment and is round-trip-tested against it.

Scale shape: shard = pmod(id, shards) so assignment is a pure projection
(no shuffle to DECIDE placement); the single source exchange is the
repartition-to-shard that makes each output file exactly one shard
(loader-friendly: file == shard == unit of work).  The manifest is then
one partial-agg scan of the WRITTEN shards (never a re-evaluation of the
source pipeline) and only `shards` rows reach the driver.  At 100 TB
raise `shards` until bytes/shard fits the loader; assignment stays
deterministic so re-exports are reproducible.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flume_spark.operators.text import tokens_col


def shard_stats(
    df: DataFrame, id_col: str, text_col: str, shards: int
) -> DataFrame:
    """(shard, n_docs, n_tokens, n_chars): the logical manifest — exact
    integers, deterministic via pmod(id, shards), SQL-expressible."""
    return (
        df.select(
            F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
            F.size(tokens_col(text_col)).cast("long").alias("_t"),
            F.length(F.col(text_col)).cast("long").alias("_c"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_t").alias("n_tokens"),
            F.sum("_c").alias("n_chars"),
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 16,
) -> dict:
    """Write `df` as `shards` parquet files (shard=<k>/part...) plus a
    `_manifest.json` (underscore-prefixed: data readers ignore it)
    recording per-shard doc/token/char counts and the total.  Returns
    the manifest dict.

    One exchange (repartition on the shard key) so each shard is exactly
    one file.  The manifest is aggregated from the WRITTEN FILES, not the
    source frame: re-computing `df` would re-run the whole upstream
    pipeline a second time (doubling a 100 TB export), and reading back
    what landed also guarantees the manifest describes the actual output
    rather than what the source would produce if re-evaluated.  Assignment
    pmod(id, shards) is reproducible across runs and engines — the
    round-trip test checks the written files against the ORACLED
    shard_stats numbers, so the physical export is pinned to the logical
    manifest.
    """
    out = df.withColumn(
        "shard", F.pmod(F.col(id_col), F.lit(shards)).cast("int")
    )
    (
        out.repartition(shards, F.col("shard"))
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    written = df.sparkSession.read.parquet(path)
    stats = {
        int(r["shard"]): {
            "n_docs": int(r["n_docs"]),
            "n_tokens": int(r["n_tokens"]),
            "n_chars": int(r["n_chars"]),
        }
        for r in written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens_col(text_col)).cast("long")).alias("n_tokens"),
            F.sum(F.length(F.col(text_col)).cast("long")).alias("n_chars"),
        )
        .collect()
    }
    manifest = {
        "shards": shards,
        "id_col": id_col,
        "n_docs": sum(s["n_docs"] for s in stats.values()),
        "n_tokens": sum(s["n_tokens"] for s in stats.values()),
        "per_shard": {str(k): stats[k] for k in sorted(stats)},
    }
    tmp = os.path.join(path, "._manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, os.path.join(path, "_manifest.json"))
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "_manifest.json")) as f:
        return json.load(f)
