"""df.observe corpus metrics: zero-extra-scan telemetry (O1 analog for the
relational surface)."""

from __future__ import annotations

from flume_spark.operators.text import corpus_stats_observed
from tests.conftest import SF_ORACLE


def test_corpus_stats_ride_the_main_action(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    observed, obs = corpus_stats_observed(docs, "doc_id", "text")
    rows = observed.collect()  # ONE action: result + metrics together
    metrics = obs.get
    assert metrics["n_docs"] == len(rows) == docs.count()
    assert metrics["total_tokens"] > 0
    assert 0.0 < metrics["mean_quality"] <= 1.0
