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


def test_pii_scrub_redacts_crafted_rows(spark):
    from flume_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail me at Bob.Smith+x@Example.ORG today"),
            (2, "see https://a.example/path?q=1 and 123-45-6789"),
            (3, "clean text"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df, "doc_id", "text").collect()}
    assert rows[1]["n_email"] == 1 and "<EMAIL>" in rows[1]["redacted"]
    assert "bob" not in rows[1]["redacted"]
    assert rows[2]["n_url"] == 1 and rows[2]["n_ssn_like"] == 1
    assert "<URL>" in rows[2]["redacted"] and "<SSN_LIKE>" in rows[2]["redacted"]
    assert rows[3]["redacted"] == "clean text"
    assert (rows[3]["n_email"], rows[3]["n_url"], rows[3]["n_ssn_like"]) == (0, 0, 0)


def test_lsh_topk_recall_floor(spark):
    """Multi-table LSH must stay a USEFUL approximation: recall@5 vs the
    exact brute force >= 0.4 on the synthetic embeddings (measured ~0.58
    with 4 planes x 6 tables; single-table was ~0.14)."""
    from flume_spark.queries.llm_ops import ann_topk_bruteforce, ann_topk_lsh

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_bruteforce(spark, SF_ORACLE).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_lsh(spark, SF_ORACLE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"recall collapsed to {recall}"
