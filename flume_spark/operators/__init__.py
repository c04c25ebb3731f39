"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing.  All DataFrame-native; designed for 100 TB
(bounded shuffles, broadcastable small sides, no driver collects)."""
