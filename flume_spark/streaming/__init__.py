"""Structured-Streaming pipeline runner (reference: the GenStage topology,
SURVEY.md §3.2)."""

from flume_spark.streaming.pipeline import PipelineRunner

__all__ = ["PipelineRunner"]
