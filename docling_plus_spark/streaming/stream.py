"""Structured Streaming wrapper for the extraction pipeline (SURVEY §2.8).

The reference is batch-only; its bounded-queue staged pipeline
(standard_pdf_pipeline.py:103-311) maps to two Spark modes:

* **Incremental batch** (plans/incremental.py) — snapshot-committed epochs
  with anti-join resume. This is the production mode for crawl refreshes:
  Iceberg-metadata-sized state, exactly-once via atomic manifest commit.
* **Structured Streaming** (this module) — a file-source stream over the
  same pages table: new parquet files under the input path are discovered,
  extracted with the *identical* stage (mapInPandas works unchanged on
  streaming DataFrames — the pipeline is stateless per row, so no
  watermarks are needed), and appended to the sink with checkpointed
  progress. ``Trigger.AvailableNow`` drains the backlog and stops —
  batch/stream parity on the same code path.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from docling_plus_spark.plans.pipeline import extract_pipeline
from docling_plus_spark.sources.web_pages import WEB_PAGES_SCHEMA


def extract_stream(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """readStream over a pages-table directory → streaming EXTRACT rows."""
    reader = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(input_path)
    return extract_pipeline(pages)


def run_stream_once(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
) -> None:
    """Drain all available input once (Trigger.AvailableNow) and stop.

    Restart-safe: the checkpoint records consumed files, so re-running
    only processes newly arrived ones — the streaming twin of the
    snapshot anti-join resume.
    """
    out = extract_stream(spark, input_path)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
