"""Resumable incremental-batch execution (north rule: checkpoint resume).

The reference is batch-only (SURVEY.md §2.8); its staged-queue machinery
maps not to Structured Streaming but to snapshot-based incremental batch:

    epoch := anti-join input against committed output → extract → commit
             results + lineage metrics atomically

A killed job resumes from the last committed snapshot with zero
re-processing and zero loss — the anti-join is the checkpoint.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from docling_plus_spark.sources.snapshot import SnapshotTable

from .pipeline import extract_pipeline, lineage_metrics


def run_epoch(
    pages: DataFrame,
    results: SnapshotTable,
    metrics: SnapshotTable,
    num_partitions: Optional[int] = None,
    limit: Optional[int] = None,
) -> dict:
    """Process all (or ``limit``) not-yet-committed pages as one epoch.

    The output snapshot is total over processed urls (failures included as
    status rows), so `done = distinct(url in results)` is exact. Returns a
    summary dict: {"epoch": int, "processed": int, "remaining_before": int}.
    """
    done = results.done_keys("url")
    todo = pages
    if done is not None:
        # left_anti on url: at cluster scale `done` is Iceberg-metadata
        # backed; here a parquet-side distinct. Broadcast chosen by AQE.
        todo = pages.join(done, "url", "left_anti")
    if limit is not None:
        todo = todo.limit(limit)
    todo = todo.cache()
    try:
        n_todo = todo.count()
        if n_todo == 0:
            return {"epoch": results.last_epoch, "processed": 0, "remaining_before": 0}
        epoch = results.last_epoch + 1
        out = extract_pipeline(todo, num_partitions=num_partitions).cache()
        try:
            processed = out.count()
            results.append(out, epoch=epoch, extra={"docs": processed})
            metrics.append(lineage_metrics(out, epoch=epoch), epoch=epoch)
        finally:
            out.unpersist()
        return {"epoch": epoch, "processed": processed, "remaining_before": n_todo}
    finally:
        todo.unpersist()
