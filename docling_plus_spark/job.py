"""spark-submit entrypoint for the extraction pipeline (north rule:
"runs via spark-submit --py-files on multi-executor clusters").

Usage on a cluster (N or 4N executors — the plan is identical; only
``--num-executors`` / dynamic allocation changes):

    spark-submit --py-files dist/docling_plus_spark.zip \\
        docling_plus_spark/job.py \\
        --input  s3://bucket/pages/            \\
        --output /table/results                \\
        --epochs 0 --limit 200000

Locally (what tests/test_spark_submit.py drives for real):

    spark-submit --master local[2] --py-files dist/docling_plus_spark.zip \\
        docling_plus_spark/job.py --input pages.parquet --output out/

The job is an incremental-batch loop over `plans.incremental.run_epoch`:
each epoch anti-joins the input against the committed results snapshot,
extracts the remainder, and commits metrics-then-results (the results
manifest is the sole completion point — kill the job anywhere and the
next invocation resumes from the last committed snapshot with zero loss
and zero re-processing). One JSON summary line is printed per epoch.

Reference analog: the CLI conversion loop (docling/cli/main.py) +
_convert orchestration (document_converter.py:234-281), restated as a
resumable Spark batch job.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional

from pyspark.sql import SparkSession


def parse_args(argv: Optional[list] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="docling-plus-spark extraction job")
    p.add_argument("--input", required=True, help="pages parquet/table path "
                   "(url:string, warc_ts:timestamp, html:binary, ...)")
    p.add_argument("--output", required=True, help="results snapshot dir")
    p.add_argument("--metrics", default=None,
                   help="metrics snapshot dir (default: <output>/_metrics)")
    p.add_argument("--epochs", type=int, default=0,
                   help="max epochs to run; 0 = run until drained")
    p.add_argument("--limit", type=int, default=None,
                   help="max docs per epoch (bounds epoch commit size)")
    p.add_argument("--num-partitions", type=int, default=None,
                   help="skew-scatter width for the extract stage "
                   "(default: session parallelism)")
    p.add_argument("--include", default="",
                   help="extra sink surfaces, comma-separated from "
                   "{json,doctags,html}")
    return p.parse_args(argv)


def build_job_session(app_name: str = "docling-plus-spark-job") -> SparkSession:
    """Session for spark-submit: master/executors come from the submit
    command line, only engine-required conf is set here."""
    return (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.execution.arrow.useLargeVarTypes", "true")
        .getOrCreate()
    )


def run(spark: SparkSession, args: argparse.Namespace) -> int:
    from docling_plus_spark.plans.incremental import run_epoch
    from docling_plus_spark.sources.snapshot import SnapshotTable
    from docling_plus_spark.sources.web_pages import read_split

    pages = read_split(spark, args.input)
    results = SnapshotTable(spark, args.output)
    metrics = SnapshotTable(spark, args.metrics or args.output.rstrip("/") + "/_metrics")

    epoch_budget = args.epochs if args.epochs > 0 else sys.maxsize
    n_partitions = args.num_partitions or spark.sparkContext.defaultParallelism
    total = 0
    for _ in range(epoch_budget):
        include = tuple(s for s in args.include.split(",") if s)
        summary = run_epoch(
            pages, results, metrics,
            num_partitions=n_partitions, limit=args.limit, include=include,
        )
        print(json.dumps(summary), flush=True)
        total += summary["processed"]
        if summary["processed"] == 0:
            break
    print(json.dumps({"done": True, "total_processed": total}), flush=True)
    return 0


def main(argv: Optional[list] = None) -> int:
    args = parse_args(argv)
    spark = build_job_session()
    try:
        return run(spark, args)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
