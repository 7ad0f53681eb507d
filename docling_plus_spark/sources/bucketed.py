"""Bucketed-table layout: pre-shuffled storage for repeat joins.

At 100 TB the corpus is joined on ``url``/``doc_id`` over and over —
dedup verdicts, quality scores, span tables, embedding codes all key on
the document id. A plain parquet layout pays a full hash-exchange of
the big side on EVERY such join. Writing the table **bucketed** on the
join key (``DataFrameWriter.bucketBy`` — hive-style bucket files +
bucket metadata in the catalog) pays that shuffle once at write time;
thereafter any join between two tables bucketed on the same key with
the same bucket count is planned as a zero-Exchange SortMergeJoin
(each task zips bucket i with bucket i).

This is the storage-layout half of the co-location story (the runtime
half — repartition + persist inside one job — is used by the dedup
pipelines). ``tests/test_plan_shape.py`` locks the zero-Exchange plan.

Sandbox note: Spark's in-memory catalog supports bucketed
``saveAsTable`` without a Hive metastore; tables land under
``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed table bucketed (and bucket-sorted) on
    ``key``. ``n_buckets`` must match across tables that will be joined
    co-located; at cluster scale pick it ≈ max join parallelism."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
