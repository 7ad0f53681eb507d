"""Structured Streaming tests: drain-once semantics, checkpoint resume."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from docling_plus_spark.plans import build_session
from docling_plus_spark.sources import fixture_corpus_df
from docling_plus_spark.streaming import run_stream_once


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_stream_drains_and_resumes(spark, tmp_path):
    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = fixture_corpus_df(spark, replicate=1)
    n1 = first.count()
    first.write.mode("append").parquet(inp)

    run_stream_once(spark, inp, outp, ckpt)
    got1 = spark.read.parquet(outp)
    assert got1.count() == n1
    assert got1.filter(F.col("status") == "success").count() > 0.9 * n1

    # new files arrive; a re-run processes ONLY them (checkpoint resume)
    second = fixture_corpus_df(spark, replicate=2).filter(
        F.col("url").endswith("rep=1")
    )
    n2 = second.count()
    assert n2 > 0
    second.write.mode("append").parquet(inp)

    run_stream_once(spark, inp, outp, ckpt)
    got2 = spark.read.parquet(outp)
    assert got2.count() == n1 + n2
    # no duplicates: every url exactly once
    assert got2.select("url").distinct().count() == n1 + n2
    assert os.path.isdir(ckpt)
