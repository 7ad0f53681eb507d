"""One-order-of-magnitude scale check (VERDICT r4 item 8).

Builds an sf1-equivalent corpus by replicating the sf0.1 tables 10x
with id-offset re-keying (documents / embeddings / events / lineitem —
the four tables the registry reads), then times EVERY ``queries()``
entry at both sf0.1 and sf1 and reports the slowest ten plus any
super-linear query (t_sf1 > superlinear_factor x t_sf0.1). All scale
claims elsewhere are plan-shape + sf0.1 measurements; this run is the
empirical 10x data point that would catch output-volume surprises
(the winnow_pairs class) before a real deploy.

Usage: python tools/bench_sf1.py [--queries q1,q2,...]
Writes the scaled corpus to .cache/sf1/ (once) and prints one JSON
line: {"sf01": {...}, "sf1": {...}, "superlinear": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".cache", "sf1")
REPLICATE = 10
SUPERLINEAR = 15.0  # 10x data; >15x time = super-linear, flagged


def ensure_sf1(spark) -> str:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    plans = {
        # (table, id columns to offset per replica)
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "events": [],
        "lineitem": [],
    }
    for tbl, id_cols in plans.items():
        out = os.path.join(DST, f"{tbl}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        n = df.count()
        rep = df.crossJoin(
            spark.range(REPLICATE).withColumnRenamed("id", "_rep")
        )
        for c in id_cols:
            rep = rep.withColumn(c, F.col(c) + F.col("_rep") * F.lit(n))
        rep.drop("_rep").repartition(64).write.mode("overwrite").parquet(out)
    # dimension-style TPC-H tables are not the scale surface of this
    # engine; the registry reads only the four tables above. Anything
    # else a query touches falls back to the sf0.1 file via symlink.
    for fn in os.listdir(SRC):
        link = os.path.join(DST, fn)
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, fn), link)
    return DST


def main() -> None:
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--queries":
        only = set(sys.argv[2].split(","))

    import __spark_entry__ as e
    from docling_plus_spark.plans import build_session

    spark = build_session("local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = ensure_sf1(spark)

    qs = e.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    results: dict[str, dict[str, float]] = {"sf01": {}, "sf1": {}}
    for name, fn in qs.items():
        for tag, d in (("sf01", SRC), ("sf1", sf1)):
            t0 = time.perf_counter()
            try:
                fn(spark, d).write.format("noop").mode("overwrite").save()
                results[tag][name] = round(time.perf_counter() - t0, 2)
            except Exception as ex:  # pragma: no cover
                results[tag][name] = -1.0
                print(f"ERR {name}@{tag}: {ex}", file=sys.stderr)
    superlinear = sorted(
        (
            (n, results["sf01"][n], results["sf1"][n])
            for n in results["sf1"]
            if results["sf01"].get(n, 0) > 0.05
            and results["sf1"][n] > SUPERLINEAR * results["sf01"][n]
        ),
        key=lambda t: -t[2],
    )
    slowest = sorted(results["sf1"].items(), key=lambda kv: -kv[1])[:10]
    print(json.dumps({
        "replicate": REPLICATE,
        "slowest_sf1": slowest,
        "superlinear": superlinear,
        "sf01": results["sf01"],
        "sf1": results["sf1"],
    }))


if __name__ == "__main__":
    main()
