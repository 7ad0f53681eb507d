"""Measure scale_params against the BENCH.md §sf1 superlinear set.

§sf1 found the embedding all-pairs family superlinear at 10× data
because the LSH (tables, bits), SemDeDup k, and IVF n_lists defaults
are pinned at test scale (their DuckDB twins replay exact bucket ids).
This tool runs the same four operators at sf0.1 and the replicated sf1
corpus (.cache/sf1, built by tools/bench_sf1.py) twice — once with the
pinned defaults, once with ann.scale_params(n)-derived parameters — and
reports the 10×-data time ratio for both, plus recall@5 of the derived
LSH top-k vs the exact brute top-k at sf0.1 (the recall cost of growing
bits must be paid knowingly).

Prints one JSON line:
  {"queries": {name: {"default": {"sf01": s, "sf1": s, "ratio": r},
                      "scaled":  {...same..., "params01":..., "params1":...}}},
   "recall_at_5": {"default": r, "scaled": r}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".cache", "sf1")
DIM = 64


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    from pyspark.sql import functions as F

    from docling_plus_spark.operators import ann, cluster
    from docling_plus_spark.plans import build_session

    if not os.path.exists(os.path.join(SF1, "embeddings.parquet")):
        sys.exit("run tools/bench_sf1.py first to build .cache/sf1")

    spark = build_session("local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # one warmup over the array-HOF dot path (BENCH.md r5 triage: the
    # first HOF chain in a fresh JVM pays ~7 s of codegen)
    warm = spark.range(64).select(
        F.expr("transform(sequence(1,64), x -> rand(7))").alias("v")
    )
    a, b = warm.alias("a"), warm.alias("b")
    _timed(
        a.crossJoin(b).select(
            F.aggregate(
                F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d")
        )
    )

    embs = {
        tag: spark.read.parquet(f"{d}/embeddings.parquet").localCheckpoint(eager=True)
        for tag, d in (("sf01", SF01), ("sf1", SF1))
    }
    ns = {tag: df.count() for tag, df in embs.items()}
    params = {tag: ann.scale_params(n, dim=DIM) for tag, n in ns.items()}
    print(f"n={ns} derived={params}", file=sys.stderr)

    defaults = {"bits": 4, "tables": 8, "n_lists": 16, "nprobe": 4, "k_clusters": 8}

    def runners(p):
        return {
            "embedding_near_dup": lambda df: ann.embedding_near_dup(
                df, threshold=0.95, tables=p["tables"], bits=p["bits"]
            ),
            "ann_topk_bucketed": lambda df: ann.cosine_topk_bucketed(
                df, k=5, tables=p["tables"], bits=p["bits"]
            ),
            "ann_topk_ivf": lambda df: ann.cosine_topk_ivf(
                df, k=5, n_lists=p["n_lists"], nprobe=p["nprobe"]
            ),
            "semdedup": lambda df: cluster.semdedup(df, k=p["k_clusters"]),
        }

    out: dict = {"n": ns, "queries": {}}
    if "--recall-only" in sys.argv:
        runners_list = []  # skip the timing loops; recall section only
    else:
        runners_list = list(runners(defaults))
    for name in runners_list:
        out["queries"][name] = {}
        for variant, pick in (
            ("default", lambda tag: defaults),
            ("scaled", lambda tag: params[tag]),
        ):
            t = {
                tag: _timed(runners(pick(tag))[name](embs[tag]))
                for tag in ("sf01", "sf1")
            }
            t["ratio"] = round(t["sf1"] / max(t["sf01"], 0.01), 1)
            if variant == "scaled":
                t["params01"], t["params1"] = params["sf01"], params["sf1"]
            out["queries"][name][variant] = t
            print(f"{name}/{variant}: {t}", file=sys.stderr)

    # recall@5 at sf0.1: derived bits shrink buckets → candidate recall
    # drops; measure it against the exact brute top-k
    brute = {
        (r["id_a"], r["id_b"])
        for r in ann.cosine_topk_bruteforce(embs["sf01"], k=5).collect()
    }
    out["recall_at_5"] = {}
    for variant, p in (
        ("default", defaults),
        ("scaled", params["sf01"]),
        # the documented remedy: tables is the recall knob — candidate
        # recall ≈ 1-(1-p)^tables at ~linear cost, plan shape unchanged.
        # The deterministic sign-of-raw-dims quantizer needs
        # tables·bits ≤ dim (scale_params docstring), so at dim=64 /
        # bits=5 the max is 12 tables; past that a deployment swaps in
        # seeded random-hyperplane signs.
        ("scaled_tables12", {**params["sf01"], "tables": 12}),
    ):
        approx = {
            (r["id_a"], r["id_b"])
            for r in ann.cosine_topk_bucketed(
                embs["sf01"], k=5, tables=p["tables"], bits=p["bits"]
            ).collect()
        }
        out["recall_at_5"][variant] = round(len(approx & brute) / len(brute), 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
