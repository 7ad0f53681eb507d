"""Curation operators: repetition strip, DSIR, Bloom dedup, distribution match."""

import pytest
from pyspark.sql import functions as F

from docling_plus_spark.plans import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_repetition_strip_keeps_first_and_blanks(spark):
    from docling_plus_spark.operators.curation import repetition_strip

    text = "nav bar\nbody one\n\nnav bar\nbody two\n\nnav bar"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = repetition_strip(df).collect()[0]
    assert row.clean_text == "nav bar\nbody one\n\nbody two\n"
    assert row.n_lines == 7
    assert row.n_removed == 2  # two repeated 'nav bar' lines


def test_repetition_strip_noop_and_empty(spark):
    from docling_plus_spark.operators.curation import repetition_strip

    df = spark.createDataFrame(
        [(1, "a\nb\nc"), (2, "")], "doc_id long, text string"
    )
    out = {r.id: r for r in repetition_strip(df).collect()}
    assert out[1].clean_text == "a\nb\nc" and out[1].n_removed == 0
    assert out[2].clean_text == "" and out[2].n_removed == 0


def test_dsir_prefers_target_like_docs(spark):
    from docling_plus_spark.operators.curation import dsir_weights

    target = "the cat sat on the mat and the dog ran"
    offtgt = "zzz qqq kkk vvv xxx www yyy"
    rows = (
        [(i, target, "en") for i in range(6)]
        + [(10 + i, offtgt, "xx") for i in range(6)]
        + [(100, "the cat ran", "xx"), (101, "qqq kkk zzz", "xx")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.id: r.weight
        for r in dsir_weights(df, F.col("lang") == "en").collect()
    }
    # held-out target-like doc scores higher than the off-target one
    assert out[100] > out[101]
    assert out[0] > 0 > out[10]


def test_bloom_dedup_no_false_negatives(spark):
    from docling_plus_spark.operators.curation import bloom_dedup

    rows = [(i, f"unique document number {i}") for i in range(20)]
    rows += [(100, "unique document number 3"), (101, "fresh new text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: r.maybe_dup
        for r in bloom_dedup(df, F.col("doc_id") < 100).collect()
    }
    assert out[100] is True  # exact text seen on build side -> always flagged
    assert out[101] is False  # 2^18 bits, 80 set: fp odds ~ (80/2^18)^4


def test_distribution_match_hits_target_props(spark):
    from docling_plus_spark.operators.curation import distribution_match

    rows = [(i, "en") for i in range(3000)] + [(10000 + i, "fr") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = distribution_match(df, {"en": 0.5, "fr": 0.5})
    counts = {r.stratum: r.cnt for r in out.groupBy("stratum").agg(F.count("*").alias("cnt")).collect()}
    # fr is binding (1000 docs for a 50% share) -> kept ~whole; en thinned to ~1000
    assert counts["fr"] == 1000
    assert abs(counts["en"] - 1000) < 120  # hash-Bernoulli, ~3.5 sigma


def test_distribution_match_drops_unlisted_strata(spark):
    from docling_plus_spark.operators.curation import distribution_match

    df = spark.createDataFrame(
        [(1, "en"), (2, "xx")], "doc_id long, lang string"
    )
    out = distribution_match(df, {"en": 1.0}).collect()
    assert {r.stratum for r in out} == {"en"}


def test_model_tables_broadcast(spark):
    """DSIR's histogram and Bloom's bit set must broadcast back onto the
    corpus stream — shuffle joins there would re-shuffle the full
    exploded feature table at 100 TB."""
    from docling_plus_spark.operators.curation import bloom_dedup, dsir_weights

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bye", "fr")],
        "doc_id long, text string, lang string",
    )
    for plan_df in (
        dsir_weights(df, F.col("lang") == "en"),
        bloom_dedup(df, F.col("doc_id") == 1),
    ):
        plan = plan_df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "BroadcastHashJoin" in plan


# ------------------------------------------------------- ccnet bucketing


def test_ccnet_buckets_exact_thirds(spark):
    from docling_plus_spark.operators.quality import ccnet_buckets

    rows = [(i, "en", float(i)) for i in range(9)] + [
        (i, "de", float(100 - i)) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "id long, lang string, mean_nll double")
    out = {(r.lang, r.id): r.bucket for r in ccnet_buckets(df).collect()}
    # en: 9 docs -> exact thirds by ascending score
    for i in range(3):
        assert out[("en", i)] == "head"
    for i in range(3, 6):
        assert out[("en", i)] == "middle"
    for i in range(6, 9):
        assert out[("en", i)] == "tail"
    # de: scores descend with id -> id 3 is most fluent
    assert out[("de", 3)] == "head"
    assert out[("de", 0)] == "tail"
    # 4 docs: floor(3*(rn-1)/4) -> buckets sized 2/1/1
    assert sorted(out[("de", i)] for i in range(4)).count("head") == 2


def test_ccnet_buckets_tie_break_deterministic(spark):
    from docling_plus_spark.operators.quality import ccnet_buckets

    df = spark.createDataFrame(
        [(i, "en", 1.0) for i in range(6)],
        "id long, lang string, mean_nll double",
    )
    out = {r.id: r.bucket for r in ccnet_buckets(df).collect()}
    assert [out[i] for i in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ]


def test_ccnet_cutpoints_agrees_on_spread_scores(spark):
    from docling_plus_spark.operators.quality import (
        ccnet_buckets,
        ccnet_buckets_by_cutpoints,
    )

    rows = [(i, "en", float(i) * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, lang string, mean_nll double")
    exact = {r.id: r.bucket for r in ccnet_buckets(df).collect()}
    approx = {
        r.id: r.bucket for r in ccnet_buckets_by_cutpoints(df).collect()
    }
    # high-accuracy sketch on well-separated scores: at most the two
    # boundary docs may differ
    diffs = [i for i in exact if exact[i] != approx[i]]
    assert len(diffs) <= 2


# -------------------------------------------------- gopher n-gram repetition


def test_gopher_ngram_repetition_values(spark):
    from docling_plus_spark.operators.quality import gopher_ngram_repetition

    # "x y" appears 3x; total chars = len joined
    text = "x y a x y b x y c"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_ngram_repetition(df).collect()[0]
    total = len(text)
    # top 2-gram "x y": count 3, len 3
    assert r.top2 == round(3 * 3 / total, 6)
    # no 5-gram repeats
    assert r.dup5 == 0.0
    assert r.repetition_pass is False  # top2 0.529 > 0.20


def test_gopher_ngram_repetition_clean_doc_passes(spark):
    from docling_plus_spark.operators.quality import gopher_ngram_repetition

    words = " ".join(f"w{i}" for i in range(60))  # all n-grams unique
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    r = gopher_ngram_repetition(df).collect()[0]
    assert r.dup5 == 0.0 and r.dup10 == 0.0
    assert r.repetition_pass is True


def test_gopher_ngram_repetition_pathological_repeat(spark):
    from docling_plus_spark.operators.quality import gopher_ngram_repetition

    df = spark.createDataFrame(
        [(1, "spam " * 40)], "doc_id long, text string"
    )
    r = gopher_ngram_repetition(df).collect()[0]
    assert r.top2 > 0.9 and r.dup10 == 1.0
    assert r.repetition_pass is False


def test_gopher_ngram_repetition_short_doc(spark):
    from docling_plus_spark.operators.quality import gopher_ngram_repetition

    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    r = gopher_ngram_repetition(df).collect()[0]
    # only a single 2-gram exists; n>=3 contribute zero
    assert r.top3 == 0.0 and r.dup5 == 0.0


def test_curation_semdedup_and_embed_dedup_stages(spark, tmp_path):
    """The semdedup/embed_dedup stages derive their params from the
    measured corpus size (ann.scale_params) and gate the document table
    by doc_id; documents without an embedding row pass through."""
    import random

    from docling_plus_spark.job_curate import (
        _st_embed_dedup,
        _st_semdedup,
        parse_args,
    )

    rng = random.Random(11)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)]
    # plant an exact duplicate pair (60, 61) — cosine 1.0 survives any gate
    vecs[61] = (61, list(vecs[60][1]))
    emb_path = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).write.parquet(emb_path)
    # 121st document has no embedding row at all
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(121)], "doc_id long, text string"
    )

    args = parse_args(
        ["--input", "x", "--output", "y", "--embeddings", emb_path]
    )
    for stage in (_st_semdedup, _st_embed_dedup):
        out = stage(docs, args)
        kept = {r["doc_id"] for r in out.select("doc_id").collect()}
        assert 60 in kept and 61 not in kept  # keep-lowest-id rule
        assert 120 in kept  # no embedding -> passes through
        # deterministic
        kept2 = {r["doc_id"] for r in stage(docs, args).select("doc_id").collect()}
        assert kept == kept2


def test_curation_embedding_stages_require_embeddings_arg(spark):
    from docling_plus_spark.job_curate import _st_semdedup, parse_args

    args = parse_args(["--input", "x", "--output", "y"])
    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(SystemExit):
        _st_semdedup(docs, args)


def test_curation_lang_gate_stage(spark):
    from docling_plus_spark.job_curate import _st_lang_gate, parse_args

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog is of note to all", "en"),  # agree
            (2, "the cat and the dog is of note to all", "fr"),  # langid_mism.
            (3, "plain latin text here", "zh"),                  # script_mism.
            (4, "xyzzy plugh qwop", "en"),                       # undetermined
        ],
        "doc_id long, text string, lang string",
    )
    args = parse_args(["--input", "x", "--output", "y"])
    kept = {r.doc_id for r in _st_lang_gate(docs, args).collect()}
    assert kept == {1, 4}  # both mismatch classes dropped by default

    soft = parse_args(
        ["--input", "x", "--output", "y", "--keep-langid-mismatch"]
    )
    kept_soft = {r.doc_id for r in _st_lang_gate(docs, soft).collect()}
    assert kept_soft == {1, 2, 4}  # only the script contradiction goes

    # documents table without a lang column passes through untouched
    nolang = docs.drop("lang")
    assert _st_lang_gate(nolang, args).count() == 4
