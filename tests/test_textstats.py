"""TF-IDF ranking + char-bigram LM scoring (operators/textstats.py)."""

import math

import pytest
from pyspark.sql import functions as F

from docling_plus_spark.plans import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_tfidf_ranks_discriminative_terms(spark):
    from docling_plus_spark.operators.textstats import tfidf_topk

    df = spark.createDataFrame(
        [
            (1, "spark spark spark common"),
            (2, "duck duck common"),
            (3, "goose common common"),
        ],
        "doc_id long, text string",
    )
    out = {(r.id, r.rk): (r.term, r.tfidf) for r in tfidf_topk(df, k=2).collect()}
    # 'common' appears in all 3 docs -> idf = ln(1) = 0; unique terms win
    assert out[(1, 1)][0] == "spark"
    assert out[(2, 1)][0] == "duck"
    assert out[(3, 1)][0] == "goose"
    assert out[(1, 1)][1] == pytest.approx(3 * math.log(3), abs=1e-6)
    # rank 2 is the zero-scoring ubiquitous term
    assert out[(1, 2)] == ("common", 0.0)


def test_tfidf_deterministic_tie_break(spark):
    from docling_plus_spark.operators.textstats import tfidf_topk

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")],
        "doc_id long, text string",
    )
    out = {(r.id, r.rk): r.term for r in tfidf_topk(df, k=2).collect()}
    # equal scores -> lexicographic term order
    assert out[(1, 1)] == "alpha" and out[(1, 2)] == "beta"
    assert out[(2, 1)] == "delta" and out[(2, 2)] == "gamma"


def test_char_lm_flags_gibberish(spark):
    from docling_plus_spark.operators.textstats import char_bigram_logprob

    normal = "the quick brown fox jumps over the lazy dog and runs home"
    rows = [(i, normal) for i in range(8)] + [(99, "zq xj qv kz jx vq zx qj")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r.mean_nll for r in char_bigram_logprob(df).collect()}
    # the gibberish doc is far less likely under the corpus model
    assert out[99] > out[0] + 0.5
    assert all(out[i] == out[0] for i in range(1, 8))  # identical docs, identical score


def test_char_lm_short_docs(spark):
    from docling_plus_spark.operators.textstats import char_bigram_logprob

    df = spark.createDataFrame(
        [(1, "ab"), (2, "a"), (3, "")],
        "doc_id long, text string",
    )
    out = {r.id: r.n_bigrams for r in char_bigram_logprob(df).collect()}
    assert out == {1: 1}  # <2 chars -> no bigrams -> no row (SQL twin matches)


def test_model_joins_broadcast(spark):
    """The corpus-level model tables must broadcast — a shuffle join
    against the exploded bigram stream would add two full-data shuffles
    at 100 TB."""
    from docling_plus_spark.operators.textstats import char_bigram_logprob

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    plan = char_bigram_logprob(df)._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("BroadcastHashJoin") >= 2 or plan.count("BroadcastNestedLoopJoin") >= 1


def test_inverted_index_postings(spark):
    from docling_plus_spark.operators.textstats import inverted_index

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog"),
            (3, "a cat! a CAT"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.term, r.id): r for r in inverted_index(df, min_df=1).collect()
    }
    assert rows[("the", 1)].tf == 2
    assert rows[("the", 1)].first_pos == 0
    assert rows[("the", 1)].df == 2
    assert rows[("cat", 3)].tf == 2          # case-folded
    assert rows[("cat", 3)].first_pos == 1   # punctuation split
    assert rows[("cat", 3)].df == 2
    assert rows[("mat", 1)].df == 1


def test_inverted_index_min_df_prunes(spark):
    from docling_plus_spark.operators.textstats import inverted_index

    df = spark.createDataFrame(
        [(1, "x shared"), (2, "y shared")], "doc_id long, text string"
    )
    terms = {r.term for r in inverted_index(df, min_df=2).collect()}
    assert terms == {"shared"}


def test_kn_bigram_formula_hand_check(spark):
    """Interpolated KN on a 3-doc corpus, verified against the formula
    computed by hand in pure Python."""
    import math

    from docling_plus_spark.operators.textstats import kn_bigram_nll

    rows = [(1, "a b a b"), (2, "a b c"), (3, "c a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: (r.n_bigrams, r.mean_nll) for r in kn_bigram_nll(df).collect()}

    # corpus bigrams: (a,b)x3 [doc1 x2, doc2], (b,a)x1, (b,c)x1, (c,a)x1
    pair = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1, ("c", "a"): 1}
    c1 = {"a": 3, "b": 2, "c": 1}
    n1plus_fw = {"a": 1, "b": 2, "c": 1}
    n1plus_bw = {"a": 2, "b": 1, "c": 1}
    n_types = 4
    D = 0.75

    def p(w1, w2):
        return (
            max(pair[(w1, w2)] - D, 0.0) / c1[w1]
            + D * n1plus_fw[w1] / c1[w1] * n1plus_bw[w2] / n_types
        )

    def mean_nll(bgs):
        return round(sum(-math.log(p(*b)) for b in bgs) / len(bgs), 6)

    assert out[1] == (3, mean_nll([("a", "b"), ("b", "a"), ("a", "b")]))
    assert out[2] == (2, mean_nll([("a", "b"), ("b", "c")]))
    assert out[3] == (1, mean_nll([("c", "a")]))


def test_kn_typical_text_scores_lower_than_rare(spark):
    from docling_plus_spark.operators.textstats import kn_bigram_nll

    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(10)] + [(99, "zyx qwv jkl pqr")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r.mean_nll for r in kn_bigram_nll(df).collect()}
    assert out[0] < out[99]


def test_kn_short_docs_dropped(spark):
    from docling_plus_spark.operators.textstats import kn_bigram_nll

    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words")],
        "doc_id long, text string",
    )
    assert [r.id for r in kn_bigram_nll(df).collect()] == [3]
