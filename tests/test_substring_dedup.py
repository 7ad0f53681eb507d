"""Exact duplicate-substring removal (operators/substring.py)."""

from __future__ import annotations

import pytest

from docling_plus_spark.operators.substring import (
    duplicate_spans,
    kgram_occurrences,
    strip_duplicate_substrings,
)
from docling_plus_spark.plans.pipeline import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_duplicate_span_removed_keep_one(spark):
    boiler = "all rights reserved by the publisher of this fine document"
    rows = [
        (1, f"alpha beta gamma {boiler} delta"),
        (2, f"unrelated words here {boiler} and a tail"),
        (3, "totally unique text with no duplication at all present"),
    ]
    out = {
        r.id: r
        for r in strip_duplicate_substrings(_docs(spark, rows), k=5).collect()
    }
    # canonical (lowest (id, pos)) keeps its copy
    assert boiler in out[1].clean_text
    assert boiler not in out[2].clean_text
    assert out[2].removed_tokens == 10
    assert out[2].dup_spans == 1
    # untouched doc passes through whitespace-normalized
    assert out[3].clean_text == rows[2][1]
    assert out[3].removed_tokens == 0 and out[3].dup_spans == 0


def test_overlapping_kgram_marks_merge_into_one_span(spark):
    # a 7-token duplicate with k=5 yields 3 overlapping marked k-grams
    # in the non-canonical copy -> they must merge to ONE span of 7
    dup = "one two three four five six seven"
    rows = [(1, f"x {dup} y"), (2, f"p q {dup} r s")]
    out = {
        r.id: r
        for r in strip_duplicate_substrings(_docs(spark, rows), k=5).collect()
    }
    assert out[2].removed_tokens == 7
    assert out[2].dup_spans == 1
    assert out[2].clean_text == "p q r s"
    assert out[1].removed_tokens == 0


def test_intra_document_repetition(spark):
    # the same doc repeating itself: second occurrence stripped
    phrase = "spam spam spam spam spam spam"
    rows = [(1, f"{phrase} filler words in between {phrase}")]
    out = strip_duplicate_substrings(_docs(spark, rows), k=6).collect()[0]
    assert out.removed_tokens >= 6
    assert out.clean_text.startswith("spam")


def test_short_docs_emit_no_kgrams(spark):
    rows = [(1, "tiny doc"), (2, "tiny doc")]
    occ = kgram_occurrences(_docs(spark, rows), k=5)
    assert occ.count() == 0
    out = {
        r.id: r
        for r in strip_duplicate_substrings(_docs(spark, rows), k=5).collect()
    }
    assert out[1].clean_text == "tiny doc" == out[2].clean_text


def test_canonical_is_global_min(spark):
    dup = "d1 d2 d3 d4 d5"
    rows = [(5, f"z {dup}"), (2, f"a b {dup}"), (9, dup)]
    spans = duplicate_spans(
        kgram_occurrences(_docs(spark, rows), k=5), k=5
    ).collect()
    # doc 2 (lowest id) keeps; docs 5 and 9 marked
    assert sorted((s.id, s.start, s.end) for s in spans) == [
        (5, 1, 6),
        (9, 0, 5),
    ]
