"""CSV/Markdown/WebVTT backends: golden parity (csv, vtt) + subset
behavior (md) + mixed-format dispatch through the Spark extraction
pipeline."""

from __future__ import annotations

import glob
import json
import os
from pathlib import Path

import pytest

from docling_plus_spark.formats import (
    convert_bytes,
    convert_csv,
    convert_markdown,
    convert_vtt,
)

CSV_DIR = Path("/root/reference/docling/tests/data/csv")
VTT_DIR = Path("/root/reference/docling/tests/data/webvtt")
GOLD_DIR = Path("/root/reference/docling/tests/data/groundtruth/docling_v2")

CSV_FIXTURES = sorted(p.stem for p in CSV_DIR.glob("*.csv")) if CSV_DIR.exists() else []
VTT_FIXTURES = sorted(p.stem for p in VTT_DIR.glob("*.vtt")) if VTT_DIR.exists() else []


@pytest.mark.parametrize("name", CSV_FIXTURES)
def test_csv_golden_md_itxt(name):
    doc = convert_csv(
        (CSV_DIR / f"{name}.csv").read_bytes(), name=name, filename=f"{name}.csv"
    )
    assert doc.export_to_markdown() == (GOLD_DIR / f"{name}.csv.md").read_text()
    assert doc.export_to_element_tree() == (GOLD_DIR / f"{name}.csv.itxt").read_text()


@pytest.mark.parametrize("name", CSV_FIXTURES)
def test_csv_golden_json_modulo_version(name):
    # the CSV goldens were generated with docling-core 1.7.0; the engine
    # emits the 1.8.0 schema like the HTML goldens. Byte-identical
    # otherwise.
    doc = convert_csv(
        (CSV_DIR / f"{name}.csv").read_bytes(), name=name, filename=f"{name}.csv"
    )
    mine = doc.export_to_json().replace('"version": "1.8.0"', '"version": "1.7.0"')
    assert mine == (GOLD_DIR / f"{name}.csv.json").read_text()


@pytest.mark.parametrize("name", VTT_FIXTURES)
def test_vtt_golden_md_itxt(name):
    doc = convert_vtt(
        (VTT_DIR / f"{name}.vtt").read_bytes(), name=name, filename=f"{name}.vtt"
    )
    assert doc.export_to_markdown() == (GOLD_DIR / f"{name}.vtt.md").read_text()
    assert doc.export_to_element_tree() == (GOLD_DIR / f"{name}.vtt.itxt").read_text()


@pytest.mark.parametrize("name", VTT_FIXTURES)
def test_vtt_golden_json_tree(name):
    # VTT goldens predate the 1.8.0 schema bump; compare parsed trees with
    # the envelope (version/name/origin hash algo) normalized out.
    doc = convert_vtt(
        (VTT_DIR / f"{name}.vtt").read_bytes(), name=name, filename=f"{name}.vtt"
    )
    mine = json.loads(doc.export_to_json())
    gold = json.loads((GOLD_DIR / f"{name}.vtt.json").read_text())
    for key in ("schema_name", "version", "name", "origin"):
        mine.pop(key, None)
        gold.pop(key, None)
    assert mine == gold


def test_vtt_malformed_cues_dropped():
    data = (
        b"WEBVTT\n\n"
        b"NOTE a comment\nstill the comment\n\n"
        b"bad cue without timings\njust text\n\n"
        b"00:02.000 --> 00:01.000\nend before start\n\n"
        b"00:01.000 --> 00:02.000\nkept cue\n"
    )
    doc = convert_vtt(data)
    texts = [t.text for t in doc.texts]
    assert texts == ["00:01.000 --> 00:02.000", "kept cue"]


def test_vtt_invalid_signature_raises():
    with pytest.raises(ValueError):
        convert_vtt(b"not a vtt file")


def test_markdown_subset_structures():
    md = b"""# Title

Some paragraph
spanning lines.

## Section

- item one
- item two

1. first
2. second

```python
code here
```

| h1 | h2 |
|----|----|
| a  | b  |
"""
    doc = convert_markdown(md, name="t", filename="t.md")
    items = [
        (i.label if hasattr(i, "label") else "?", getattr(i, "text", ""))
        for i, _ in doc.iterate_items(doc.body, with_groups=False)
    ]
    labels = [label for label, _ in items]
    assert labels[0] == "title"
    assert "section_header" in labels
    assert labels.count("list_item") == 4
    assert "code" in labels
    assert len(doc.tables) == 1
    assert doc.tables[0].data.num_rows == 2 and doc.tables[0].data.num_cols == 2
    texts = dict(items)
    assert texts["title"] == "Title"
    assert "Some paragraph spanning lines." in [t for _, t in items]


def test_registry_dispatch():
    assert convert_bytes(b"<html><p>x</p></html>", "html").texts
    assert convert_bytes(b"a,b\n1,2\n", "csv").tables
    assert convert_bytes(b"# hi\n", "md").texts
    assert convert_bytes(b"plain\n\ntext", "text").texts
    with pytest.raises(KeyError):
        convert_bytes(b"", "docx")


def test_mixed_format_spark_dispatch():
    from pyspark.sql import functions as F

    from docling_plus_spark.plans import build_session, extract_pipeline

    spark = build_session("local[2]", shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [
        ("https://x.test/a.html", None, b"<html><h1>T</h1><p>body</p></html>", "", "en"),
        ("https://x.test/b.csv", None, b"h1,h2\nv1,v2\n", "", "en"),
        ("https://x.test/c.md", None, b"# Head\n\npara\n", "", "en"),
        ("https://x.test/d.pdf", None, b"%PDF-1.7 x", "", "en"),
        (
            "https://x.test/e.vtt",
            None,
            b"WEBVTT\n\n00:01.000 --> 00:02.000\n<v Ann>hello there\n",
            "",
            "en",
        ),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = {r["url"]: r for r in extract_pipeline(df).collect()}
    assert out["https://x.test/a.html"]["status"] == "success"
    csv_row = out["https://x.test/b.csv"]
    assert csv_row["status"] == "success" and csv_row["num_tables"] == 1
    md_row = out["https://x.test/c.md"]
    assert md_row["status"] == "success" and md_row["md"].startswith("# Head")
    assert out["https://x.test/d.pdf"]["failure_class"] == "unsupported_format:pdf"
    vtt_row = out["https://x.test/e.vtt"]
    assert vtt_row["status"] == "success"
    assert vtt_row["text"] == "00:01.000 --> 00:02.000\nAnn: \nhello there"
