"""WARC container source: writer/parser round trip, Spark reader,
end-to-end extraction (sources/warc.py)."""

from datetime import datetime, timezone

import pytest

from docling_plus_spark.plans import build_session
from docling_plus_spark.sources.warc import (
    iter_warc_records,
    make_warc,
    read_warc,
    warc_record_bytes,
    warc_roundtrip_pages,
)


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _recs(n, prefix="https://x.test/"):
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    return [(f"{prefix}{i}", f"<html><body><h1>T</h1><p>doc {i}</p></body></html>".encode(), ts) for i in range(n)]


def test_roundtrip_gzip_and_plain():
    recs = _recs(7)
    for gz in (True, False):
        out = list(iter_warc_records(make_warc(recs, gzip_member=gz)))
        assert [(r["url"], r["html"]) for r in out] == [(u, p) for u, p, _ in recs]
        assert all(r["http_status"] == 200 and r["mime"] == "text/html" for r in out)
        assert out[0]["warc_ts"] == datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_writer_deterministic():
    recs = _recs(3)
    assert make_warc(recs) == make_warc(recs)


def test_non_response_records_skipped():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://x.test/0\r\n"
        b"Content-Length: 4\r\n\r\nGET /\r\n\r\n"
    )
    blob = req + make_warc(_recs(2), gzip_member=False)
    assert [r["url"] for r in iter_warc_records(blob)] == [
        "https://x.test/0", "https://x.test/1",
    ]


def test_truncated_tail_does_not_raise():
    blob = make_warc(_recs(4))
    for cut in (len(blob) - 5, len(blob) // 2, 3, 0):
        assert len(list(iter_warc_records(blob[:cut]))) <= 4


def test_read_warc_spark(tmp_path, spark):
    # two segment files, one gzip-membered, one plain
    (tmp_path / "seg-0.warc.gz").write_bytes(make_warc(_recs(5)))
    (tmp_path / "seg-1.warc").write_bytes(
        make_warc(_recs(3, "https://y.test/"), gzip_member=False)
    )
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = {r.url: r for r in df.collect()}
    assert len(rows) == 8
    assert bytes(rows["https://y.test/2"].html).endswith(b"</html>")
    assert rows["https://x.test/4"].http_status == 200
    assert rows["https://x.test/0"].warc_file.endswith("seg-0.warc.gz")


def test_warc_to_extraction_end_to_end(tmp_path, spark):
    from docling_plus_spark.plans.pipeline import extract_pipeline

    (tmp_path / "seg.warc.gz").write_bytes(make_warc(_recs(6)))
    out = extract_pipeline(read_warc(spark, str(tmp_path) + "/*"))
    got = {r.url: r for r in out.collect()}
    assert all(r.status == "success" for r in got.values())
    assert got["https://x.test/3"].text == "T\ndoc 3"


def test_warc_roundtrip_pages_distributed(spark):
    from docling_plus_spark.sources.web_pages import synth_pages_from_documents

    pages = synth_pages_from_documents(spark, "/root/testdata/sf0.001")
    rt = warc_roundtrip_pages(pages.select("url", "warc_ts", "html"))
    orig = {r.url: bytes(r.html) for r in pages.select("url", "html").collect()}
    back = {r.url: bytes(r.html) for r in rt.collect()}
    assert back == orig  # byte-exact payloads through the container


def test_single_record_helper():
    rec = warc_record_bytes("https://x.test/solo", b"<p>x</p>", gzip_member=False)
    [out] = list(iter_warc_records(rec))
    assert out["url"] == "https://x.test/solo" and out["html"] == b"<p>x</p>"
