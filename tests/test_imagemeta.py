"""Header-only image dims extraction (operators/imagemeta.py)."""

import struct
import zlib

import duckdb
import pytest

from docling_plus_spark.operators.imagemeta import (
    HEADER_MEDIA_SCHEMA,
    image_dims_header,
    image_dims_sql,
    make_dim_bmp,
    make_gif,
    make_png,
    synth_header_media,
)
from docling_plus_spark.plans import build_session

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_png_is_real():
    b = make_png(311, 253)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    assert struct.unpack(">II", b[16:24]) == (311, 253)
    ln = struct.unpack(">I", b[33:37])[0]
    raw = zlib.decompress(b[41 : 41 + ln])     # IDAT inflates cleanly
    assert len(raw) == (3 * 311 + 1) * 253


def test_gif_raster_decodes():
    g = make_gif(37, 23)
    assert struct.unpack("<HH", g[6:10]) == (37, 23)
    p = 6 + 7 + 6 + 10                          # header+LSD+GCT+descriptor
    assert g[p] == 2                            # LZW min code size
    p += 1
    data = bytearray()
    while True:
        n = g[p]
        p += 1
        if n == 0:
            break
        data += g[p : p + n]
        p += n
    assert g[p] == 0x3B                         # trailer
    codes, acc, nbits = [], 0, 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= 3:
            codes.append(acc & 7)
            acc >>= 3
            nbits -= 3
    px = i = 0
    while codes[i] != 5:                        # (CLEAR, 0)* EOI
        assert codes[i] == 4 and codes[i + 1] == 0
        px += 1
        i += 2
    assert px == 37 * 23


def _rows(spark, blobs):
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], HEADER_MEDIA_SCHEMA
    )
    return {r.media_id: r for r in image_dims_header(df).collect()}


def test_parses_all_three_formats(spark):
    out = _rows(
        spark, [make_png(300, 120), make_gif(64, 64), make_dim_bmp(128, 100)]
    )
    assert (out[0].format, out[0].width, out[0].height) == ("png", 300, 120)
    assert (out[1].format, out[1].width, out[1].height) == ("gif", 64, 64)
    assert (out[2].format, out[2].width, out[2].height) == ("bmp", 128, 100)


def test_topdown_bmp_negative_height(spark):
    b = bytearray(make_dim_bmp(40, 30))
    b[22:26] = struct.pack("<i", -30)           # top-down row order
    out = _rows(spark, [bytes(b)])
    assert (out[0].format, out[0].width, out[0].height) == ("bmp", 40, 30)


def test_hostile_bytes_become_rows(spark):
    out = _rows(
        spark,
        [b"", b"\x89PNGbroken", b"GIF87a", b"BM\x00", b"\xff" * 64, None],
    )
    for r in out.values():
        assert r.format == "unrecognized"
        assert r.width is None and r.height is None and r.keep is None


def test_keep_gate(spark):
    out = _rows(
        spark,
        [
            make_png(200, 150),   # keep
            make_png(64, 64),     # min side < 100
            make_png(400, 100),   # aspect 4 > 3
            make_png(300, 100),   # aspect exactly 3 — kept
        ],
    )
    assert [out[i].keep for i in range(4)] == [True, False, False, True]


def test_operator_stage_is_pure_codegen(spark):
    df = spark.createDataFrame([(1, make_png(5, 5))], HEADER_MEDIA_SCHEMA)
    out = image_dims_header(df)
    plan = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # dims from headers never leave the JVM and never shuffle
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_twin_parity(spark):
    got = sorted(
        tuple(r)
        for r in image_dims_header(synth_header_media(spark, SF)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    oracle = sorted(tuple(r) for r in con.execute(image_dims_sql()).fetchall())
    assert oracle == got
