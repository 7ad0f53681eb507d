"""Real BMP/WAV codecs: byte-level decode correctness + oracle parity."""

from __future__ import annotations

import math

import duckdb
import pytest

from docling_plus_spark.operators.media_codecs import (
    _bmp_dims,
    _bmp_pixel,
    _wav_n,
    _wav_sample,
    decode_bmp,
    decode_wav,
    make_bmp,
    make_wav,
    media_stats_oracle_sql,
    media_stats_stage,
    synth_real_media,
)
from docling_plus_spark.plans import build_session

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_bmp_roundtrip_exact():
    for i in (0, 2, 14, 96, 200):
        w, h, mr, mg, mb = decode_bmp(make_bmp(i))
        ew, eh = _bmp_dims(i)
        px = [_bmp_pixel(i, x, y) for y in range(eh) for x in range(ew)]
        assert (w, h) == (ew, eh)
        assert mr == sum(p[2] for p in px) / len(px)
        assert mg == sum(p[1] for p in px) / len(px)
        assert mb == sum(p[0] for p in px) / len(px)


def test_wav_roundtrip_exact():
    for i in (1, 3, 55, 999):
        n, ch, rms, zcr, rate = decode_wav(make_wav(i))
        vs = [_wav_sample(i, k) for k in range(_wav_n(i))]
        assert (n, ch, rate) == (len(vs), 1, 8000.0)
        assert rms == math.sqrt(sum(v * v for v in vs) / len(vs))
        signs = [1 if v > 0 else -1 for v in vs if v != 0]
        crossings = sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        assert zcr == crossings / (n - 1)


def test_corrupt_media_is_a_row_not_an_exception(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3],
                "kind": ["image", "image", "audio"],
                "media": [make_bmp(2), b"BMgarbage", b"RIFFnope"],
                "mime": ["image/bmp", "image/bmp", "audio/wav"],
            }
        )
    )
    out = {r.media_id: r.status for r in media_stats_stage(df).collect()}
    assert out == {1: "decoded", 2: "decode_error", 3: "decode_error"}


def test_media_stats_match_duckdb_formula_oracle(spark):
    """Spark decodes real bytes; the oracle replays the generative math
    with no decoder — equality proves bytes → pixels/samples → stats."""
    sp = {
        r.media_id: r.asDict()
        for r in media_stats_stage(synth_real_media(spark, SF)).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = con.sql(media_stats_oracle_sql()).df()
    assert len(ora) == len(sp)
    for rec in ora.to_dict("records"):
        mine = sp[rec["media_id"]]
        for k, v in rec.items():
            if k == "media_id":
                continue
            assert mine[k] == v, (rec["media_id"], k, mine[k], v)
