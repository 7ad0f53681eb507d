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


def test_resize_round_trip_and_sampling():
    """Resized output is itself a real BMP whose pixels are exactly the
    nearest-neighbour samples of the source."""
    import numpy as np

    from docling_plus_spark.operators.media_codecs import (
        RESIZE_H,
        RESIZE_W,
        bmp_pixel_array,
        make_bmp,
        resize_bmp,
    )

    src = make_bmp(42)
    out, mr, mg, mb = resize_bmp(src, RESIZE_W, RESIZE_H)
    arr = bmp_pixel_array(out)
    assert arr.shape == (RESIZE_H, RESIZE_W, 3)
    big = bmp_pixel_array(src)
    h, w = big.shape[0], big.shape[1]
    sx = (np.arange(RESIZE_W, dtype=np.int64) * w) // RESIZE_W
    sy = (np.arange(RESIZE_H, dtype=np.int64) * h) // RESIZE_H
    assert (arr == big[np.ix_(sy, sx)]).all()
    means = arr.reshape(-1, 3).mean(axis=0)      # B, G, R
    assert (mr, mg, mb) == (means[2], means[1], means[0])


def test_resize_twin_parity(spark):
    from docling_plus_spark.operators.media_codecs import (
        media_resize_oracle_sql,
        media_resize_stage,
    )

    rows = media_resize_stage(synth_real_media(spark, SF)).collect()
    got = sorted(
        (r.media_id, r.status, r.width, r.height, r.mean_r, r.mean_g, r.mean_b)
        for r in rows
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(media_resize_oracle_sql()).fetchall()
    )
    assert got == want
    # errors are rows: corrupt image bytes and audio rows both present
    statuses = {r.status for r in rows}
    assert statuses == {"resized", "decode_error", "not_image"}
