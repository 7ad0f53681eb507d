"""WebTables-style cell harvest (operators/webtables.py)."""

import duckdb
import pytest

from docling_plus_spark.operators.webtables import (
    web_table_shapes,
    web_table_shapes_sql,
    web_tables,
    web_tables_sql,
)
from docling_plus_spark.plans import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


PAGE = (
    "<p>intro</p><TABLE class=x><tr><th>Name</th><th>Qty </th></tr>"
    "<tr><td><b>apple</b> red</td><td>3</td></tr>"
    "<tr><td>pear</td><td></td></tr></TABLE>"
    "<table><tr><td>a</td></tr><tr><td>b</td><td>c</td></tr></table>"
)


def _cells(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return [
        tuple(r)
        for r in web_tables(df)
        .orderBy("table_idx", "row_idx", "col_idx")
        .collect()
    ]


def test_cells_headers_inline_tags_and_empty(spark):
    got = _cells(spark, PAGE)
    assert got == [
        (1, 0, 0, 0, True, "Name"),
        (1, 0, 0, 1, True, "Qty"),
        (1, 0, 1, 0, False, "apple red"),   # inline <b> stripped
        (1, 0, 1, 1, False, "3"),
        (1, 0, 2, 0, False, "pear"),
        (1, 0, 2, 1, False, ""),            # empty cell kept
        (1, 1, 0, 0, False, "a"),
        (1, 1, 1, 0, False, "b"),
        (1, 1, 1, 1, False, "c"),
    ]


def test_no_table_page_yields_nothing(spark):
    assert _cells(spark, "<p>plain paragraph only</p>") == []


def test_shapes_census(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    got = [
        tuple(r)
        for r in web_table_shapes(df).orderBy("table_idx").collect()
    ]
    assert got == [
        (1, 0, 3, 2, 2, True),    # rectangular, 2 header cells
        (1, 1, 2, 2, 0, False),   # ragged
    ]


def test_twin_parity(spark):
    df = spark.createDataFrame([(9, PAGE)], "doc_id long, html string")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT 9::bigint AS doc_id, ? AS html",
        [PAGE],
    )
    got = [
        tuple(r)
        for r in web_tables(df)
        .orderBy("table_idx", "row_idx", "col_idx")
        .collect()
    ]
    oracle = con.execute(
        "SELECT * FROM ("
        + web_tables_sql()
        + ") ORDER BY table_idx, row_idx, col_idx"
    ).fetchall()
    assert [tuple(r) for r in oracle] == got
    gs = [
        tuple(r)
        for r in web_table_shapes(df).orderBy("table_idx").collect()
    ]
    os_ = con.execute(
        "SELECT * FROM (" + web_table_shapes_sql() + ") ORDER BY table_idx"
    ).fetchall()
    assert [tuple(r) for r in os_] == gs


def test_hostile_html_never_raises(spark):
    bodies = [
        "",
        "<table>",                      # unclosed: no match, no crash
        "<table><tr><td>x",             # truncated
        "<table></table>",              # empty table
        "<table><tr></tr></table>",     # empty row
        "\x00<table><tr><td>\xff</td></tr></table>",
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(bodies)], "doc_id long, html string"
    )
    out = web_tables(df).collect()
    # only the complete structures yield cells
    assert all(r.cell_text is not None for r in out)
