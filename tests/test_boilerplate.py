"""jusText-style boilerplate classification + shard manifest + recrawl
planning (operators/boilerplate.py, packing.py:shard_manifest,
robots.py:recrawl_schedule)."""

import duckdb
import pytest

from docling_plus_spark.operators.boilerplate import (
    boilerplate_blocks,
    boilerplate_blocks_sql,
    main_content,
)
from docling_plus_spark.plans import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


PAGE = (
    "<div><a href='/x'>Home</a> <a href='/y'>About</a> <a>Contact us</a></div>"
    "<p>The data is in the table and it was good for the work of the team "
    "that made it so over time.</p>"
    "<p>short note</p>"
    "<p>The second paragraph is about the new system and the many ways it "
    "can be used by them for all of this work.</p>"
    "<div><a href='/l'>legal</a> <a href='/p'>privacy</a></div>"
)


def _labels(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = boilerplate_blocks(df).orderBy("pos").collect()
    return [(r.pos, r.label) for r in rows]


def test_nav_and_footer_bad_content_good(spark):
    labels = _labels(spark, PAGE)
    assert labels == [
        (0, "bad"),    # nav: link density ~0.9
        (1, "good"),   # stopword-rich paragraph
        (2, "good"),   # short, both neighbours good -> good
        (3, "good"),
        (4, "bad"),    # footer links
    ]


def test_short_between_bad_stays_bad(spark):
    html = (
        "<div><a href='/a'>all of it is a link here</a></div>"
        "<p>tiny</p>"
        "<div><a href='/b'>another total link block</a></div>"
    )
    assert _labels(spark, html) == [(0, "bad"), (1, "bad"), (2, "bad")]


def test_near_good_promoted_by_one_good_neighbour(spark):
    salad = "alpha beta gamma delta epsilon zeta " * 3  # no stopwords
    html = (
        "<p>The data is in the table and it was good for the work of the "
        "team that made it so over time.</p>"
        f"<p>{salad}</p>"
    )
    labels = _labels(spark, html)
    assert labels == [(0, "good"), (1, "good")]
    # alone, the same salad block (trailing neighbours default bad) dies
    assert _labels(spark, f"<p>{salad}</p>") == [(0, "bad")]


def test_empty_blocks_dropped_and_pos_reranked(spark):
    html = "<p></p><p>  </p><p>The data of the work is in it.</p>"
    rows = _labels(spark, html)
    assert rows[0][0] == 0 and len(rows) == 1


def test_twin_parity_including_densities(spark):
    df = spark.createDataFrame([(7, PAGE)], "doc_id long, html string")
    got = [tuple(r) for r in boilerplate_blocks(df).orderBy("pos").collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT 7::bigint AS doc_id, ? AS html",
        [PAGE],
    )
    oracle = con.execute(
        boilerplate_blocks_sql() + " ORDER BY pos"
    ).fetchall()
    assert [tuple(r) for r in oracle] == got


def test_anchor_regex_requires_tag_name_boundary(spark):
    """<abbr>/<address>/<area>/<audio> must NOT count as anchor opens:
    a bare '<a[^>]*>' would swallow the text from <abbr> up to the next
    </a> into link_chars and mislabel this content block as 'bad'.
    Both twins must agree."""
    html = (
        "<p>The <abbr>WHO</abbr> said it was good for the work of the "
        "team and all of them, see <a href='/x'>here</a> for more of "
        "the data that they made over time.</p>"
    )
    df = spark.createDataFrame([(3, html)], "doc_id long, html string")
    rows = boilerplate_blocks(df).collect()
    assert len(rows) == 1
    r = rows[0]
    # only 'here' (4 chars) is anchor text; the block is stopword-rich
    assert r.label == "good" and r.link_density < 0.06, r
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT 3::bigint AS doc_id, ? AS html",
        [html],
    )
    oracle = con.execute(boilerplate_blocks_sql()).fetchall()
    assert [tuple(x) for x in oracle] == [tuple(r)]


def test_main_content_joins_good_blocks_in_order(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    row = main_content(df).collect()[0]
    assert row.n_good == 3 and row.n_bad == 2
    # extracted content keeps ORIGINAL case (lowercasing is a
    # classification detail only)
    assert row.main_text.startswith("The data is in the table")
    assert row.main_text.split("\n")[1] == "short note"


def test_hostile_html_never_raises(spark):
    bodies = [
        "",
        "<p>" * 500,
        "<a href='x'>" + "y" * 10000,
        "no tags at all just text with the of and a to in is it",
        "\x00<p>\x01</p>\xff",
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(bodies)], "doc_id long, html string"
    )
    assert boilerplate_blocks(df).count() >= 1


def test_shard_manifest_atomic_and_offsets(spark):
    from docling_plus_spark.operators.packing import shard_manifest

    rows = [(i, 100) for i in range(10)]  # 10 docs x 100 bytes
    df = spark.createDataFrame(rows, "doc_id long, n_bytes long")
    out = shard_manifest(df, target_bytes=250).orderBy("byte_off").collect()
    assert len(out) == 10  # atomic: one row per doc
    assert [r.shard_id for r in out] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    assert [r.doc_seq for r in out] == [0, 1, 2, 0, 1, 0, 1, 2, 0, 1]
    assert [r.byte_off for r in out] == [i * 100 for i in range(10)]
    # zero-size docs dropped
    df2 = spark.createDataFrame(
        [(1, 0), (2, 5)], "doc_id long, n_bytes long"
    )
    assert shard_manifest(df2, target_bytes=10).count() == 1


def test_recrawl_schedule_actions(spark):
    from docling_plus_spark.operators.robots import recrawl_schedule

    crawled = spark.createDataFrame(
        [("u1", 100), ("u2", 100), ("u3", 100)],
        "url string, fetched_ts long",
    )
    sitemap = spark.createDataFrame(
        [("u1", 50), ("u2", 200), ("u4", 10)],
        "loc string, lastmod_ts long",
    )
    out = {
        r.url: r.action
        for r in recrawl_schedule(crawled, sitemap).collect()
    }
    assert out == {
        "u1": "fresh",     # lastmod before fetch
        "u2": "refetch",   # modified since fetch
        "u3": "unlisted",  # crawled, gone from sitemap
        "u4": "new",       # listed, never crawled
    }


def test_round4_operators_empty_corpus(spark):
    """Empty input -> empty output, never an error (the same
    zero-row discipline the r3 batch locked for the LSH/merge ops)."""
    from docling_plus_spark.operators.boilerplate import (
        boilerplate_blocks,
        main_content,
    )
    from docling_plus_spark.operators.imagepairs import image_alt_pairs
    from docling_plus_spark.operators.packing import shard_manifest
    from docling_plus_spark.operators.robots import recrawl_schedule
    from docling_plus_spark.operators.webtables import (
        web_table_shapes,
        web_tables,
    )
    from docling_plus_spark.operators.textstats import kn_bigram_nll

    empty_doc = spark.createDataFrame([], "doc_id long, html string")
    assert boilerplate_blocks(empty_doc).count() == 0
    assert main_content(empty_doc).count() == 0
    assert web_tables(empty_doc).count() == 0
    assert web_table_shapes(empty_doc).count() == 0
    empty_page = spark.createDataFrame(
        [], "doc_id long, url string, html string"
    )
    assert image_alt_pairs(empty_page).count() == 0
    empty_sized = spark.createDataFrame([], "doc_id long, n_bytes long")
    assert shard_manifest(empty_sized, 100).count() == 0
    ec = spark.createDataFrame([], "url string, fetched_ts long")
    es = spark.createDataFrame([], "loc string, lastmod_ts long")
    assert recrawl_schedule(ec, es).count() == 0
    et = spark.createDataFrame([], "doc_id long, text string")
    assert kn_bigram_nll(et).count() == 0
