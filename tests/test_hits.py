"""HITS hubs/authorities (operators/links.py:hits)."""

import pytest

from docling_plus_spark.operators.links import hits
from docling_plus_spark.plans import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_hits_star_graph(spark):
    # hubs 1..4 all point at authority 0; one stray edge 0 -> 5
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 0), (0, 5)], "src long, dst long"
    )
    out = {r["node"]: r for r in hits(edges, iterations=3).collect()}
    assert out[0]["authority"] == 1.0  # the max-normalized authority
    assert out[0]["hub"] > 0  # it points at 5
    for i in (1, 2, 3, 4):
        assert out[i]["hub"] == 1.0  # symmetric max hubs
        assert out[i]["authority"] == 0.0  # nothing points at them
    assert out[5]["hub"] == 0.0  # no out-edges
    assert 0 < out[5]["authority"] <= 1.0


def test_hits_deterministic(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 13) % 20) for i in range(20)], "src long, dst long"
    ).filter("src != dst")
    a = sorted(map(tuple, hits(edges, iterations=4).collect()))
    b = sorted(map(tuple, hits(edges, iterations=4).collect()))
    assert a == b
