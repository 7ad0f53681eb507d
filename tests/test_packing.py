"""Sequence packing (operators/packing.py) invariants.

GPT-style concat-then-chunk: docs laid end-to-end in id order, cut
into fixed ``budget``-token windows. The distributed two-phase prefix
sum must produce offsets identical to a serial scan regardless of
where the range partitioner puts its split points.
"""

from __future__ import annotations

import pytest

from docling_plus_spark.operators.packing import sequence_pack
from docling_plus_spark.plans.pipeline import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _serial_pack(docs, budget):
    """Reference serial implementation: (window, id, from, to, woff)."""
    out = []
    off = 0
    for doc_id, n in sorted(docs):
        if n <= 0:
            continue
        for w in range(off // budget, (off + n - 1) // budget + 1):
            out.append(
                (
                    w,
                    doc_id,
                    max(0, w * budget - off),
                    min(n, (w + 1) * budget - off),
                    max(0, off - w * budget),
                )
            )
        off += n
    return sorted(out)


@pytest.mark.parametrize("budget", [7, 64])
def test_matches_serial_scan(spark, budget):  # noqa: F811
    docs = [(i, (i * 37) % 23 + (1 if i % 5 else 0)) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    got = sorted(
        tuple(r) for r in sequence_pack(df, budget=budget).collect()
    )
    assert got == _serial_pack(docs, budget)


def test_partitioning_invariance(spark):  # noqa: F811
    """Same output whether the input arrives in 1 partition or 16."""
    docs = [(i, 1 + (i % 11)) for i in range(300)]
    one = spark.createDataFrame(docs, "doc_id long, n_tokens long").coalesce(1)
    many = spark.createDataFrame(docs, "doc_id long, n_tokens long").repartition(16)
    a = sorted(tuple(r) for r in sequence_pack(one, budget=32).collect())
    b = sorted(tuple(r) for r in sequence_pack(many, budget=32).collect())
    assert a == b == _serial_pack(docs, 32)


def test_window_totality(spark):  # noqa: F811
    """Every window except the last holds exactly ``budget`` tokens,
    spans within a window tile [0, budget) without gaps or overlap,
    and each doc's spans cover [0, n) exactly."""
    docs = [(i, (i * 13) % 40 + 1) for i in range(150)]
    budget = 50
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    rows = [tuple(r) for r in sequence_pack(df, budget=budget).collect()]

    by_window: dict[int, list[tuple]] = {}
    by_doc: dict[int, int] = {}
    for w, doc_id, t0, t1, woff in rows:
        assert 0 <= t0 < t1, rows
        by_window.setdefault(w, []).append((woff, woff + (t1 - t0)))
        by_doc[doc_id] = by_doc.get(doc_id, 0) + (t1 - t0)

    assert by_doc == {i: n for i, n in docs}
    last = max(by_window)
    for w, spans in by_window.items():
        spans.sort()
        assert spans[0][0] == 0
        for (a0, a1), (b0, _b1) in zip(spans, spans[1:]):
            assert a1 == b0, (w, spans)
        if w != last:
            assert spans[-1][1] == budget, (w, spans)


def test_zero_token_docs_dropped(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 0)], "doc_id long, n_tokens long"
    )
    rows = sequence_pack(df, budget=4).collect()
    assert sorted(r.id for r in rows) == [2, 2]
