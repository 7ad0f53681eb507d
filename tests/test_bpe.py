"""BPE trainer/encoder vs an independent pure-Python reference
(operators/bpe.py). The reference implements Sennrich et al.'s
algorithm directly on symbol tuples — no sentinel strings — so it
cross-checks the replace-all encoding trick, the tie rules, and the
distributed counting."""

from __future__ import annotations

from collections import Counter

import pytest

from docling_plus_spark.operators.bpe import bpe_encode, bpe_train
from docling_plus_spark.plans import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split():
            c[w] += 1
    return {tuple(w): f for w, f in c.items()}


def _ref_pair_counts(freqs):
    pc = Counter()
    for syms, f in freqs.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += f
    return pc


def _ref_merge(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(texts, n_merges):
    freqs = _ref_word_freqs(texts)
    merges = []
    for step in range(1, n_merges + 1):
        pc = _ref_pair_counts(freqs)
        if not pc:
            break
        pair = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((step, pair[0], pair[1], pc[pair]))
        freqs = {_ref_merge(s, pair): f for s, f in freqs.items()}
        # identical tuples can collide after a merge: fold frequencies
        folded = Counter()
        for s, f in freqs.items():
            folded[s] += f
        freqs = dict(folded)
    return merges, freqs


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the aaa aa a the the",  # 'aaa' exercises greedy left-to-right
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(df, n_merges=8).orderBy("step").collect()
    ]
    want, _ = _ref_train(TEXTS, 8)
    assert got == want


def test_bpe_greedy_left_to_right(spark):
    # one word 'aaaa', merge (a,a) must give [aa, aa]; 'aaa' -> [aa, a]
    df = spark.createDataFrame([(1, "aaaa aaa")], "doc_id long, text string")
    merges = bpe_train(df, n_merges=1).collect()
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    # aaaa: 3 pairs; aaa: 2 pairs
    assert merges[0]["pair_count"] == 5
    enc = bpe_encode(df, [("a", "a")]).collect()[0]
    # aaaa -> aa aa (2 tokens), aaa -> aa a (2 tokens)
    assert enc["n_tokens"] == 4


def test_bpe_encode_matches_reference_tokens(spark):
    import hashlib

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    want_merges, _ = _ref_train(TEXTS, 6)
    pairs = [(l, r) for _, l, r, _ in want_merges]
    got = {r["id"]: r for r in bpe_encode(df, pairs).collect()}
    for i, t in enumerate(TEXTS):
        toks = []
        for w in t.lower().split():
            syms = tuple(w)
            for p in pairs:
                syms = _ref_merge(syms, p)
            toks.extend(syms)
        assert got[i]["n_tokens"] == len(toks)
        want_md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[i]["tokens_md5"] == want_md5


def test_bpe_train_sql_twin_matches(spark):
    import duckdb

    from docling_plus_spark.operators.bpe import bpe_train_sql

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(df, n_merges=6).orderBy("step").collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES %s) t(doc_id, text)"
        % ", ".join("(%d, '%s')" % (i, t) for i, t in enumerate(TEXTS))
    )
    want = con.execute(bpe_train_sql(6)).fetchall()
    assert got == [(s, l, r, c) for s, l, r, c in want]


def test_bpe_train_exhausts_merges_early(spark):
    # corpus where only 2 merges are possible; asking for 8 must emit
    # exactly the feasible sequence on BOTH engines (the SQL twin's
    # later iterations produce empty argmax rows and contribute nothing)
    import duckdb

    from docling_plus_spark.operators.bpe import bpe_train, bpe_train_sql

    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(df, n_merges=8).orderBy("step").collect()
    ]
    assert got == [(1, "a", "b", 3)]  # 'ab' freq 3; one feasible merge
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT 1 AS doc_id, 'ab ab ab' AS text"
    )
    want = con.execute(bpe_train_sql(8)).fetchall()
    assert got == [tuple(w) for w in want]


def test_bpe_sentinel_chars_filtered(spark):
    from docling_plus_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [(1, "good words here \x01bad\x02 good words")],
        "doc_id long, text string",
    )
    merges = bpe_train(df, n_merges=2).collect()
    for r in merges:
        assert "\x01" not in r["left"] + r["right"]
        assert "\x02" not in r["left"] + r["right"]
