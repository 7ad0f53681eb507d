"""J5 table cell matching: intersection-over-word argmax + text assembly
(reference: tf_cell_matcher.py:110-175, 465-528)."""

from __future__ import annotations

import numpy as np

from docling_plus_spark.pdf.table_match import match_cells, match_table


def test_grid_match_exact():
    cells = np.array(
        [[0, 0, 100, 20], [100, 0, 200, 20], [0, 20, 100, 40], [100, 20, 200, 40]],
        dtype=float,
    )
    words = np.array(
        [
            [5, 5, 30, 15],     # cell 0
            [35, 5, 60, 15],    # cell 0, second word
            [105, 5, 130, 15],  # cell 1
            [5, 25, 30, 35],    # cell 2
            [150, 25, 180, 35], # cell 3
        ],
        dtype=float,
    )
    out = match_table(cells, words, ["hello", "world", "b", "c", "d"])
    assert out == ["hello world", "b", "c", "d"]


def test_below_threshold_word_unassigned():
    cells = np.array([[0, 0, 10, 10]], dtype=float)
    words = np.array([[100, 100, 110, 110]], dtype=float)
    assert match_cells(cells, words)[0] == -1


def test_straddling_word_elects_max_overlap():
    cells = np.array([[0, 0, 100, 20], [100, 0, 200, 20]], dtype=float)
    words = np.array([[90, 5, 120, 15]], dtype=float)  # 1/3 in cell0, 2/3 in cell1
    assert match_cells(cells, words)[0] == 1


def test_word_order_within_cell_is_top_then_left():
    cells = np.array([[0, 0, 200, 40]], dtype=float)
    words = np.array(
        [[50, 25, 80, 35], [5, 5, 30, 15], [100, 5, 130, 15]], dtype=float
    )
    out = match_table(cells, words, ["third", "first", "second"])
    assert out == ["first second third"]


def test_empty_inputs():
    assert match_cells(np.empty((0, 4)), np.empty((0, 4))).tolist() == []
    assert match_table(np.array([[0, 0, 1, 1]]), np.empty((0, 4)), []) == [""]
