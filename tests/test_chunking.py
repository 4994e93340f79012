"""W1 sliding-window semantics (reference utils.rs:102-125) on the Catalyst path."""

from __future__ import annotations

import pytest

from kgspark import chunking


def _chunks(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    out = chunking.token_window_chunks(df, **kw)
    rows = out.orderBy("chunk_order_index").collect()
    return [(r["chunk_order_index"], r["content"], r["n_tokens"]) for r in rows]


def test_overlap_window_math(spark):
    text = " ".join(f"t{i}" for i in range(10))
    # size 5 step 3: windows [0:5], [3:8], [6:10] — break after reaching end
    out = _chunks(spark, text, size=5, overlap=2)
    assert [c for _, c, _ in out] == [
        "t0 t1 t2 t3 t4",
        "t3 t4 t5 t6 t7",
        "t6 t7 t8 t9",
    ]
    assert [n for _, _, n in out] == [5, 5, 4]


def test_overlap_exact_end_no_phantom_window(spark):
    # n - size divisible by step: last window ends exactly at n, no extra one
    text = " ".join(f"t{i}" for i in range(9))
    out = _chunks(spark, text, size=5, overlap=3)  # step 2: 0,2,4 -> [4:9]
    assert [i for i, _, _ in out] == [0, 1, 2]
    assert out[-1][1] == "t4 t5 t6 t7 t8"


def test_short_doc_single_window(spark):
    out = _chunks(spark, "a b c", size=5, overlap=2)
    assert out == [(0, "a b c", 3)]


def test_overlap_ge_size_raises(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        chunking.token_window_chunks(df, size=3, overlap=3)
