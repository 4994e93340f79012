"""Entity-link scoring (linking.disambiguate): hand-built semantics.

The north-star "mention-detect + entity-link scoring" step: ambiguous
surface forms resolve by context-token overlap.  Spec constants from
kgspark.spec.AMBIG_CANDIDATES:

    spark  -> Apache Spark  {agg, join, query, sort, table}
            | Spark Plug    {big, fast, line, slow, small}
    stream -> Data Stream   {batch, data, group, row}
            | River Stream  {big, fast, slow, small}
    window -> Window Function {agg, group, order, part}
            | Window Pane     {big, line, small}

Context = tokens within +/- AMBIG_CONTEXT_WINDOW (= 3) positions.
"""

from __future__ import annotations

from kgspark import linking


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _rows(spark, texts):
    out = linking.disambiguate(_docs(spark, texts)).collect()
    return sorted(
        (r["src_row"], r["pos"], r["surface"], r["linked_name"], r["score"],
         r["margin"], r["n_candidates"])
        for r in out
    )


def test_context_forces_each_sense(spark):
    rows = _rows(spark, [
        "table query spark join sort",   # all four ctx toks are Apache terms
        "fast slow spark line big",      # all four ctx toks are Plug terms
    ])
    assert rows == [
        (0, 2, "spark", "Apache Spark", 4, 4, 2),
        (1, 2, "spark", "Spark Plug", 4, 4, 2),
    ]


def test_tie_breaks_by_candidate_name_ascending(spark):
    # ctx {join, fast}: one Apache term, one Plug term -> tie -> asc name
    rows = _rows(spark, ["join fast spark"])
    assert rows == [(0, 2, "spark", "Apache Spark", 1, 0, 2)]


def test_zero_score_still_resolves_deterministically(spark):
    rows = _rows(spark, ["dup dup spark dup dup"])
    assert rows == [(0, 2, "spark", "Apache Spark", 0, 0, 2)]


def test_window_bound_is_exactly_three_positions(spark):
    # 'query' sits 4 positions before the mention: outside the window.
    rows = _rows(spark, ["query dup dup dup spark"])
    assert rows == [(0, 4, "spark", "Apache Spark", 0, 0, 2)]
    # at exactly 3 it counts
    rows = _rows(spark, ["query dup dup spark"])
    assert rows == [(0, 3, "spark", "Apache Spark", 1, 1, 2)]


def test_context_tokens_count_once(spark):
    # duplicate context token scores once (distinct-term overlap): score 1,
    # not 2 (and margin 1 over the zero-scoring Plug sense)
    rows = _rows(spark, ["join join spark"])
    assert rows == [(0, 2, "spark", "Apache Spark", 1, 1, 2)]


def test_mention_at_document_edges(spark):
    rows = _rows(spark, ["spark join", "sort table spark"])
    assert rows == [
        (0, 0, "spark", "Apache Spark", 1, 1, 2),
        (1, 2, "spark", "Apache Spark", 2, 2, 2),
    ]


def test_multiple_mentions_score_independently(spark):
    # 'spark' ctx = {table, stream}: Apache 1 / Plug 0.
    # 'stream' ctx = {table, spark}: both senses 0 -> Data Stream by name.
    rows = _rows(spark, ["table spark stream"])
    assert rows == [
        (0, 1, "spark", "Apache Spark", 1, 1, 2),
        (0, 2, "stream", "Data Stream", 0, 0, 2),
    ]


def test_duplicate_content_rows_keep_per_row_lineage(spark):
    rows = _rows(spark, ["join spark", "join spark"])
    assert [r[0] for r in rows] == [0, 1]
    assert rows[0][1:] == rows[1][1:]


def test_disambiguation_plan_is_narrow(spark):
    """Zero shuffles: the candidate dictionary folds into the projection as
    literals, context comes from array slices — no Exchange, no join, no
    Python anywhere in the plan."""
    df = linking.disambiguate(_docs(spark, ["table query spark"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
