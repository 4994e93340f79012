"""Spec-twin equivalence gates.

``textops.quality_score`` (pure Catalyst) is the SPEC for
``textops.quality_score_arrow`` (the shipped Arrow-kernel fast path that
the registered ``text_quality`` query uses).  The Catalyst twin stays in
the tree precisely so this test can hold the kernel to a row-for-row
executable definition — if either side drifts, this fails before the
driver's oracle does.
"""

from __future__ import annotations

from kgspark import textops

from .conftest import SF_UNIT


def test_quality_score_twins_row_identical(spark):
    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet")
    catalyst = textops.quality_score(docs)
    arrow = textops.quality_score_arrow(docs)
    assert catalyst.columns == arrow.columns
    assert catalyst.exceptAll(arrow).isEmpty()
    assert arrow.exceptAll(catalyst).isEmpty()


def test_repetition_twins_row_identical(spark):
    """textops.repetition_stats (distributed gram-explode aggregation) is
    the SPEC for repetition_stats_arrow (the shipped zero-shuffle kernel
    that the registered text_repetition query uses)."""
    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet")
    dist = textops.repetition_stats(docs)
    arrow = textops.repetition_stats_arrow(docs)
    assert dist.columns == arrow.columns
    assert dist.exceptAll(arrow).isEmpty()
    assert arrow.exceptAll(dist).isEmpty()
