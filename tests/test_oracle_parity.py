"""Driver-style oracle parity: every oracled query must match DuckDB exactly.

Mimics the round gate: run each ``__spark_entry__.queries()`` entry on Spark,
run the matching ``oracle_sql()`` in DuckDB over the same parquet views, and
compare row count, column names, and an order-insensitive value hash.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from .conftest import REPO_ROOT, SF_BENCH, SF_UNIT

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(REPO_ROOT, "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and entry_mod)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    return str(v)


def _value_set(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


ORACLED = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


def _check_parity(spark, name: str, sf_dir: str) -> None:
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    con = _duck(sf_dir)
    res = con.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sv = _value_set([tuple(r) for r in spark_rows], spark_cols)
    dv = _value_set(duck_rows, duck_cols)
    if sv != dv:
        diff = [(a, b) for a, b in zip(sv, dv) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, name):
    _check_parity(spark, name, SF_UNIT)


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity_sf01(spark, name):
    """VERDICT r2 item 8: scale-tier parity gate.  Ties and boundary cases
    (the sessionize lesson) appear only at scale — the full oracled query
    set must also hash-match DuckDB at sf0.1, 100x the fast gate's volume.
    Skipped unless selected with `-m slow` (see conftest)."""
    _check_parity(spark, name, SF_BENCH)
