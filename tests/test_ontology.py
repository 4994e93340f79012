"""Ontology domain/range validation — every status branch on crafted rows.

The synthetic web corpus only emits ontology-known predicates, so the
driver/parity compare never exercises ``unknown_predicate``; this pins all
five grading branches (plus the rollup arithmetic) on hand-built inputs.
"""

from __future__ import annotations

from kgspark import ontology


def _frames(spark):
    triples = spark.createDataFrame(
        [
            # ok: Person works_at Organization
            ("Ada Lovelace", "works_at", "Acme Corp", "doc-1"),
            # domain violation: Place works_at Organization
            ("London", "works_at", "Acme Corp", "doc-1"),
            # range violation: Person works_at Place
            ("Ada Lovelace", "works_at", "London", "doc-2"),
            # both violated: Place works_at Place
            ("Paris", "works_at", "London", "doc-2"),
            # unknown predicate
            ("Ada Lovelace", "teleported_to", "London", "doc-3"),
        ],
        "subj string, pred string, obj string, doc_id string",
    )
    entities = spark.createDataFrame(
        [
            ("Ada Lovelace", "Person"),
            ("Acme Corp", "Organization"),
            ("London", "Place"),
            ("Paris", "Place"),
        ],
        "entity_name string, entity_type string",
    )
    return triples, entities


def test_validate_grades_every_branch(spark):
    triples, entities = _frames(spark)
    rows = {
        (r["subj"], r["pred"], r["obj"], r["doc_id"]): (
            r["subj_type"], r["obj_type"], r["status"]
        )
        for r in ontology.validate(triples, entities).collect()
    }
    assert len(rows) == 5
    assert rows[("Ada Lovelace", "works_at", "Acme Corp", "doc-1")] == (
        "Person", "Organization", "ok"
    )
    assert rows[("London", "works_at", "Acme Corp", "doc-1")] == (
        "Place", "Organization", "domain"
    )
    assert rows[("Ada Lovelace", "works_at", "London", "doc-2")] == (
        "Person", "Place", "range"
    )
    assert rows[("Paris", "works_at", "London", "doc-2")] == (
        "Place", "Place", "domain+range"
    )
    assert rows[("Ada Lovelace", "teleported_to", "London", "doc-3")] == (
        "Person", "Place", "unknown_predicate"
    )


def test_conformance_rollup_counts(spark):
    triples, entities = _frames(spark)
    checked = ontology.validate(triples, entities)
    by_pred = {
        r["pred"]: r for r in ontology.conformance_rollup(checked).collect()
    }
    wa = by_pred["works_at"]
    assert (wa["n_triples"], wa["n_ok"]) == (4, 1)
    # 'domain' + 'domain+range' rows each count as a domain violation;
    # same independence on the range side.
    assert wa["n_domain_violations"] == 2
    assert wa["n_range_violations"] == 2
    tp = by_pred["teleported_to"]
    assert (tp["n_triples"], tp["n_ok"]) == (1, 0)
    assert (tp["n_domain_violations"], tp["n_range_violations"]) == (0, 0)


def test_validation_stage_is_broadcast_only(spark):
    """The four validation joins must all be broadcast — the (huge) triple
    probe side never shuffles for the check (the 100 TB shape).  Exchanges
    are allowed only on the broadcast BUILD sides (the entity-type dim's
    distinct() shuffles the dim, never the triples)."""
    triples, entities = _frames(spark)
    plan = (
        ontology.validate(triples, entities)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan
    # every hash-partitioning exchange must sit under a BroadcastExchange
    # (dim-side distinct), i.e. none on the probe spine above the scan.
    spine = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in spine
