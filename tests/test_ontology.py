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


def test_functional_violations_flags_multi_object_subjects(spark):
    triples = spark.createDataFrame(
        [
            # Ada lives_in two places -> violation (and the duplicate
            # assertion of London must not inflate the distinct count)
            ("Ada Lovelace", "lives_in", "London", "doc-1"),
            ("Ada Lovelace", "lives_in", "London", "doc-2"),
            ("Ada Lovelace", "lives_in", "Paris", "doc-3"),
            # single object -> no violation
            ("Alan Turing", "lives_in", "London", "doc-1"),
            # non-functional predicate never flagged even with 2 objects
            ("Ada Lovelace", "visited", "Paris", "doc-1"),
            ("Ada Lovelace", "visited", "London", "doc-2"),
        ],
        "subj string, pred string, obj string, doc_id string",
    )
    rows = ontology.functional_violations(triples).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["pred"], r["subj"], r["n_objects"], r["objects"]) == (
        "lives_in", "Ada Lovelace", 2, "London,Paris"
    )


def test_triple_support_counts_distinct_docs(spark):
    triples = spark.createDataFrame(
        [
            ("A", "works_at", "B", "doc-2"),
            ("A", "works_at", "B", "doc-1"),
            ("A", "works_at", "B", "doc-1"),  # same doc twice: 2 not 3
            ("A", "visited", "C", "doc-9"),
        ],
        "subj string, pred string, obj string, doc_id string",
    )
    rows = {
        (r["subj"], r["pred"], r["obj"]): (r["n_docs"], r["first_doc_id"])
        for r in ontology.triple_support(triples).collect()
    }
    assert rows[("A", "works_at", "B")] == (2, "doc-1")
    assert rows[("A", "visited", "C")] == (1, "doc-9")


def test_link_prediction_ra_scores_hand_computed(spark):
    from kgspark import graph

    # path A-B-C plus star S-{X,Y,Z}; predicate/doc irrelevant to the graph
    triples = spark.createDataFrame(
        [
            ("A", "p", "B", "d"),
            ("B", "p", "C", "d"),
            ("S", "p", "X", "d"),
            ("S", "p", "Y", "d"),
            ("S", "p", "Z", "d"),
        ],
        "subj string, pred string, obj string, doc_id string",
    )
    rows = {
        (r["a"], r["b"]): (r["n_common"], r["ra_micro"])
        for r in graph.link_prediction(triples).collect()
    }
    # (A,C) share B with deg(B)=2 -> RA = 10^6 div 2
    assert rows[("A", "C")] == (1, 500_000)
    # star leaves pairwise share S with deg(S)=3 -> RA = 10^6 div 3
    for pair in [("X", "Y"), ("X", "Z"), ("Y", "Z")]:
        assert rows[pair] == (1, 333_333)
    # existing edges are never predicted
    assert ("A", "B") not in rows and ("S", "X") not in rows
    assert len(rows) == 4


def test_current_facts_latest_assertion_wins(spark):
    import datetime as dt

    triples = spark.createDataFrame(
        [
            ("Ada", "lives_in", "London", "doc-1"),
            ("Ada", "lives_in", "Paris", "doc-2"),   # later crawl wins
            ("Ada", "visited", "Paris", "doc-9"),    # non-functional: ignored
            # equal-ts tie -> max doc_id wins
            ("Alan", "works_at", "Acme", "doc-3"),
            ("Alan", "works_at", "Globex", "doc-4"),
        ],
        "subj string, pred string, obj string, doc_id string",
    )
    docs = spark.createDataFrame(
        [
            ("doc-1", dt.datetime(2025, 1, 1)),
            ("doc-2", dt.datetime(2025, 3, 1)),
            ("doc-3", dt.datetime(2025, 2, 1)),
            ("doc-4", dt.datetime(2025, 2, 1)),
            ("doc-9", dt.datetime(2025, 12, 1)),
        ],
        "doc_id string, warc_ts timestamp",
    )
    rows = {
        (r["subj"], r["pred"]): (r["obj"], r["asserted_at"], r["doc_id"])
        for r in ontology.current_facts(triples, docs).collect()
    }
    assert len(rows) == 2
    assert rows[("Ada", "lives_in")] == ("Paris", "2025-03-01 00:00:00", "doc-2")
    assert rows[("Alan", "works_at")] == ("Globex", "2025-02-01 00:00:00", "doc-4")


def test_negative_samples_filtered_and_deterministic(spark):
    import hashlib
    from kgspark import spec as kspec

    triples = spark.createDataFrame(
        [
            ("A", "p", "B", "d1"),
            ("B", "p", "C", "d1"),
            ("C", "q", "A", "d2"),
        ],
        "subj string, pred string, obj string, doc_id string",
    )
    out1 = sorted(map(tuple, ontology.negative_samples(triples).collect()))
    out2 = sorted(map(tuple, ontology.negative_samples(triples).collect()))
    assert out1 == out2  # no RNG state anywhere
    names = ["A", "B", "C"]
    true_set = {("A", "p", "B"), ("B", "p", "C"), ("C", "q", "A")}
    expected = []
    for s, p, o in sorted(true_set):
        h = hashlib.sha256(f"{s}:{p}:{o}:{kspec.NEG_SAMPLE_SALT}".encode())
        neg = names[int(h.hexdigest()[:15], 16) % 3]
        if neg != o and (s, p, neg) not in true_set:
            expected.append((s, p, o, neg))
    assert out1 == sorted(expected)
    for s, p, _o, neg in out1:
        assert (s, p, neg) not in true_set  # filtered protocol holds


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


def test_entity_cooccurrence_integer_lift_hand_computed(spark):
    """Staged quotient-first lift on a crafted corpus: positive and
    negative association, the >=2-doc floor, and per-doc dedup."""
    rows = []
    # A and B co-occur in 3 of 4 docs; C appears alone in doc-4.
    for d in ("d1", "d2", "d3"):
        rows += [("eA" + d, "A", "T", d), ("eB" + d, "B", "T", d)]
    rows += [("eC", "C", "T", "d4"), ("eA4", "A", "T", "d4")]
    rows += [("eAdup", "A", "T", "d1")]  # same name twice in d1: dedup
    ents = spark.createDataFrame(
        rows, "entity_id string, entity_name string, entity_type string, doc_id string"
    )
    got = {
        (r["a"], r["b"]): (r["n_ab"], r["n_a"], r["n_b"], r["lift_micro"])
        for r in ontology.entity_cooccurrence(ents).collect()
    }
    # N=4, A in 4 docs, B in 3, n_ab=3: ((3*1e6)//4)*4//3 = 750000*4//3 = 1000000
    assert got[("A", "B")] == (3, 4, 3, 1_000_000)
    # (A, C) co-occur once -> below the >=2 floor -> absent
    assert ("A", "C") not in got and len(got) == 1


def test_validate_multi_typed_name_annotates_each_triple_once(spark):
    """A surface form typed differently across documents must NOT fan the
    triple out into contradictory rows: the type dim merges first-wins
    (min type) and each input triple annotates exactly once."""
    triples = spark.createDataFrame(
        [("Ada Lovelace", "works_at", "Acme Corp", "doc-1")],
        "subj string, pred string, obj string, doc_id string",
    )
    entities = spark.createDataFrame(
        [
            ("Ada Lovelace", "Person"),
            ("Ada Lovelace", "Organization"),  # conflicting mention type
            ("Acme Corp", "Organization"),
        ],
        "entity_name string, entity_type string",
    )
    rows = ontology.validate(triples, entities).collect()
    assert len(rows) == 1
    # min("Organization", "Person") = "Organization" -> domain violation
    assert (rows[0]["subj_type"], rows[0]["status"]) == ("Organization", "domain")
    roll = ontology.conformance_rollup(
        ontology.validate(triples, entities)
    ).collect()
    assert roll[0]["n_triples"] == 1  # rollup counts the triple once


def test_temporal_triples_validity_interval(spark):
    import datetime as dt

    triples = spark.createDataFrame(
        [
            ("A", "works_at", "B", "doc-1"),
            ("A", "works_at", "B", "doc-2"),
            ("A", "works_at", "B", "doc-2"),  # same doc twice: n_docs=2
            ("C", "visited", "D", "doc-3"),
        ],
        "subj string, pred string, obj string, doc_id string",
    )
    docs = spark.createDataFrame(
        [
            ("doc-1", dt.datetime(2025, 1, 5)),
            ("doc-2", dt.datetime(2025, 4, 1)),
            ("doc-3", dt.datetime(2025, 2, 2)),
        ],
        "doc_id string, warc_ts timestamp",
    )
    got = {
        (r["subj"], r["pred"], r["obj"]): (
            r["first_seen"], r["last_seen"], r["n_docs"]
        )
        for r in ontology.temporal_triples(triples, docs).collect()
    }
    assert got[("A", "works_at", "B")] == (
        "2025-01-05 00:00:00", "2025-04-01 00:00:00", 2
    )
    assert got[("C", "visited", "D")] == (
        "2025-02-02 00:00:00", "2025-02-02 00:00:00", 1
    )


def test_predicate_stats_cardinality_and_symmetry(spark):
    """Hand-built predicates covering all four cardinality classes, the
    symmetry ratio, self-loop exclusion, and duplicate-triple collapse."""
    from kgspark import ontology

    rows = [
        # p11: bijective a->x, b->y  => 1:1
        ("a", "p11", "x"), ("b", "p11", "y"),
        # p1n: a->x, a->y (fanout 2, fanin 1) => 1:N
        ("a", "p1n", "x"), ("a", "p1n", "y"),
        # pn1: a->x, b->x (fanout 1, fanin 2) => N:1
        ("a", "pn1", "x"), ("b", "pn1", "x"),
        # pmn: a->x, a->y, b->x => M:N; (a,x) also asserted backwards
        ("a", "pmn", "x"), ("a", "pmn", "y"), ("b", "pmn", "x"),
        ("x", "pmn", "a"),
        # duplicate triple must collapse; self-loop excluded from pairs
        ("a", "p11", "x"), ("s", "ploop", "s"),
    ]
    t = spark.createDataFrame(
        [(s, p, o, "d") for s, p, o in rows], ["subj", "pred", "obj", "doc_id"]
    )
    got = {r["pred"]: r for r in ontology.predicate_stats(t).collect()}
    assert got["p11"]["cardinality"] == "1:1"
    assert got["p11"]["n_triples"] == 2  # duplicate collapsed
    assert got["p1n"]["cardinality"] == "1:N"
    assert got["pn1"]["cardinality"] == "N:1"
    m = got["pmn"]
    assert m["cardinality"] == "M:N"
    assert m["n_symmetric_pairs"] == 1  # {a,x} both ways
    assert m["symmetry_micro"] == 2 * 1 * 1_000_000 // 4  # 4 directed pairs
    lo = got["ploop"]
    assert lo["n_symmetric_pairs"] == 0 and lo["symmetry_micro"] == 0
    assert lo["cardinality"] == "1:1"


def test_rule_mining_support_and_confidence(spark):
    """Hand-built KG where marriedTo(a,b) ∧ livesIn(b,c) ⇒ livesIn(a,c)
    holds for 2 of 3 body pairs: support, body_pairs, confidence, the
    min-support floor, and DISTINCT pair counting (two middle nodes must
    not inflate support)."""
    from kgspark import ontology

    rows = [
        # body instances of (marriedTo, livesIn)
        ("a1", "marriedTo", "b1"), ("b1", "livesIn", "rome"),
        ("a2", "marriedTo", "b2"), ("b2", "livesIn", "oslo"),
        ("a3", "marriedTo", "b3"), ("b3", "livesIn", "lima"),
        # head holds for a1 and a2, not a3
        ("a1", "livesIn", "rome"), ("a2", "livesIn", "oslo"),
        # a second middle node for the SAME (a1, rome) pair — no inflation
        ("a1", "marriedTo", "b9"), ("b9", "livesIn", "rome"),
    ]
    t = spark.createDataFrame(
        [(s, p, o, "d") for s, p, o in rows], ["subj", "pred", "obj", "doc_id"]
    )
    out = ontology.rule_mining(t, top_preds=5, min_support=2).collect()
    rules = {(r["body_p"], r["body_q"], r["head_r"]): r for r in out}
    key = ("marriedTo", "livesIn", "livesIn")
    assert key in rules
    r = rules[key]
    assert r["support"] == 2  # a1/rome counted once despite b1 AND b9
    assert r["body_pairs"] == 3
    assert r["confidence_micro"] == 2 * 1_000_000 // 3
    # nothing else reaches the support floor
    assert all(k == key for k in rules)


def test_rule_apply_predicts_missing_heads(spark):
    """The mined marriedTo∧livesIn⇒livesIn rule (confidence 2/3 >= 0.5)
    predicts exactly the one missing head fact, attributed to it."""
    from kgspark import ontology

    rows = [
        ("a1", "marriedTo", "b1"), ("b1", "livesIn", "rome"),
        ("a2", "marriedTo", "b2"), ("b2", "livesIn", "oslo"),
        ("a3", "marriedTo", "b3"), ("b3", "livesIn", "lima"),
        ("a1", "livesIn", "rome"), ("a2", "livesIn", "oslo"),
        ("a1", "marriedTo", "b9"), ("b9", "livesIn", "rome"),
    ]
    t = spark.createDataFrame(
        [(s, p, o, "d") for s, p, o in rows], ["subj", "pred", "obj", "doc_id"]
    )
    out = ontology.rule_apply(t, top_preds=5, min_support=2).collect()
    preds = {(r["subj"], r["pred"], r["obj"]): r for r in out}
    assert ("a3", "livesIn", "lima") in preds
    r = preds[("a3", "livesIn", "lima")]
    assert r["confidence_micro"] == 2 * 1_000_000 // 3
    assert (r["body_p"], r["body_q"]) == ("marriedTo", "livesIn")
    # existing facts are never re-predicted
    assert ("a1", "livesIn", "rome") not in preds
