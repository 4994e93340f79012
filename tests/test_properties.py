"""Property tests: partition invariance, KV parity ops, canon under skew."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kgspark import canon, datagen, materialize, pipeline

N = 60
SEED = 9


def _triples(web):
    return {tuple(r) for r in pipeline.build(web, reuse=False)["triples"].collect()}


def test_partition_count_invariance(spark):
    """Same input under different partition counts ⇒ identical output set
    (SURVEY.md §5.5 — the determinism half of the scaling property)."""
    base = datagen.web_pages(spark, N, SEED)
    t3 = _triples(base.repartition(3))
    t17 = _triples(base.repartition(17))
    t1 = _triples(base.coalesce(1))
    assert t3 == t17 == t1 and len(t3) > 0


def test_delete_ids_and_truncate(spark, tmp_path):
    wh = materialize.Warehouse(spark, str(tmp_path))
    web = datagen.web_pages(spark, N, SEED)
    materialize.run_pipeline(spark, web, wh, run_id="r1")

    docs = wh.read("docs")
    n = docs.count()
    victims = docs.select("doc_id").limit(3)
    removed = materialize.delete_ids(wh, "docs", "doc_id", victims)
    assert removed == 3
    assert wh.read("docs").count() == n - 3

    materialize.truncate(wh, "docs")
    assert not wh.exists("docs")


def test_status_lookups(spark, tmp_path):
    wh = materialize.Warehouse(spark, str(tmp_path))
    web = datagen.web_pages(spark, N, SEED)
    materialize.run_pipeline(spark, web, wh, run_id="runA")
    st = wh.read("doc_status")
    assert materialize.docs_by_track_id(st, "runA").count() == st.count()
    assert materialize.docs_by_track_id(st, "nope").count() == 0
    url = st.select("url").first()["url"]
    got = materialize.doc_by_url(st, url).collect()
    assert len(got) == 1 and got[0]["url"] == url
    # RFC-3339 stamps present and parseable
    row = st.first()
    assert "T" in row["created_at"] and row["updated_at"] >= row["created_at"]


def test_canon_skewed_head_entity(spark):
    """Canonicalization under deliberate head-entity skew: one surface-form
    cluster dominating the corpus must still converge and merge correctly."""
    import hashlib

    head = [("I.B.M.",), ("IBM",), ("International Business Machines",)]
    # tail names built from hex digests: char-3-gram Jaccard between any two
    # stays well under the 0.5 merge threshold (names like "Distinct Co N"
    # would be legitimate near-dups of each other and correctly merge).
    tail_names = [
        f"Zv{hashlib.md5(str(i).encode()).hexdigest()[:10]}" for i in range(200)
    ]
    rows = head * 300 + [(n,) for n in tail_names]  # 900 skewed + 200 singleton
    ents = spark.createDataFrame(rows, "entity_name string")
    cmap = canon.canonical_map(spark, ents)
    got = {r["entity_name"]: r["canonical_name"] for r in cmap.collect()}
    assert got["I.B.M."] == got["IBM"] == got["International Business Machines"] == "IBM"
    # singletons untouched, one row per distinct name (no blowup from skew)
    assert got[tail_names[7]] == tail_names[7]
    assert cmap.count() == len(got) == 203


def test_operator_partition_invariance(spark):
    """The round-2 operators are partition-count invariant: vectorized
    minhash (block boundaries shift with batch shape), decimal-summed
    session windows, and sliding token chunks produce identical result sets
    at any parallelism — the determinism half of the scaling criterion."""
    from kgspark import chunking, events, textops

    docs = spark.read.parquet(os.path.join("/root/testdata/sf0.001", "documents.parquet"))
    ev = spark.read.parquet(os.path.join("/root/testdata/sf0.001", "events.parquet"))

    for build in (
        lambda d: textops.minhash_signatures(d),
        lambda d: textops.simhash(d),
        lambda d: chunking.token_window_chunks(d, size=50, overlap=5),
    ):
        a = {tuple(r) for r in build(docs.repartition(13)).collect()}
        b = {tuple(r) for r in build(docs.coalesce(1)).collect()}
        assert a == b and len(a) > 0

    sa = {tuple(r) for r in events.session_windows(ev.repartition(13)).collect()}
    sb = {tuple(r) for r in events.session_windows(ev.coalesce(1)).collect()}
    assert sa == sb and len(sa) > 0


def test_asof_and_range_join_match_bruteforce(spark):
    """Seeded randomized events (with deliberate same-second ts ties) vs
    driver-side brute force for BOTH interval operators."""
    import datetime as dt
    import random

    rng = random.Random(77)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (
            eid,
            t0 + dt.timedelta(seconds=rng.randrange(20_000)),
            rng.randrange(6),
            rng.choice(["click", "purchase", "error", "view"]),
        )
        for eid in range(300)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    by_user: dict = {}
    for eid, ts, uid, ty in rows:
        by_user.setdefault(uid, []).append((ts, eid, ty))

    from kgspark import events as ev

    exp_asof = {}
    for evs in by_user.values():
        clicks = [(ts, eid) for ts, eid, ty in evs if ty == "click"]
        for ts, eid, ty in evs:
            if ty != "purchase":
                continue
            cands = [(cts, cid) for cts, cid in clicks if cts <= ts]
            if cands:
                bts, bid = max(cands)  # latest ts, then max event_id
                exp_asof[eid] = (bid, int((ts - bts).total_seconds() * 1e6))
            else:
                exp_asof[eid] = (None, None)
    got_asof = {
        r["left_id"]: (r["right_id"], r["gap_us"])
        for r in ev.asof_join(df).collect()
    }
    assert got_asof == exp_asof

    exp_rj = set()
    for uid, evs in by_user.items():
        ps = [(ts, eid) for ts, eid, ty in evs if ty == "purchase"]
        es = [(ts, eid) for ts, eid, ty in evs if ty == "error"]
        for pts, pid in ps:
            for ets, rid in es:
                d = (ets - pts).total_seconds()
                if abs(d) <= 3600:
                    exp_rj.add((uid, pid, rid, int(d * 1e6)))
    got_rj = {
        (r["user_id"], r["left_id"], r["right_id"], r["delta_us"])
        for r in ev.range_join(df).collect()
    }
    assert got_rj == exp_rj


def test_duplicate_spans_matches_bruteforce(spark):
    """Seeded random docs over a 3-token vocab (dense natural 8-gram
    collisions) vs a driver-side restatement of the islands recurrence."""
    import random

    from kgspark import textops

    rng = random.Random(5)
    texts = sorted(
        {
            " ".join(rng.choice("abc") for _ in range(rng.randrange(6, 50)))
            for _ in range(40)
        }
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    import hashlib

    def did(t):
        return "doc-" + hashlib.sha256(t.encode()).hexdigest()

    n = 8
    grams: dict = {}
    for t in texts:
        toks = t.split()
        grams[t] = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
    from collections import Counter

    docs_per_gram = Counter()
    for t in texts:
        for g in set(grams[t]):
            docs_per_gram[g] += 1
    expected = set()
    for t in texts:
        hits = [p for p, g in enumerate(grams[t]) if docs_per_gram[g] >= 2]
        if not hits:
            continue
        start = prev = hits[0]
        count = 1
        for p in hits[1:]:
            if p > prev + n:
                expected.add((did(t), start, prev + n - 1, prev - start + n, count))
                start, count = p, 0
            prev = p
            count += 1
        expected.add((did(t), start, prev + n - 1, prev - start + n, count))
    got = {
        (r["kg_doc_id"], r["span_start"], r["span_end"], r["span_len"], r["n_grams"])
        for r in textops.duplicate_spans(docs).collect()
    }
    assert got == expected and len(got) > 5


def test_pack_plan_tiles_under_random_corpora(spark):
    """Brute-force property: for ANY document multiset, pack_plan's
    offsets tile the concatenated token stream exactly — no gaps, no
    overlaps, total mass preserved, window arithmetic consistent — and a
    repartitioned input yields the identical plan (the distributed prefix
    sum is partition-invariant)."""
    import random

    from kgspark import textops

    for seed in (3, 11, 29):
        r = random.Random(seed)
        words = ["alpha", "beta", "gamma", "delta", "eps"]
        rows = [
            (i, " ".join(r.choice(words) for _ in range(r.randint(1, 40))), "en")
            for i in range(r.randint(30, 90))
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = sorted(
            (x["start_offset"], x["n_tokens"]) for x in textops.pack_plan(docs, ctx=32).collect()
        )
        pos = 0
        for start, n in out:
            assert start == pos, f"seed {seed}: gap/overlap at {start} != {pos}"
            pos += n
        # distinct texts only (duplicates pack once)
        n_distinct = len({t.strip() for _i, t, _l in rows if t.strip()})
        assert len(out) == n_distinct
        out2 = sorted(
            (x["start_offset"], x["n_tokens"])
            for x in textops.pack_plan(docs.repartition(7), ctx=32).collect()
        )
        assert out2 == out


def test_kcore_matches_peeling_across_random_graphs(spark):
    """Brute-force property: the h-index fixed point equals classic
    peeling coreness on random graphs of varying density (converged runs
    gated by assert_converged; sparse graphs get a bigger round budget)."""
    import random

    from kgspark import graph
    from tests.test_graph import _kcore_triples, _peel_coreness

    for seed, n_nodes, n_edges, iters in ((5, 30, 40, 16), (13, 30, 90, 10), (21, 50, 200, 10)):
        r = random.Random(seed)
        nodes = [f"v{i:02d}" for i in range(n_nodes)]
        edges = set()
        while len(edges) < n_edges:
            a, b = r.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
        got = {
            x["name"]: x["coreness"]
            for x in graph.kcore(
                _kcore_triples(spark, edges), iters=iters, assert_converged=True
            ).collect()
        }
        assert got == _peel_coreness(edges), f"seed {seed} diverged"


def test_transitions_chain_conservation(spark):
    """Brute-force property: transition counts reconstruct every user's
    chain — Σ n_transitions == Σ_u (events_u - 1), per-from rows sum to
    n_from, and p_micro is the exact integer quotient."""
    import datetime as dt
    import random

    from kgspark import events as ev

    r = random.Random(17)
    types = ["click", "view", "buy", "error"]
    rows = []
    eid = 0
    per_user = {}
    for u in range(12):
        k = r.randint(1, 15)
        per_user[u] = k
        for j in range(k):
            rows.append(
                (eid, dt.datetime(2025, 6, 1) + dt.timedelta(minutes=j), u,
                 r.choice(types), 0.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = ev.transitions(df).collect()
    assert sum(x["n_transitions"] for x in out) == sum(k - 1 for k in per_user.values())
    from collections import defaultdict

    by_from = defaultdict(int)
    for x in out:
        by_from[x["from_type"]] += x["n_transitions"]
        assert x["p_micro"] == x["n_transitions"] * 10**6 // x["n_from"]
    for x in out:
        assert by_from[x["from_type"]] == x["n_from"]


def test_mixture_apply_copy_counts_bound_by_weight(spark):
    """Brute-force property: every emitted doc's copy count is exactly
    floor(weight/1e6) or floor(weight/1e6)+1, and the realized per-lang
    total sits inside the deterministic-rounding band."""
    import random

    from kgspark import spec as kspec, textops

    r = random.Random(31)
    langs = list(kspec.MIXTURE_TARGETS_MICRO) + ["xx"]
    rows = [(i, "t", r.choice(langs)) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    plan = {x["lang"]: x["weight_micro"] for x in textops.mixture_plan(docs).collect()}
    from collections import Counter

    copies = Counter(
        (x["doc_id"], x["lang"]) for x in textops.mixture_apply(docs).collect()
    )
    n_lang = Counter(lang for _i, _t, lang in rows)
    for (doc_id, lang), n in copies.items():
        w = plan[lang]
        assert n in (w // 10**6, w // 10**6 + 1)
    for lang, w in plan.items():
        realized = sum(n for (_d, l), n in copies.items() if l == lang)
        lo, hi = n_lang[lang] * (w // 10**6), n_lang[lang] * (w // 10**6 + 1)
        assert lo <= realized <= hi
    assert all(l != "xx" for _d, l in copies)


def test_redirect_resolve_matches_walk_on_random_graphs(spark):
    """Brute-force property: pointer jumping with R rounds equals a plain
    per-hop walk of min(2^R, steps-to-terminal) hops on random redirect
    graphs (random functional graphs — chains, trees into sinks, cycles);
    is_resolved iff the walk's final URL is not a redirect source."""
    import random

    for seed in (3, 7, 19):
        r = random.Random(seed)
        n = 60
        # functional graph: ~2/3 of nodes are redirect sources
        ptr = {}
        for i in range(n):
            if r.random() < 0.66:
                j = r.randrange(n)
                if j != i:
                    ptr[f"u{i}"] = f"u{j}"
        edges = list(ptr.items())
        if not edges:
            continue
        df = spark.createDataFrame(edges, "src_url string, dst_url string")
        got = {
            x["src_url"]: (x["final_url"], x["is_resolved"])
            for x in pipeline.redirect_resolve(df).collect()
        }
        assert set(got) == set(ptr)
        budget = 2**pipeline.REDIRECT_ROUNDS
        for src, dst in ptr.items():
            cur, hops = dst, 1
            while cur in ptr and hops < budget:
                cur = ptr[cur]
                hops += 1
            assert got[src] == (cur, cur not in ptr), src


def test_redirect_resolve_planted_cycle_unresolved(spark):
    """The planted 3-cycle in the fixture must come back is_resolved=false
    for all three members, and every chain member must resolve to the
    chain's terminal."""
    df = datagen.crawl_redirects(spark)
    rows = pipeline.redirect_resolve(df).collect()
    cyc = {x for x in rows if x["src_url"].startswith("https://rc.test/")}
    assert len(cyc) == 3 and all(not x["is_resolved"] for x in cyc)
    rest = [x for x in rows if not x["src_url"].startswith("https://rc.test/")]
    assert rest and all(x["is_resolved"] for x in rest)


def test_distinct_kmv_matches_bruteforce_and_is_accurate(spark):
    """Brute-force property: the sketch row equals a pure-Python KMV over
    the same sha256-prefix hashes on random corpora (dupes, small groups
    under k, one group far above k); and the estimate for the large group
    lands within 3/sqrt(k) relative error (KMV's theoretical band)."""
    import hashlib
    import random

    from kgspark import textops

    r = random.Random(23)
    rows = []
    # small groups (< k distinct) + one large group (~600 distinct)
    for lang, n in (("aa", 5), ("bb", 40), ("cc", 600)):
        texts = [f"{lang}-doc-{i}-{r.randrange(10)}" for i in range(n)]
        rows += [(i, t, lang) for i, t in enumerate(texts)]
        rows += [(1000 + i, t, lang) for i, t in enumerate(texts[: n // 3])]  # dupes
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {x["lang"]: x for x in textops.distinct_kmv(df).collect()}

    k, span = textops.KMV_K, 1 << 48
    by_lang = {}
    for _i, t, lang in rows:
        hv = max(int(hashlib.sha256(t.encode()).hexdigest()[:12], 16), 1)
        by_lang.setdefault(lang, set()).add(hv)
    for lang, hs in by_lang.items():
        n_d = len(hs)
        est = n_d if n_d < k else (k - 1) * span // sorted(hs)[k - 1]
        row = got[lang]
        assert (row["n_distinct"], row["kmv_k"], row["kmv_estimate"]) == (n_d, k, est)
    big = got["cc"]
    rel = abs(big["kmv_estimate"] - big["n_distinct"]) / big["n_distinct"]
    assert rel <= 3 / (k ** 0.5), rel


def test_cms_heavy_hitters_matches_bruteforce(spark):
    """Brute-force property: on random Zipf-ish corpora the operator's rows
    equal a pure-Python count-min sketch (same md5 hashes) probed at the
    exact top-k, and the CMS overestimate is never negative."""
    import hashlib
    import random

    from kgspark import textops

    r = random.Random(41)
    vocab = [f"w{i}" for i in range(80)]
    rows = []
    for i in range(120):
        n = 1 + r.randrange(30)
        toks = [vocab[min(r.randrange(1, 81), r.randrange(1, 81)) - 1] for _ in range(n)]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (x["term"], x["exact_count"], x["cms_count"], x["cms_over"])
        for x in textops.cms_heavy_hitters(df).collect()
    )

    from collections import Counter

    cnt = Counter(t for _i, txt in rows for t in txt.split())
    d, w, k = textops.CMS_D, textops.CMS_W, textops.CMS_TOPK

    def h(j, term):
        return int(hashlib.md5(f"cms{j}|{term}".encode()).hexdigest()[:15], 16) % w

    table = [[0] * w for _ in range(d)]
    for term, c in cnt.items():
        for j in range(d):
            table[j][h(j, term)] += c
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    exp = sorted(
        (t, c, min(table[j][h(j, t)] for j in range(d)),
         min(table[j][h(j, t)] for j in range(d)) - c)
        for t, c in top
    )
    assert got == exp
    assert all(o >= 0 for _t, _c, _e, o in got)


def test_bloom_prefilter_no_false_negatives_and_matches_bruteforce(spark):
    """Brute-force property: the Bloom verdicts equal a pure-Python filter
    built with the same md5 hashes and sizing rule; members are NEVER
    missed; and an undersized filter (m=256 floor vs 300 keys) actually
    produces false positives — i.e. the FP path is exercised, not vacuous."""
    import hashlib
    import random

    from kgspark import sketches

    r = random.Random(47)
    members = r.sample(range(10_000), 300)
    cands = members[:150] + r.sample(range(10_000, 20_000), 200)
    mdf = spark.createDataFrame([(k,) for k in members], "k long")
    cdf = spark.createDataFrame([(k,) for k in cands], "cand_key long")
    out = {x["cand_key"]: (x["bloom_hit"], x["is_member"])
           for x in sketches.bloom_prefilter(mdf, cdf, "k", "cand_key").collect()}

    m = sketches.bloom_m_bits(300)

    def positions(k):
        return [
            int(hashlib.md5(f"bloom{j}|{k}".encode()).hexdigest()[:15], 16) % m
            for j in range(sketches.BLOOM_HASHES)
        ]

    bits = set()
    for k in members:
        bits.update(positions(k))
    mem = set(members)
    assert set(out) == set(cands)
    for k in cands:
        exp_hit = all(p in bits for p in positions(k))
        assert out[k] == (exp_hit, k in mem), k
    assert all(out[k][0] for k in members[:150])  # no false negatives

    # undersized filter -> observable false positives, still no FNs
    small = sketches.bloom_build(mdf.selectExpr("k"), "k", 256)
    hits = {
        x["cand_key"]: x["bloom_hit"]
        for x in sketches.bloom_probe(cdf, "cand_key", small, 256).collect()
    }
    assert all(hits[k] for k in members[:150])
    assert any(hits[k] for k in cands if k not in mem)


def test_robots_filter_matches_bruteforce_on_random_rules(spark):
    """Brute-force property: the Spark verdict equals a plain-Python RFC 9309
    evaluation (group selection, longest literal prefix, allow wins ties,
    absent host allows) on random rule tables and random frontier paths —
    including hosts with agent-only groups, *-only groups, both, and none."""
    import random

    for seed in (5, 11, 23):
        r = random.Random(seed)
        hosts = [f"h{i}.test" for i in range(8)]
        rules = []
        for h in hosts[:6]:  # last two hosts have NO robots rows at all
            agents = ["*", "kgbot"] if r.random() < 0.5 else [r.choice(["*", "kgbot"])]
            for a in agents:
                for _ in range(1 + r.randrange(4)):
                    kind = "disallow" if r.random() < 0.5 else "allow"
                    depth = 1 + r.randrange(3)
                    pfx = "/" + "/".join(str(r.randrange(4)) for _ in range(depth))
                    rules.append((h, a, kind, pfx))
        urls = []
        for _ in range(80):
            h = r.choice(hosts)
            depth = r.randrange(4)
            path = "/" + "/".join(str(r.randrange(4)) for _ in range(depth))
            urls.append((f"https://{h}{path if depth else ''}", "t"))
        pages = spark.createDataFrame(urls, "url string, text string")
        robots = spark.createDataFrame(
            rules, "host string, agent string, rule string, path_prefix string"
        )
        got = {
            x["url"]: (x["matched_prefix"], x["allowed"])
            for x in pipeline.robots_filter(pages, robots).collect()
        }
        assert set(got) == {u for u, _t in urls}
        from urllib.parse import urlparse

        by_host = {}
        for h, a, k, p in rules:
            by_host.setdefault(h, []).append((a, k, p))
        for url in {u for u, _t in urls}:
            pu = urlparse(url)
            host, path = (pu.hostname or "").lower(), pu.path or "/"
            grp = by_host.get(host, [])
            want = "kgbot" if any(a == "kgbot" for a, _k, _p in grp) else "*"
            m = [
                (len(p), 1 if k == "allow" else 0, p)
                for a, k, p in grp
                if a == want and path.startswith(p)
            ]
            exp = (max(m)[2], bool(max(m)[1])) if m else (None, True)
            assert got[url] == exp, (url, got[url], exp)


def test_robots_filter_fixture_semantics(spark):
    """Pinned fixture checks: the blanket-disallow host re-allows kgbot only
    under /page/1*; the specificity ladder flips allow/disallow at each
    longer prefix; rule-less hosts (www. variants) default to allow."""
    out = {
        x["url"]: (x["matched_prefix"], x["allowed"])
        for x in pipeline.robots_filter(
            datagen.crawl_url_variants(spark), datagen.crawl_robots(spark)
        ).collect()
    }
    s0 = {u: v for u, v in out.items() if "example-site0.test" in u and "www." not in u}
    assert s0 and all(
        v[1] == ("/page/1" in u and v[0] == "/page/1") for u, v in s0.items()
    )
    www = {u: v for u, v in out.items() if "www.example-site0" in u}
    assert www and all(v == (None, True) for v in www.values())


def test_fetch_schedule_per_host_invariants(spark):
    """Per host: slots are exactly 0..n-1 (dense, no collisions — the
    politeness guarantee), offsets are slot*delay, n_host is the queue
    length; hosts compare case-insensitively so URL-case variants of one
    host share one queue."""
    out = pipeline.fetch_schedule(datagen.crawl_url_variants(spark), delay_s=3).collect()
    by_host: dict[str, list] = {}
    for x in out:
        by_host.setdefault(x["host"], []).append(x)
    assert len(by_host) > 1
    for h, xs in by_host.items():
        assert h == h.lower()
        assert sorted(x["slot"] for x in xs) == list(range(len(xs)))
        assert all(x["scheduled_offset_s"] == x["slot"] * 3 for x in xs)
        assert all(x["n_host"] == len(xs) for x in xs)
        # deterministic order: slot follows sorted url order
        assert [x["url"] for x in sorted(xs, key=lambda x: x["slot"])] == sorted(
            x["url"] for x in xs
        )


def test_crawl_diff_matches_bruteforce_on_random_snapshots(spark):
    import random

    for seed in (2, 9):
        r = random.Random(seed)
        urls = [f"https://d.test/{i}" for i in range(50)]
        old = {u: f"sha{r.randrange(5)}" for u in urls if r.random() < 0.8}
        new = {u: f"sha{r.randrange(5)}" for u in urls if r.random() < 0.8}
        odf = spark.createDataFrame(list(old.items()), "url string, content_sha string")
        ndf = spark.createDataFrame(list(new.items()), "url string, content_sha string")
        got = {x["url"]: x["status"] for x in pipeline.crawl_diff(odf, ndf).collect()}
        assert set(got) == set(old) | set(new)
        for u in got:
            exp = (
                "new" if u not in old else "gone" if u not in new
                else "unchanged" if old[u] == new[u] else "changed"
            )
            assert got[u] == exp, (u, got[u], exp)


def test_sitemap_frontier_matches_etree_on_random_sitemaps(spark):
    """Brute-force property: the split/regexp Catalyst parse equals a real
    xml.etree parse on random sitemaps — optional fields, whitespace
    padding, XML-escaped ampersands in loc, multi-line layout."""
    import random
    import xml.etree.ElementTree as ET

    for seed in (4, 13):
        r = random.Random(seed)
        rows = []
        for s in range(4):
            host = f"h{s}.test"
            entries = []
            for i in range(1 + r.randrange(6)):
                loc = f"https://{host}/p/{r.randrange(30)}"
                if r.random() < 0.4:
                    loc += f"?x={r.randrange(5)}&amp;y={r.randrange(5)}"
                e = [f"<loc>{' ' * r.randrange(2)}{loc}{' ' * r.randrange(2)}</loc>"]
                if r.random() < 0.5:
                    e.append(f"<lastmod>2025-0{1 + r.randrange(9)}-01</lastmod>")
                if r.random() < 0.5:
                    e.append(f"<priority>{r.randrange(10) / 10}</priority>")
                sep = "\n" if r.random() < 0.5 else ""
                entries.append("<url>" + sep.join(e) + "</url>")
            rows.append(
                (host,
                 '<?xml version="1.0"?><urlset '
                 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                 + "\n".join(entries) + "</urlset>")
            )
        df = spark.createDataFrame(rows, "host string, xml string")
        got = sorted(
            (x["host"], x["loc"], x["lastmod"], x["priority_micro"])
            for x in pipeline.sitemap_frontier(df).collect()
        )
        ns = {"sm": "http://www.sitemaps.org/schemas/sitemap/0.9"}
        want = []
        for host, doc in rows:
            for u in ET.fromstring(doc).findall("sm:url", ns):
                lm = u.find("sm:lastmod", ns)
                pr = u.find("sm:priority", ns)
                want.append(
                    (host, u.find("sm:loc", ns).text.strip(),
                     lm.text.strip() if lm is not None else None,
                     int(round(float(pr.text) * 1e6)) if pr is not None else None)
                )
        assert got == sorted(want)


def test_parse_robots_matches_bruteforce_on_random_texts(spark):
    """Brute-force property: the windowed Catalyst parse equals a plain
    line-state python parser on random robots.txt grammars — consecutive
    UA lines sharing groups, comments, pre-group rules, empty Disallow,
    unknown directives, random casing/spacing."""
    import random

    for seed in (6, 21):
        r = random.Random(seed)
        rows = []
        for h in range(5):
            host = f"rb{h}.test"
            out = []
            for _ in range(r.randrange(14)):
                roll = r.random()
                if roll < 0.3:
                    out.append(
                        f"{r.choice(['User-agent', 'USER-AGENT', 'user-agent'])}"
                        f": agent{r.randrange(3)}"
                    )
                elif roll < 0.6:
                    kind = r.choice(["Allow", "Disallow", "ALLOW", "disallow"])
                    val = "" if r.random() < 0.15 else f"/p{r.randrange(6)}"
                    out.append(f"{kind}: {val}")
                elif roll < 0.7:
                    out.append("# pure comment line")
                elif roll < 0.8:
                    out.append("")
                elif roll < 0.9:
                    out.append(f"Crawl-delay: {r.randrange(9)}")
                else:
                    out.append("Sitemap: https://x.test/s.xml")
            rows.append((host, "\n".join(out)))
        # planted: blank/comment lines between consecutive UA lines must
        # NOT split the group (RFC 9309 — blank lines are insignificant)
        rows.append(
            ("rbx.test",
             "User-agent: a\n\n# gap\nUser-agent: b\nDisallow: /x\n"
             "\nUser-agent: c\nAllow: /y\n")
        )
        df = spark.createDataFrame(rows, "host string, robots_txt string")
        got = sorted(tuple(x) for x in pipeline.parse_robots(df).collect())
        want = []
        for host, txt in rows:
            agents: list[str] = []
            prev_was_ua = False
            for line in txt.split("\n"):
                line = line.split("#", 1)[0].strip()
                if not line or ":" not in line:
                    continue  # blanks/comments are grouping-insignificant
                d, _, v = line.partition(":")
                d, v = d.strip().lower(), v.strip()
                if d == "user-agent":
                    if not prev_was_ua:
                        agents = []
                    agents.append(v)
                    prev_was_ua = True
                else:
                    if d in ("allow", "disallow") and v and agents:
                        for a in sorted(set(agents)):
                            want.append((host, a, d, v))
                    prev_was_ua = False
        assert got == sorted(want), (got[:5], sorted(want)[:5])
        assert ("rbx.test", "a", "disallow", "/x") in want  # group not split
        assert ("rbx.test", "c", "disallow", "/x") not in want  # rules end it
