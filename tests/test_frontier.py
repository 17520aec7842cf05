"""Differential crawl tests: the Spark scheduling job must reproduce the
pure-Python oracle's crawl ordering, URL-seen set, and emitted span
sequences exactly (the TestGazetteerMatcher fast-vs-naive pattern,
nlp/src/test/.../TestGazetteerMatcher.java:65-136)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cc_dbp_spark.operators import frontier as fr
from cc_dbp_spark.oracle import scheduler as orc
from cc_dbp_spark.functions.urlnorm import canonicalize_py


@pytest.fixture(scope="module")
def oracle_result(fixture_tables):
    docs, seeds, robots = fixture_tables
    docs_by_url = {canonicalize_py(d["doc_id"]): d["spans"] for d in docs}
    cfg = orc.CrawlConfig(round_budget_s=3.0, max_rounds=4)
    return orc.run_oracle([s["url"] for s in seeds], docs_by_url, robots, cfg)


@pytest.fixture(scope="module")
def spark_result(spark, fixture_dir):
    docs = spark.read.parquet(str(fixture_dir / "documents_spans.parquet"))
    seeds = spark.read.parquet(str(fixture_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(fixture_dir / "robots_rules.parquet"))
    cfg = fr.CrawlConfig(round_budget_s=3.0, max_rounds=4, use_bloom=True,
                         bloom_capacity=1 << 14, bloom_partitions=4)
    driver = fr.CrawlDriver(spark, robots, docs, cfg)
    return driver.run(seeds)


def test_crawl_order_matches_oracle(oracle_result, spark_result):
    got = [
        (r["round"], r["position"], r["url"])
        for r in spark_result["schedule"]
        .orderBy("round", "position")
        .select("round", "position", "url")
        .collect()
    ]
    want = oracle_result.schedule_log
    assert len(got) == len(want), (len(got), len(want))
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:10]


def test_seen_set_matches_oracle(oracle_result, spark_result):
    got = {
        r["url"]: r["round_seen"]
        for r in spark_result["state"]["seen"].select("url", "round_seen").collect()
    }
    assert got == oracle_result.seen


def test_emitted_spans_match_fixture(oracle_result, spark_result, fixture_tables):
    """Span-sequence equality (kind, text, media_ref, order) on every
    emitted document — the per-row invariant from input_hint."""
    docs, _, _ = fixture_tables
    fixture_spans = {canonicalize_py(d["doc_id"]): d["spans"] for d in docs}
    emitted = spark_result["emitted"].select("url", "spans").collect()
    want_urls = {u for _, u, _ in oracle_result.emitted}
    assert {r["url"] for r in emitted} == want_urls
    for r in emitted:
        want = [(s["kind"], s["text"], s["media_ref"]) for s in fixture_spans[r["url"]]]
        got = [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        assert got == want, r["url"]
        offsets = [s["offset"] for s in r["spans"]]
        assert offsets == sorted(offsets), r["url"]


def test_audit_consistency(oracle_result, spark_result):
    got = {
        (r["round"], r["host"]): (r["candidates"], r["denied"], r["scheduled"], r["deferred"])
        for r in spark_result["audit"].collect()
    }
    want = {
        (a["round"], a["host"]): (a["candidates"], a["denied"], a["scheduled"], a["deferred"])
        for a in oracle_result.audit
    }
    # Spark audit may omit rounds after termination; oracle logs identical rounds
    assert got == want


def test_denied_host_never_scheduled(spark_result):
    # host44 is deny-all in the fixtures
    n = (
        spark_result["schedule"]
        .filter(F.col("host") == "host44.example.com")
        .count()
    )
    assert n == 0


def test_slow_host_deferred(spark_result, oracle_result):
    # host45 has crawl_delay 1000s; with 3s/round budget over these rounds it
    # can never accumulate enough credit -> nothing scheduled
    n = (
        spark_result["schedule"].filter(F.col("host") == "host45.example.com").count()
    )
    assert n == 0
    assert not any("host45" in u for u in oracle_result.seen)


def test_salted_topk_equals_plain(spark, fixture_dir):
    """Hot-host salting must not change results (two-phase == single-phase)."""
    docs = spark.read.parquet(str(fixture_dir / "documents_spans.parquet"))
    seeds = spark.read.parquet(str(fixture_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(fixture_dir / "robots_rules.parquet"))
    base = dict(round_budget_s=3.0, max_rounds=2, use_bloom=False)
    plain = fr.CrawlDriver(
        spark, robots, docs, fr.CrawlConfig(**base, hot_host_threshold=10**9)
    ).run(seeds)
    salted = fr.CrawlDriver(
        spark, robots, docs, fr.CrawlConfig(**base, hot_host_threshold=5, hot_host_cap=5)
    ).run(seeds)
    p = [(r["round"], r["position"], r["url"]) for r in plain["schedule"].orderBy("round", "position").collect()]
    s = [(r["round"], r["position"], r["url"]) for r in salted["schedule"].orderBy("round", "position").collect()]
    assert p == s


def test_cuckoo_filter_path_matches_oracle(spark, fixture_dir, oracle_result):
    """Same crawl with the cuckoo membership filter instead of bloom —
    identical ordering + seen set (filters are advisory; the exact
    anti-join confirms every 'maybe')."""
    docs = spark.read.parquet(str(fixture_dir / "documents_spans.parquet"))
    seeds = spark.read.parquet(str(fixture_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(fixture_dir / "robots_rules.parquet"))
    cfg = fr.CrawlConfig(
        round_budget_s=3.0, max_rounds=4, use_bloom=True,
        filter_kind="cuckoo", bloom_capacity=1 << 14, bloom_partitions=4,
    )
    res = fr.CrawlDriver(spark, robots, docs, cfg).run(seeds)
    got = [
        (r["round"], r["position"], r["url"])
        for r in res["schedule"].orderBy("round", "position").collect()
    ]
    assert got == oracle_result.schedule_log
    got_seen = {
        r["url"]: r["round_seen"]
        for r in res["state"]["seen"].select("url", "round_seen").collect()
    }
    assert got_seen == oracle_result.seen


def test_resume_equals_straight_run(spark, fixture_dir, tmp_path_factory):
    """Kill-after-round-k resume: checkpointed run == uninterrupted run."""
    docs = spark.read.parquet(str(fixture_dir / "documents_spans.parquet"))
    seeds = spark.read.parquet(str(fixture_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(fixture_dir / "robots_rules.parquet"))
    straight = fr.CrawlDriver(
        spark, robots, docs, fr.CrawlConfig(round_budget_s=3.0, max_rounds=4, use_bloom=False)
    ).run(seeds)
    want_seen = {
        (r["url"], r["round_seen"]) for r in straight["state"]["seen"].collect()
    }

    ckpt = tmp_path_factory.mktemp("ckpt")
    # run only 2 rounds, checkpointing
    d1 = fr.CrawlDriver(
        spark, robots, docs,
        fr.CrawlConfig(round_budget_s=3.0, max_rounds=2, use_bloom=False),
        state_dir=ckpt,
    )
    d1.run(seeds)
    # resume to 4 rounds from checkpoint
    d2 = fr.CrawlDriver(
        spark, robots, docs,
        fr.CrawlConfig(round_budget_s=3.0, max_rounds=4, use_bloom=False),
        state_dir=ckpt,
    )
    resumed = d2.run(seeds, resume=True)
    got_seen = {(r["url"], r["round_seen"]) for r in resumed["state"]["seen"].collect()}
    assert got_seen == want_seen
    # the n_seen counter survives the resume (it used to restart at 0,
    # undercounting every pre-resume round in the returned state)
    assert resumed["state"]["n_seen"] == straight["state"]["n_seen"] == len(want_seen)


def test_fused_round_equals_reference_composition(spark, fixture_dir):
    """The single-shuffle fused round must produce the same flagged set
    and schedule as the reference composition (_merge_candidates +
    _robots_flag + _topk_per_host) on a carried frontier + seen state
    (the fast-vs-naive differential pattern)."""
    seeds = spark.read.parquet(str(fixture_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(fixture_dir / "robots_rules.parquet"))
    cfg = fr.CrawlConfig(round_budget_s=3.0, use_bloom=False)
    rnd = 2
    # synthetic mid-crawl state: some urls already seen, some carried over
    cand = seeds.select("url", F.lit(2).cast("int").alias("depth"))
    canon = cand.selectExpr("url", "depth").limit(200)
    frontier_rows = spark.createDataFrame(
        [
            ("http://host3.example.com/carried/1", "host3.example.com", 1, 4, 1),
            ("http://host7.example.com/carried/2", "host7.example.com", 2, 2, 0),
        ],
        fr.FRONTIER_SCHEMA,
    )
    # seen urls must be canonical (the round tests canonical candidates)
    seen_rows = spark.createDataFrame(
        [(canonicalize_py(r["url"]), 0, 0) for r in canon.limit(30).collect()],
        fr.SEEN_SCHEMA,
    )
    credit = spark.createDataFrame([("host3.example.com", 1.5)], fr.CREDIT_SCHEMA)

    flagged, budgets, scheduled, _ = fr._fused_schedule(
        canon, frontier_rows, seen_rows, robots, credit, rnd, cfg,
        seen_nonempty=True, frontier_nonempty=True,
    )

    merged = fr._merge_candidates(
        canon, frontier_rows, seen_rows, rnd, cfg,
        seen_nonempty=True, frontier_nonempty=True,
    )
    ref_flagged = fr._robots_flag(merged, robots)
    ref_allowed = ref_flagged.filter(~F.col("denied")).drop("denied")
    host_stats = ref_flagged.groupBy("host").agg(
        F.count(F.when(~F.col("denied"), 1)).alias("n"),
        F.count(F.when(F.col("denied"), 1)).alias("denied"),
    )
    ref_budgets = fr._host_budgets_from_stats(host_stats, credit, robots, cfg)
    ref_sched = fr._topk_per_host(ref_allowed, ref_budgets, cfg)

    key = lambda rows: sorted(
        (r["url"], r["host"], r["depth"], r["link_count"], r["round_added"], r["denied"])
        for r in rows
    )
    assert key(
        flagged.select("url", "host", "depth", "link_count", "round_added", "denied").collect()
    ) == key(ref_flagged.collect())

    skey = lambda rows: sorted((r["url"], r["host"], r["rank"]) for r in rows)
    assert skey(scheduled.select("url", "host", "rank").collect()) == skey(
        ref_sched.select("url", "host", "rank").collect()
    )


def test_resume_restores_filter_snapshot(spark, fixture_dir, tmp_path_factory):
    """Resume with the bloom path: the filter snapshot parquet must exist
    in the checkpoint, reload on resume, and yield the same schedule and
    seen set as an uninterrupted bloom run."""
    docs = spark.read.parquet(str(fixture_dir / "documents_spans.parquet"))
    seeds = spark.read.parquet(str(fixture_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(fixture_dir / "robots_rules.parquet"))
    base = dict(round_budget_s=3.0, use_bloom=True, bloom_capacity=1 << 14,
                bloom_partitions=4)
    straight = fr.CrawlDriver(
        spark, robots, docs, fr.CrawlConfig(**base, max_rounds=4)
    ).run(seeds)
    want = [
        (r["round"], r["position"], r["url"])
        for r in straight["schedule"].orderBy("round", "position").collect()
    ]
    want_seen = {(r["url"], r["round_seen"]) for r in straight["state"]["seen"].collect()}

    ckpt = tmp_path_factory.mktemp("ckpt_bloom")
    fr.CrawlDriver(
        spark, robots, docs, fr.CrawlConfig(**base, max_rounds=2), state_dir=ckpt
    ).run(seeds)
    assert (ckpt / "round_0001" / "filter").exists()  # snapshot written
    resumed = fr.CrawlDriver(
        spark, robots, docs, fr.CrawlConfig(**base, max_rounds=4), state_dir=ckpt
    ).run(seeds, resume=True)
    # a resumed run's schedule covers only the resumed rounds (2-3); the
    # earlier rounds already live in the fetch_batch checkpoints
    got = [
        (r["round"], r["position"], r["url"])
        for r in resumed["schedule"].orderBy("round", "position").collect()
    ]
    got_seen = {(r["url"], r["round_seen"]) for r in resumed["state"]["seen"].collect()}
    assert got == [w for w in want if w[0] >= 2]
    assert got_seen == want_seen


@pytest.mark.parametrize("seed", [3, 17])
def test_fused_randomized_differential(spark, seed):
    """Randomized fast-vs-naive: fused single-shuffle round == reference
    composition over random frontiers, seen sets, robots, credits, and
    hot-host settings."""
    import random

    rng = random.Random(seed)
    hosts = [f"h{i}.ex{rng.randint(0, 2)}.org" for i in range(rng.randint(3, 8))]
    raw = []
    for _ in range(rng.randint(150, 400)):
        h = rng.choice(hosts)
        path = f"/p{rng.randint(0, 40)}" + ("/" if rng.random() < 0.3 else "")
        frag = "#x" if rng.random() < 0.2 else ""
        port = ":80" if rng.random() < 0.2 else ""
        raw.append((f"http://{h.upper()}{port}{path}{frag}", rng.randint(0, 4)))
    cand = spark.createDataFrame(raw, "url string, depth int")
    canon_urls = sorted({canonicalize_py(u) for u, _ in raw})
    seen_urls = rng.sample(canon_urls, k=len(canon_urls) // 5)
    seen_rows = spark.createDataFrame(
        [(u, 0, 0) for u in seen_urls], fr.SEEN_SCHEMA
    )
    frontier_rows = spark.createDataFrame(
        [
            (f"http://{h}/carried/{i}", h, rng.randint(0, 3), rng.randint(0, 9), 0)
            for i, h in enumerate(rng.sample(hosts, k=min(3, len(hosts))))
        ],
        fr.FRONTIER_SCHEMA,
    )
    robots = spark.createDataFrame(
        [
            (h, [f"/p{rng.randint(0, 40)}"], [], float(rng.choice([0.5, 1.0, 4.0])))
            for h in rng.sample(hosts, k=len(hosts) // 2)
        ],
        "host string, deny_prefixes array<string>, allow_prefixes array<string>, crawl_delay_s double",
    )
    credit = spark.createDataFrame(
        [(h, rng.uniform(0, 3)) for h in rng.sample(hosts, k=len(hosts) // 3)],
        fr.CREDIT_SCHEMA,
    )
    cfg = fr.CrawlConfig(
        round_budget_s=rng.choice([2.0, 5.0]),
        use_bloom=rng.random() < 0.5,
        bloom_capacity=1 << 12, bloom_partitions=4,
        hot_host_threshold=rng.choice([10, 10**9]),
        hot_host_cap=5,
    )
    rnd = rng.randint(1, 3)

    flagged, budgets, scheduled, _ = fr._fused_schedule(
        cand, frontier_rows, seen_rows, robots, credit, rnd, cfg,
        seen_nonempty=True, frontier_nonempty=True,
    )
    merged = fr._merge_candidates(
        cand, frontier_rows, seen_rows, rnd, cfg,
        seen_nonempty=True, frontier_nonempty=True,
    )
    ref_flagged = fr._robots_flag(merged, robots)
    host_stats = ref_flagged.groupBy("host").agg(
        F.count(F.when(~F.col("denied"), 1)).alias("n"),
        F.count(F.when(F.col("denied"), 1)).alias("denied"),
    )
    ref_budgets = fr._host_budgets_from_stats(host_stats, credit, robots, cfg)
    ref_sched = fr._topk_per_host(
        ref_flagged.filter(~F.col("denied")).drop("denied"), ref_budgets, cfg
    )

    key = lambda rows: sorted(
        (r["url"], r["host"], r["depth"], r["link_count"], r["round_added"], r["denied"])
        for r in rows
    )
    assert key(
        flagged.select("url", "host", "depth", "link_count", "round_added", "denied").collect()
    ) == key(ref_flagged.collect())
    skey = lambda rows: sorted((r["url"], r["host"], r["rank"]) for r in rows)
    assert skey(scheduled.select("url", "host", "rank").collect()) == skey(
        ref_sched.select("url", "host", "rank").collect()
    )


def test_bucketed_seen_state_equals_plain(spark, fixture_dir, tmp_path_factory):
    """The deployment layout for the O(seen) confirm anti-join, wired
    through a REAL round: run_round with state['seen'] = a bucketed+
    sorted table scan produces the identical schedule (the one-Exchange
    plan property is asserted at the layout level in
    test_serde_layout_streaming)."""
    from cc_dbp_spark.plans import layout

    docs = spark.read.parquet(str(fixture_dir / "documents_spans.parquet"))
    seeds = spark.read.parquet(str(fixture_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(fixture_dir / "robots_rules.parquet"))
    cfg = fr.CrawlConfig(round_budget_s=3.0, use_bloom=False)

    st = fr.empty_state(spark)
    st["seen_nonempty"] = False
    st["frontier_nonempty"] = False
    out0 = fr.run_round(
        spark, seeds.select("url", F.col("depth").cast("int")), st, robots,
        docs, 0, cfg,
    )
    seen = out0["seen"].localCheckpoint(eager=True)
    frontier1 = out0["frontier"].localCheckpoint(eager=True)
    cand1 = out0["outlinks"].localCheckpoint(eager=True)
    carried = {
        "frontier": frontier1,
        "credit": out0["credit"].localCheckpoint(eager=True),
        "seen_nonempty": seen.count() > 0,
        "frontier_nonempty": frontier1.count() > 0,
    }
    assert carried["seen_nonempty"]  # the anti-join path must be live

    def round1(seen_df):
        out = fr.run_round(
            spark, cand1, {**carried, "seen": seen_df}, robots, docs, 1, cfg
        )
        batch = out["fetch_batch"]
        return [(r["position"], r["url"]) for r in batch.orderBy("position").collect()]

    want = round1(seen)

    tmp = tmp_path_factory.mktemp("seenbkt")
    layout.write_bucketed_snapshot(seen, "seen_round_bkt", 4, key="url",
                                   path=str(tmp / "seen"))
    # production seen sets exceed any broadcast threshold; force the
    # sort-merge path the bucketing is for (the fetch_batch plan itself
    # cannot be inspected here — the anti-join runs upstream of the
    # round's internal checkpoint — so the one-Exchange property is
    # plan-asserted at the layout level instead)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = round1(spark.table("seen_round_bkt"))
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS seen_round_bkt")
