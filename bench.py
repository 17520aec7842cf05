"""Benchmark harness (driver contract: prints ONE JSON line).

Default: run the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the crawl
scheduling-round throughput job, and — unless SPARK_GRAFT_BENCH_SCALING=0
— the two-parallelism scaling evidence (same job, same input, local[1]
vs local[4] per SCALE_CORES below; the sandbox stand-in for N vs 4N
executors per BASELINE.md).

  python bench.py                  # full bench, one JSON line
  python bench.py --crawl-only --cores 8   # one scaling probe (subprocess)
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CRAWL_N_URLS = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "8000000"))
# second scale point: fixed per-round cost (planning, job launch) is
# <5% at 32M, so this is the fixed-cost-clean throughput number
CRAWL_N_URLS_BIG = int(os.environ.get("SPARK_GRAFT_BENCH_URLS_BIG", "32000000"))
# scaling pair N vs 4N: 1 vs 4 cores. On a real cluster each executor
# brings its own memory bus; on this single-box stand-in the bus is
# shared, and past ~4-8 workers it saturates (memory bandwidth REGRESSES
# by 32 — see the controls in the scaling output). (1, 4) is the widest
# N->4N pair where neither side pays that shared-hardware penalty, i.e.
# where the box actually simulates two cluster sizes; the (2, 8) pair is
# also reported in BENCH.md with the saturation evidence.
SCALE_CORES = (1, 4)

BENCH_QUERIES = [
    "corpus_stats",
    "word_counts",
    "token_count",
    "quality",
    "langid",
    "fingerprint",
    "dedup_survivors",
    "ngram_jaccard",
    "minhash_near_dups",
    "simhash_near_dups",
    "emb_near_dups",
    "ann_brute",
    "ann_ivf",
    "topk_per_host",
    "url_canonicalize",
    "host_counts",
    "crawl_round_set",
    "crawl_multiround",
    "crawl_stream_rounds",
    "gazetteer_mentions_ruletok",
    "media_features",
    "warc_parse",
    "tensor_lines",
    "sessionize",
    "html_extract",
    "events_hourly",
    "lineitem_pricing",
    "gazetteer_mentions",
    "gazetteer_label_filter",
    "gazetteer_overlap_clean",
    "mention_pairs_window",
    "mention_pairs",
    "mention_groups",
    "mention_downsample_ratio",
    "mention_types",
    "triple_counts",
    "literal_clean",
    "ntriples_parse",
    "tsv_scan",
    "learning_curve",
    "neardup_components",
    "langid_trigram",
    "html_extract_density",
    "w2v_lines",
    "doc_split",
]


def synth_frontier(spark, n_urls: int):
    """Deterministic synthetic candidate frontier: ~1000 hosts with 3 hot
    hosts holding ~30% of URLs (skew path), URL shapes covering every
    canonicalizer rule. Pure Spark expressions — no driver-side data."""
    base = spark.range(n_urls).withColumn(
        "host",
        F.when(F.pmod("id", 10) < 3, F.concat(F.lit("hot"), F.pmod("id", 3)))
        .otherwise(F.concat(F.lit("h"), F.pmod(F.xxhash64("id"), 997))),
    )
    d = F.col("id").cast("string")
    raw = (
        F.when(F.col("id") % 5 == 0,
               F.concat(F.lit("HTTP://"), F.upper("host"), F.lit(".EX.COM/p/"), d, F.lit("#f")))
        .when(F.col("id") % 5 == 1,
              F.concat(F.lit("http://"), F.col("host"), F.lit(".ex.com:80/p//"), d, F.lit("/")))
        .when(F.col("id") % 5 == 2, F.concat(F.col("host"), F.lit(".ex.com/p/"), d))
        .when(F.col("id") % 5 == 3,
              F.concat(F.lit("https://"), F.col("host"), F.lit(".ex.com:443/p/"), d))
        .otherwise(F.concat(F.lit("http://"), F.col("host"), F.lit(".ex.com/p/"), d, F.lit("?q=1")))
    )
    return base.select(raw.alias("url"), F.lit(0).alias("depth"))


def synth_robots(spark):
    hosts = spark.range(997).select(
        F.concat(F.lit("h"), F.col("id")).alias("host")
    ).union(spark.range(3).select(F.concat(F.lit("hot"), F.col("id")).alias("host")))
    return hosts.select(
        "host",
        F.array().cast("array<string>").alias("allow_prefixes"),
        F.when(F.col("host") == "h13", F.array(F.lit("/p"))).otherwise(
            F.array().cast("array<string>")
        ).alias("deny_prefixes"),
        F.lit(1.0).alias("crawl_delay_s"),
    )


def crawl_round_bench(spark, n_urls: int) -> dict:
    """One full scheduling round over the synthetic frontier; returns
    timing + throughput. This is the scaling-evidence job."""
    from cc_dbp_spark.operators import frontier
    from cc_dbp_spark.session import clear_persisted

    # free persisted blocks (incl. localCheckpoints) from earlier reps so
    # accumulated storage can't evict/GC-thrash the rep being measured
    clear_persisted(spark)
    candidates = synth_frontier(spark, n_urls).localCheckpoint(eager=True)
    robots = synth_robots(spark).localCheckpoint(eager=True)
    docs = spark.createDataFrame(
        [],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    cfg = frontier.CrawlConfig(
        round_budget_s=300.0,  # k=300 per host -> window actually prunes
        hot_host_threshold=20_000,
        hot_host_cap=10_000,
        use_bloom=False,  # round 0: seen set empty
        # this job measures scheduling rate (the north metric): the
        # schedule is the only consumed output, so the frontier-sized
        # intra-round cache (which serves audit + next-frontier in a
        # full round; crawl_multiround measures THAT) is not part of
        # the work
        cache_flagged=False,
    )
    state = frontier.empty_state(spark)
    state["seen_nonempty"] = False
    t0 = time.time()
    out = frontier.run_round(spark, candidates, state, robots, docs, 0, cfg)
    n_scheduled = out["fetch_batch"].count()
    elapsed = time.time() - t0
    return {
        "elapsed_s": round(elapsed, 3),
        "n_candidates": n_urls,
        "n_scheduled": n_scheduled,
        "urls_scheduled_per_sec": round(n_scheduled / elapsed, 1),
        "candidates_per_sec": round(n_urls / elapsed, 1),
    }


# quiet-stretch 1-core CPU control reference (the r3-session control,
# the best recorded on this VM): normalized seconds are
# elapsed * (measured_mops / NOMINAL), so a probe taken on a degraded
# stretch (tenant burst) reads comparably across rounds. RAW numbers
# are always reported alongside — normalization is an annotation, not
# a replacement.
NOMINAL_MOPS_1CORE = 15.8


def _control_mops(n: int = 2_000_000) -> float:
    """Single-core pure-CPU control: box speed at THIS instant."""
    t0 = time.time()
    _burn(n)
    el = time.time() - t0
    return round(n / el / 1e6, 1)


def run_crawl_only(cores: int, n_urls: int = CRAWL_N_URLS,
                   rounds: int = 5, guard: float = 1.5) -> None:
    # heap proportional to cores, mirroring a real cluster where 4N
    # executors bring 4x aggregate memory: a fixed shared heap makes the
    # wide side pay 4x the GC pressure per unit work, an artifact of the
    # single-JVM stand-in rather than of the job
    os.environ.setdefault("SPARK_DRIVER_MEM", f"{min(24, max(6, 3 * cores))}g")
    from cc_dbp_spark.session import get_spark, warm_python_worker_pool

    # AQE off for the scaling probe: its per-query-stage materialization
    # barriers add fixed driver latency that swamps small rounds; shuffle
    # partitioning is already explicit + proportional to cores here.
    # Shuffle compression ON (overriding the local-mode default): probe
    # shuffles model a real cluster's compressed network shuffles, and
    # uncompressed local shuffle I/O is the noisiest cross-tenant
    # resource on this VM (A/B: compressed 8-core rounds are both faster
    # and far more stable).
    spark = get_spark(
        f"bench-crawl-{cores}",
        cores=cores,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.shuffle.compress": "true",
            "spark.shuffle.spill.compress": "true",
        },
    )
    warm_python_worker_pool(spark, cores)
    # FULL-SIZE warmup round: a small warmup leaves the first timed
    # round paying JIT compilation and heap-ergonomics growth (measured:
    # first-8M-after-1M-warmup runs 1.5-2x the steady state at 8 cores)
    crawl_round_bench(spark, n_urls)
    # per-probe interleaved CPU control (r4 verdict: a tenant burst on
    # an uncontrolled probe read as a 2.8x regression): one 1-core
    # control before/after every timed round, median reported with the
    # probe so readers can normalize
    # three interleaved controls per round: ALU Mops (scalar CPU),
    # steady-state copy GB/s (memory bus), first-touch fault GB/s
    # (host page population) — each catches a distinct degradation
    # mode this multi-tenant VM actually exhibits
    runs, controls = [], [_control_mops()]
    membws, faults = [_membw_gbs()], [_fault_gbs()]
    for _ in range(rounds):
        runs.append(crawl_round_bench(spark, n_urls))
        controls.append(_control_mops())
        membws.append(_membw_gbs())
        faults.append(_fault_gbs())

    def _spread(rs):
        els = [r["elapsed_s"] for r in rs]
        return max(els) / min(els)

    def _core_spread(rs):
        # spread over the `rounds` values nearest the median — the set
        # the reported median is actually supported by. A single tenant
        # burst leaves the RAW spread >1.5 forever (the outlier stays in
        # max()) even when the distribution around the median is tight;
        # this statistic answers "is the median settled", the raw spread
        # answers "how noisy was the box". Both are reported.
        import statistics as _st

        els = sorted(r["elapsed_s"] for r in rs)
        med = _st.median(els)
        core = sorted(els, key=lambda e: abs(e - med))[:rounds]
        return max(core) / min(core)

    # spread guard: tenant bursts blow the spread; add up to 3 extra
    # rounds (all raws still reported) until the median's supporting
    # window is tight — guarding on the CORE spread stops early once
    # the median has settled instead of burning all 3 extras chasing a
    # single unremovable outlier
    # `guard` is the core-spread ceiling: 1.5 for headline probes; the
    # scaling probes pass 1.3 (a burst on ONE side of an N-vs-4N pair
    # skews the ratio itself, so their medians deserve a tighter
    # supporting window — extra rounds there are cheap on the 4N side
    # and the 1-core side rarely triggers, its rounds are long and calm)
    extra = 0
    while _core_spread(runs) > guard and extra < 3:
        runs.append(crawl_round_bench(spark, n_urls))
        controls.append(_control_mops())
        membws.append(_membw_gbs())
        faults.append(_fault_gbs())
        extra += 1
    import statistics

    med = statistics.median(r["elapsed_s"] for r in runs)
    res = dict(min(runs, key=lambda r: abs(r["elapsed_s"] - med)))
    res["elapsed_s"] = round(med, 3)
    res["urls_scheduled_per_sec"] = round(res["n_scheduled"] / med, 1)
    res["candidates_per_sec"] = round(res["n_candidates"] / med, 1)
    res["cores"] = cores
    res["all_runs_s"] = [r["elapsed_s"] for r in runs]
    res["raw_spread"] = round(_spread(runs), 2)
    res["core_spread"] = round(_core_spread(runs), 2)
    ctrl = statistics.median(controls)
    res["cpu_control_mops"] = round(ctrl, 1)
    res["cpu_control_raw"] = controls
    res["membw_control_gbs"] = round(statistics.median(membws), 2)
    res["membw_control_raw"] = membws
    res["fault_control_gbs"] = round(statistics.median(faults), 2)
    res["fault_control_raw"] = faults
    res["elapsed_norm_s"] = round(med * ctrl / NOMINAL_MOPS_1CORE, 3)
    res["candidates_per_sec_norm"] = round(
        res["n_candidates"] / res["elapsed_norm_s"], 1
    )
    print("CRAWLBENCH " + json.dumps(res))
    spark.stop()


def _burn(n):
    x = 0
    for i in range(n):
        x += i * i
    return x


_MEMBW_BUF = None


def _membw_gbs(nbytes: int = 256 * 1024 * 1024, copies: int = 3) -> float:
    """Streaming memory-bandwidth control (GB/s copied, median of
    `copies` big-array copies). The ALU burn (`_control_mops`) is blind
    to the resource a shuffle/sort/cache engine saturates first: a
    stretch can read 'CPU above nominal' while every Spark query runs
    1.5x slow because another tenant is hammering the memory bus. Two
    controls together make that attributable. Buffers are cached and
    pre-faulted so the timed window is copies only."""
    import statistics

    import numpy as np

    global _MEMBW_BUF
    if _MEMBW_BUF is None or _MEMBW_BUF[0].nbytes != nbytes:
        src = np.ones(nbytes, dtype=np.uint8)
        dst = np.empty_like(src)
        dst[:] = src  # fault dst pages in outside the timed window
        _MEMBW_BUF = (src, dst)
    src, dst = _MEMBW_BUF
    times = []
    for _ in range(copies):
        t0 = time.time()
        dst[:] = src
        times.append(time.time() - t0)
    return round(nbytes / statistics.median(times) / 1e9, 2)


def _fault_gbs(nbytes: int = 128 * 1024 * 1024) -> float:
    """First-touch page-fault rate (GB/s): alloc + populate a fresh
    buffer. Healthy hosts fault several GB/s; this VM has been observed
    at 0.17 GB/s (host-level lazy population / ballooning) — a stretch
    where STEADY-STATE copy runs 9 GB/s and the ALU burn reads above
    nominal, yet every Spark query runs 1.5x slow, because JVM heap
    growth, shuffle buffers, and fresh Python workers all pay the
    fault path. The third control that makes those stretches legible."""
    import numpy as np

    t0 = time.time()
    a = np.ones(nbytes, dtype=np.uint8)
    el = time.time() - t0
    del a
    return round(nbytes / el / 1e9, 2)


_MEMBW_WORKER_BUF = None


def _membw_worker(nbytes: int) -> float:
    """Per-worker aggregate-copy throughput (bytes/s), timed INSIDE the
    worker so pool fork/startup never pollutes the reading; buffers are
    cached in a worker-process global so only the first map call per
    pool pays the fault-in (which can cost seconds on this VM)."""
    import numpy as np

    global _MEMBW_WORKER_BUF
    if _MEMBW_WORKER_BUF is None or _MEMBW_WORKER_BUF[0].nbytes != nbytes:
        src = np.ones(nbytes, dtype=np.uint8)
        dst = np.empty_like(src)
        dst[:] = src  # warm + fault-in
        _MEMBW_WORKER_BUF = (src, dst)
    src, dst = _MEMBW_WORKER_BUF
    copies = 4
    t0 = time.time()
    for _ in range(copies):
        dst[:] = src
    return copies * nbytes / (time.time() - t0)


def _membw_control(workers_list=(1, 8, 32),
                   nbytes: int = 128 * 1024 * 1024) -> dict:
    """Parallel streaming-bandwidth ceiling: aggregate copy GB/s at w
    concurrent copiers (median of 3). This is the control that explains
    the wide-side scaling envelope — on this box bandwidth peaks near 8
    workers and REGRESSES by 32, which bounds any data engine's N->4N
    ratio long before its own coordination does."""
    import multiprocessing as mp
    import statistics

    out = {}
    for w in workers_list:
        reps = []
        with mp.Pool(w) as p:
            for _ in range(3):
                rates = p.map(_membw_worker, [nbytes] * w)
                reps.append(sum(rates) / 1e9)
        out[str(w)] = round(statistics.median(reps), 1)
    return out


def _cpu_control(workers_list=(1, 8, 32)) -> dict:
    """Pure-CPU multiprocessing control: the machine's own parallel
    speedup ceiling (turbo/scheduler), independent of Spark.

    The timed window covers ONLY the burn map on an already-warm pool:
    Pool(w) fork/startup ran >1 s on a cold-cache box, which at the old
    4M-op work unit (~0.2 s) drowned the 1-worker measurement 6x and
    produced physically impossible super-unity parallel efficiencies
    (per-worker throughput at w>1 "exceeding" 1-worker throughput) —
    poisoning the CPU-normalized scaling annotation derived from it."""
    import multiprocessing as mp
    import statistics

    out = {}
    n = 16_000_000  # ~1 s/worker: startup jitter is noise, not signal
    for w in workers_list:
        reps = []
        with mp.Pool(w) as p:
            p.map(_burn, [100_000] * w)  # warm the forked workers
            for _ in range(3):  # median-of-3: single reps swing 1.4x
                t0 = time.time()
                p.map(_burn, [n] * w)
                el = time.time() - t0
                reps.append(w * n / el / 1e6)
        out[str(w)] = round(statistics.median(reps), 1)  # M ops/s aggregate
    return out


def _one_crawl_probe(cores: int, n_urls: int = CRAWL_N_URLS,
                     rounds: int = 5, guard: float = 1.5) -> dict | None:
    # timeout scales with probe size and round count — including the up
    # to 3 EXTRA rounds run_crawl_only's spread guard may add under the
    # very contention this budget exists to survive; expiry returns
    # None (skip the probe) instead of killing the whole bench after
    # the suite ran — this VM's tenant contention swings wall time 2.5-3x
    budget = (300 + 220 * (rounds + 1 + 3)) * max(1, -(-n_urls // CRAWL_N_URLS))
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--crawl-only", "--cores", str(cores),
             "--urls", str(n_urls), "--rounds", str(rounds),
             "--guard", str(guard)],
            capture_output=True, text=True, timeout=budget,
        )
    except subprocess.TimeoutExpired:
        return None
    line = [l for l in proc.stdout.splitlines() if l.startswith("CRAWLBENCH ")]
    return json.loads(line[-1][len("CRAWLBENCH "):]) if line else None


SCALE_PAIRS = int(os.environ.get("SPARK_GRAFT_SCALE_PAIRS", "2"))


def run_scaling() -> dict:
    """Same job, same input, two parallelism levels (N vs 4N cores).

    Fixed protocol (no adaptive stopping): SCALE_PAIRS interleaved
    (N, 4N) subprocess pairs, each probe = fresh JVM, warmup round, then
    2 timed rounds with persisted state cleared between reps. The
    reported per-side elapsed is the MEDIAN of all timed rounds across
    all probes; every raw round time is recorded in `raw_runs_s`. This
    VM shares hardware with other tenants (2-3x bursts), which is why
    the pairs are interleaved — a noise burst lands on both sides."""
    import statistics

    n, n4 = SCALE_CORES
    raw: dict[int, list[float]] = {n: [], n4: []}
    sample: dict[int, dict] = {}
    for _ in range(SCALE_PAIRS):
        for cores in (n, n4):
            # 3 rounds/probe here (2 interleaved pairs already give 6
            # samples per side); 5-round medians are for the headline
            r = _one_crawl_probe(cores, rounds=3, guard=1.3)
            if r is None:
                return {"error": "probe produced no CRAWLBENCH line"}
            raw[cores].extend(r["all_runs_s"])
            sample[cores] = r
    sides = {}
    for cores in (n, n4):
        med = statistics.median(raw[cores])
        s = dict(sample[cores])
        s["elapsed_s"] = round(med, 3)
        s["urls_scheduled_per_sec"] = round(s["n_scheduled"] / med, 1)
        s["candidates_per_sec"] = round(s["n_candidates"] / med, 1)
        s["raw_runs_s"] = raw[cores]
        del s["all_runs_s"]
        sides[cores] = s
    eff = sides[n4]["candidates_per_sec"] / sides[n]["candidates_per_sec"] / 4.0
    # min-based twin: each side's FASTEST round is its least-contended
    # observation on shared hardware, so min/min is the efficiency
    # estimate with the least tenant noise in it (standard microbench
    # practice). Annotation only — the median stays the contract number.
    eff_min = min(raw[n]) / (4.0 * min(raw[n4]))
    with open("/proc/loadavg") as f:
        load = f.read().split()[:3]
    cpu = _cpu_control((n, n4, 32))
    membw = _membw_control((n, n4, 32))
    fault = _fault_gbs()
    # the same N->4N ratio for a pure-CPU workload on this VM: the
    # platform's own parallel ceiling (multi-tenant turbo/scheduler).
    # efficiency normalized by it isolates what the JOB loses to
    # coordination/shuffle from what any perfectly-parallel work loses
    # to the shared hardware. Per-worker throughput at 4 workers cannot
    # physically exceed 1-worker throughput on shared cores, so a
    # super-unity reading means the 1-worker side of the CONTROL was
    # degraded — clamp to 1.0 for normalization (raw ratio recorded).
    cpu_eff = (cpu[str(n4)] / cpu[str(n)]) / 4.0 if cpu.get(str(n)) else None
    cpu_eff_clamped = min(cpu_eff, 1.0) if cpu_eff else None
    return {
        "n_urls": CRAWL_N_URLS,
        "protocol": f"median of {SCALE_PAIRS} interleaved pairs x 3 rounds/probe",
        f"local{n}": sides[n],
        f"local{n4}": sides[n4],
        "speedup_n_to_4n": round(eff * 4.0, 3),
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_min_based": round(eff_min, 3),
        "cpu_control_mops": cpu,
        "membw_control_gbs": membw,
        "membw_parallel_efficiency_n_to_4n": (
            round((membw[str(n4)] / membw[str(n)]) / 4.0, 3)
            if membw.get(str(n)) else None
        ),
        # how the JOB's N->4N ratio compares with the platform's own
        # streaming-bandwidth N->4N ratio measured in the same window —
        # on a single shared memory bus a shuffle/sort engine cannot
        # out-scale the bus (real clusters add a bus per executor, this
        # sandbox does not); >= 1.0 means the job scales at the
        # hardware's achievable ceiling. Annotation only.
        "scaling_efficiency_vs_membw_ceiling": (
            round(eff / ((membw[str(n4)] / membw[str(n)]) / 4.0), 3)
            if membw.get(str(n)) else None
        ),
        "fault_control_gbs": fault,
        "cpu_control_parallel_efficiency": round(cpu_eff, 3) if cpu_eff else None,
        "scaling_efficiency_cpu_normalized": (
            round(min(eff / cpu_eff_clamped, 1.0), 3) if cpu_eff_clamped else None
        ),
        "loadavg_after": load,
    }


def main() -> None:
    if "--crawl-only" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        n_urls = (
            int(sys.argv[sys.argv.index("--urls") + 1])
            if "--urls" in sys.argv else CRAWL_N_URLS
        )
        rounds = (
            int(sys.argv[sys.argv.index("--rounds") + 1])
            if "--rounds" in sys.argv else 5
        )
        guard = (
            float(sys.argv[sys.argv.index("--guard") + 1])
            if "--guard" in sys.argv else 1.5
        )
        run_crawl_only(cores, n_urls, rounds, guard)
        return

    import __spark_entry__ as entry
    from cc_dbp_spark.session import get_spark, warm_python_worker_pool

    spark = get_spark("bench", cores=CPUS)
    warm_python_worker_pool(spark, CPUS)
    qs = entry.queries()
    timings: dict[str, float] = {}
    timings_norm: dict[str, float] = {}
    query_controls: dict[str, float] = {}
    query_membw: dict[str, float] = {}
    suite_fault_start = _fault_gbs()
    t_suite = time.time()
    for name in BENCH_QUERIES:
        # per-query interleaved controls (r4 verdict): ALU ~0.15 s +
        # cached-buffer copy ~0.05 s each; lets a reader separate
        # tenant CPU bursts AND memory-bus contention from regressions
        ctrl = _control_mops()
        query_membw[name] = _membw_gbs()
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        el = round(time.time() - t0, 3)
        timings[name] = el
        query_controls[name] = ctrl
        timings_norm[name] = round(el * ctrl / NOMINAL_MOPS_1CORE, 3)

    # headline crawl round in a FRESH subprocess JVM (same protocol as
    # the scaling probes: warmup + 3 timed rounds, median): the suite
    # session's heap carries GC residue from 26 queries that inflates
    # the round 1.5-2x and swamps run-to-run comparisons
    probe = _one_crawl_probe(CPUS)
    if probe is not None:
        crawl = {k: v for k, v in probe.items() if k != "all_runs_s"}
        crawl["raw_runs_s"] = probe["all_runs_s"]
    else:  # fallback: in-session measurement
        crawl = crawl_round_bench(spark, CRAWL_N_URLS)
    timings[f"crawl_round_{CRAWL_N_URLS // 1_000_000}m"] = crawl["elapsed_s"]

    # second scale point (32M): fixed-cost-clean throughput; same
    # fresh-JVM warmup+3-round-median protocol
    crawl_big = None
    if os.environ.get("SPARK_GRAFT_BENCH_BIG", "1") != "0":
        probe_big = _one_crawl_probe(CPUS, CRAWL_N_URLS_BIG)
        if probe_big is not None:
            crawl_big = {k: v for k, v in probe_big.items() if k != "all_runs_s"}
            crawl_big["raw_runs_s"] = probe_big["all_runs_s"]
            timings[f"crawl_round_{CRAWL_N_URLS_BIG // 1_000_000}m"] = (
                crawl_big["elapsed_s"]
            )
    total = round(time.time() - t_suite, 3)
    spark.stop()

    result = {
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # normalized twins: raw * (per-query 1-core control mops /
        # NOMINAL_MOPS_1CORE) — comparable across rounds on this
        # multi-tenant box; raw stays the contract number
        "queries_norm": timings_norm,
        "query_cpu_controls_mops": query_controls,
        "query_membw_controls_gbs": query_membw,
        "suite_fault_control_gbs": {
            "start": suite_fault_start,
            "end": _fault_gbs(),
        },
        "nominal_mops_1core": NOMINAL_MOPS_1CORE,
        "sf": float(pathlib.Path(SF_DIR).name.replace("sf", "") or 0.1),
        "crawl_throughput": crawl,
    }
    if crawl_big is not None:
        result["crawl_throughput_32m"] = crawl_big
    if os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0":
        result["scaling"] = run_scaling()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
