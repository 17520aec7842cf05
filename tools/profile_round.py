"""Profile one scheduling round at a given core count, with per-job
timing breakdown. Usage: python tools/profile_round.py <cores> [n_urls]"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import synth_frontier, synth_robots  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    from pyspark.sql import functions as F
    from cc_dbp_spark.session import get_spark, warm_python_worker_pool, clear_persisted
    from cc_dbp_spark.operators import frontier

    spark = get_spark(
        f"prof-{cores}", cores=cores,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    warm_python_worker_pool(spark, cores)

    t0 = time.time()
    candidates = synth_frontier(spark, n_urls).localCheckpoint(eager=True)
    robots = synth_robots(spark).localCheckpoint(eager=True)
    print(f"[{cores}] synth+ckpt: {time.time()-t0:.2f}s", flush=True)

    docs = spark.createDataFrame(
        [], "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    cfg = frontier.CrawlConfig(
        round_budget_s=300.0, hot_host_threshold=20_000,
        hot_host_cap=10_000, use_bloom=False)

    for rep in range(3):
        n_freed = clear_persisted(spark)
        candidates = synth_frontier(spark, n_urls).localCheckpoint(eager=True)
        robots = synth_robots(spark).localCheckpoint(eager=True)
        if rep == 0:
            print(f"[{cores}] freed {n_freed} persisted RDDs", flush=True)
        state = frontier.empty_state(spark)
        state["seen_nonempty"] = False
        t1 = time.time()
        out = frontier.run_round(spark, candidates, state, robots, docs, 0, cfg)
        t2 = time.time()
        n = out["fetch_batch"].count()
        t3 = time.time()
        print(f"[{cores}] rep{rep}: plan+hotcollect={t2-t1:.2f}s "
              f"count={t3-t2:.2f}s total={t3-t1:.2f}s n={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
