"""Local mimic of the driver's correctness gate: run every
__spark_entry__ query at a given sf dir, run its DuckDB oracle on the
same parquet tables, compare row count + column set + order-insensitive
value multiset. Usage: python tools/check_entry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from cc_dbp_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def multiset(rows, cols_order):
    out = []
    for r in rows:
        d = dict(zip(cols_order, r))
        out.append("|".join(norm_val(d[c]) for c in sorted(cols_order)))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # the oracle SQL embeds precomputed-fixture parquet paths (lc draws,
    # shingle hashes, IVF assignments) resolved via _oracle_sf() at
    # oracle_sql() call time; point them at the SAME sf as the views or
    # a non-default sf compares fresh Spark results against the default
    # scale's fixtures (an explicit caller-set env var still wins)
    import os

    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    spark = get_spark("check-entry")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(rows)} rows, {el:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        msgs = []
        if sorted(cols) != sorted(ocols):
            msgs.append(f"schema {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            msgs.append(f"count {len(rows)} vs {len(orows)}")
        if not msgs:
            ms, oms = multiset(rows, cols), multiset(orows, ocols)
            if ms != oms:
                diff = [(a, b) for a, b in zip(ms, oms) if a != b][:3]
                msgs.append(f"values differ, e.g. {diff}")
        if msgs:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(msgs)}")
        else:
            print(f"ok    {name}: {len(rows)} rows match oracle ({el:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
