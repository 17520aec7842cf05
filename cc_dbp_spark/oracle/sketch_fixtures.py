"""Oracle-side fixtures for the sketch-based dedup/ANN families.

The DuckDB oracles for MinHash / SimHash / IVF cannot re-run Spark's
JVM kernels, so the non-SQL-expressible *prefix* of each pipeline is
recomputed here independently (pure pyarrow + numpy + the pure-Python
xxhash64 twin that is golden-tested against Spark's ``xxhash64``) and
written to a small parquet the oracle SQL reads with ``read_parquet``.
Everything *downstream* of that prefix — permutation math, banding,
bucket joins, bit votes, Hamming blocks, probe joins, cosine top-k —
is then expressed in plain SQL, so the driver's value-hash compare
checks the whole distributed pipeline against an independent
single-node recomputation.

* :func:`ensure_shingle_hashes` — (doc_id, h) exploded distinct word
  3-gram shingle hashes per document, the shared input of the MinHash
  and SimHash oracles.  Replicates ``dedup.shingles_col`` +
  ``F.xxhash64`` exactly (normalization, the n<k fallback, distinct).
* :func:`ensure_ivf_fixture` — IVF centroids (trained once here, used
  by BOTH the Spark query and the SQL oracle), plus the corpus cell
  assignment and per-query probe lists computed with the same
  deterministic per-row numpy reduction the Spark UDF uses.
"""

from __future__ import annotations

import pathlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from cc_dbp_spark.fixtures import DEFAULT_FIXTURE_DIR
from cc_dbp_spark.functions.urlnorm import xxhash64_py

# Java \s (Spark regexp_replace) is ASCII-only: [ \t\n\x0B\f\r]
_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")


def _norm_text(text: str | None) -> str | None:
    """Twin of ``dedup._norm_text``: lower(trim(regexp_replace(\\s+,' ')))."""
    if text is None:
        return None
    return _WS_RE.sub(" ", text).strip().lower()


def shingle_set(text: str | None, k: int = 3) -> list[int]:
    """Distinct word-k-gram shingle xxhash64 values for one document —
    the pure-Python twin of ``F.transform(shingles_col(text, k),
    xxhash64)``.  Spark's ``xxhash64(NULL)`` passes the seed through."""
    norm = _norm_text(text)
    if norm is None:
        return [42]  # xxhash64(NULL) == seed
    toks = norm.split(" ")
    if len(toks) >= k:
        shingles = list(dict.fromkeys(
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ))
    else:
        shingles = [norm]
    return [xxhash64_py(s.encode("utf-8")) for s in shingles]


def _sf_tag(sf_dir: str) -> str:
    return str(sf_dir).rstrip("/").rsplit("/", 1)[-1]


def ensure_shingle_hashes(sf_dir: str, k: int = 3) -> str:
    """Exploded (doc_id, h) shingle-hash parquet for the documents table
    at ``sf_dir``; cached under the default fixture dir."""
    out = DEFAULT_FIXTURE_DIR / f"shingle_hashes_{_sf_tag(sf_dir)}.parquet"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids, hs = [], []
        for did, text in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
            for h in shingle_set(text, k):
                ids.append(did)
                hs.append(h)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "h": pa.array(hs, pa.int64())}),
            out,
        )
    return str(out)


# ------------------------------------------------------------------ IVF

def ensure_ivf_fixture(
    sf_dir: str,
    n_centroids: int = 16,
    n_probe: int = 8,
    n_queries: int = 5,
    sample_size: int = 10_000,
    seed: int = 3,
) -> dict[str, str]:
    """Centroids + corpus cell assignment + query probe lists for the
    embeddings table at ``sf_dir``.  The centroids are THE centroids:
    the Spark query loads them from this parquet too, so training
    happens exactly once (on the first ``sample_size`` rows in file
    order — at 100 TB you train on a bounded sample regardless)."""
    from cc_dbp_spark.operators.similarity import assign_cells, train_centroids

    tag = f"{_sf_tag(sf_dir)}_{n_centroids}c{n_probe}p"
    paths = {
        name: DEFAULT_FIXTURE_DIR / f"ivf_{name}_{tag}.parquet"
        for name in ("centroids", "assign", "probes")
    }
    if not all(p.exists() for p in paths.values()):
        paths["centroids"].parent.mkdir(parents=True, exist_ok=True)
        tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        vec_ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
        cent = train_centroids(vecs[:sample_size], n_centroids, seed=seed).astype(np.float64)
        cells, _ = assign_cells(vecs, cent, n_probe)
        qmask = vec_ids < n_queries
        _, probes = assign_cells(vecs[qmask], cent, n_probe)
        pq.write_table(
            pa.table({
                "cid": pa.array(range(len(cent)), pa.int32()),
                "vec": pa.array([list(map(float, c)) for c in cent],
                                pa.list_(pa.float64())),
            }),
            paths["centroids"],
        )
        pq.write_table(
            pa.table({"vec_id": pa.array(vec_ids), "cell": pa.array(cells, pa.int32())}),
            paths["assign"],
        )
        q_ids, q_cells = [], []
        for qid, row in zip(vec_ids[qmask], probes):
            for c in row:
                q_ids.append(int(qid))
                q_cells.append(int(c))
        pq.write_table(
            pa.table({
                "query_id": pa.array(q_ids, pa.int64()),
                "cell": pa.array(q_cells, pa.int32()),
            }),
            paths["probes"],
        )
    return {k: str(v) for k, v in paths.items()}


def ensure_crawl_ties(fixture_dir) -> str:
    """(url, tie) parquet for every canonical url the multi-round crawl
    can ever schedule (seeds ∪ document outlinks), from the pure-Python
    twins (urlnorm.canonicalize_py + the D1 draw — both golden-tested
    against the Spark kernels). The tie draw is sha1-based and DuckDB
    has no sha1, so the multiround oracle reads this fixture and
    recomputes everything else in SQL."""
    import pathlib as _pl

    from cc_dbp_spark.functions.parity import pseudo_random_from_string
    from cc_dbp_spark.functions.urlnorm import canonicalize_py

    fd = _pl.Path(fixture_dir)
    out = fd / "crawl_ties.parquet"
    if not out.exists():
        urls = set()
        seeds = pq.read_table(fd / "seeds.parquet", columns=["url"])
        urls.update(seeds.column("url").to_pylist())
        docs = pq.read_table(fd / "documents_spans.parquet", columns=["spans"])
        for spans in docs.column("spans").to_pylist():
            for s in spans or []:
                if s.get("kind") == "link" and s.get("media_ref"):
                    urls.add(s["media_ref"])
        canon = sorted({canonicalize_py(u) for u in urls})
        ties = pseudo_random_from_string(canon)
        pq.write_table(
            pa.table({"url": canon, "tie": ties}), out
        )
    return str(out)
