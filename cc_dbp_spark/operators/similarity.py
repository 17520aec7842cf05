"""Approximate-nearest-neighbor search over an embedding column
(``embeddings(vec_id, embedding array<float>, label)``).

* :func:`brute_force_topk` — exact cosine top-k, native zip_with/
  aggregate dot product + window rank. The correctness baseline.
* :func:`ivf_topk` — IVF-style scale path: k-means-ish centroids
  (numpy, deterministic), assign each vector to its nearest centroid
  (one matmul per Arrow batch), probe only the closest `n_probe`
  centroid buckets per query. Recall measured against brute force in
  tests; the candidate set shrinks by ~n_centroids/n_probe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(v):
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query (cross join + window rank).

    Tie-break: cosine DESC, then corpus id ASC (total order).
    queries: (query_id, embedding).
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("qvec"), _norm(F.col(vec_col)).alias("qnorm")
    )
    c = emb.select(
        F.col(id_col), F.col(vec_col).alias("cvec"), _norm(F.col(vec_col)).alias("cnorm")
    )
    scored = q.crossJoin(c).withColumn(
        "cosine", _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def train_centroids(emb_pdf_vecs: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 3):
    """Deterministic mini k-means on a driver-side sample (numpy)."""
    rng = np.random.default_rng(seed)
    x = emb_pdf_vecs / np.linalg.norm(emb_pdf_vecs, axis=1, keepdims=True)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) + 1e-12)
    return cent


def assign_cells(vecs: np.ndarray, cent: np.ndarray, n_probe: int):
    """(cell, probe_cells) per row with batch-size-independent float
    math: each centroid similarity is an elementwise product + per-row
    pairwise sum (never a matmul, whose blocking varies with the batch
    shape), so the same vector scores bitwise-identically whether it
    arrives in a 10-row or a 10,000-row Arrow batch. That property lets
    a driver-side fixture precompute the exact assignment the executor
    UDF will produce — the anchor of the ann_ivf DuckDB oracle. Probe
    ties break by centroid id (stable argsort)."""
    m = vecs.astype(np.float64)
    m = m / (np.sqrt((m * m).sum(axis=1, keepdims=True)) + 1e-12)
    sims = np.empty((len(m), len(cent)), dtype=np.float64)
    for j in range(len(cent)):
        sims[:, j] = (m * cent[j][None, :]).sum(axis=1)
    order = np.argsort(-sims, axis=1, kind="stable")
    return order[:, 0].astype(np.int32), order[:, :n_probe].astype(np.int32)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    sample_size: int = 10_000,
    seed: int = 3,
    centroids: np.ndarray | None = None,
    max_cell: int | None | str = "auto",
) -> DataFrame:
    """IVF ANN: bucket-by-centroid, probe n_probe buckets per query.

    Centroids train on a bounded driver sample (at 100 TB you train on a
    sample regardless) unless passed in precomputed; assignment is a
    numpy reduction per Arrow batch (see :func:`assign_cells`); the
    probe join is an equi-join on centroid id — no cross join of the
    full corpus.

    ``max_cell`` is the cell-skew remedy (plan_audit check 9's residual
    risk): a cell holding more than ``max_cell`` vectors — a boilerplate
    embedding cluster at crawl scale — is hash-split into
    ceil(count/max_cell) sub-cells and the probe join runs on
    (cell, sub), with each probing query exploded across that cell's
    sub-cells. The candidate set (and therefore the top-k result) is
    IDENTICAL to the unsplit plan; only the join partition sizes are
    bounded. The sub-count table is one row per centroid — always a
    broadcast. Default ``"auto"`` = ``ceil(4*n/k)`` (plan_audit check
    9's bound, derived from the same per-cell count barrier, no extra
    job) so the remedy is on at deployment without opting in; pass an
    int to pin the cap or ``None`` to skip the count barrier on corpora
    known to be balanced.
    """
    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
    else:
        sample = np.stack(
            [r[0] for r in emb.select(vec_col).limit(sample_size).collect()]
        ).astype(np.float64)
        cent = train_centroids(sample, n_centroids, seed=seed).astype(np.float64)

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(IntegerType())
    def assign1(vecs: pd.Series) -> pd.Series:
        cells, _ = assign_cells(np.stack(vecs.to_numpy()), cent, n_probe)
        return pd.Series(cells)

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign_probe(vecs: pd.Series) -> pd.Series:
        _, probes = assign_cells(np.stack(vecs.to_numpy()), cent, n_probe)
        return pd.Series(list(probes))

    c = emb.select(
        F.col(id_col),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
        assign1(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
        F.explode(assign_probe(F.col(vec_col))).alias("cell"),
    )
    join_keys = ["cell"]
    if max_cell is not None:
        # one count barrier over the assignment — genuinely cells only:
        # checkpointing the full (id, cvec, cnorm, cell) projection would
        # store a second complete copy of the embeddings in executor
        # memory, the one thing the (now default) path must never cost at
        # the 10^7+ regime. Column pruning drops the vectors from this
        # checkpoint; the price is that the candidate join re-evaluates
        # the emb lineage (scan + norm + assignment) once more. If emb is
        # itself EXPENSIVE to produce (an embedding UDF over text, a
        # multi-join), persist/checkpoint it before calling — this
        # operator deliberately does not cache the corpus for you.
        # The n_subs table is <= n_centroids rows — always broadcast.
        counts = (
            c.select("cell")
            .localCheckpoint(eager=True)
            .groupBy("cell")
            .agg(F.count("*").alias("cnt"))
        )
        if max_cell == "auto":
            # cap = ceil(4*n/k): n from a window sum over the tiny
            # per-cell count table (<= n_centroids rows), no second job
            total = Window.partitionBy()
            cap = F.ceil(4 * F.sum("cnt").over(total) / n_centroids)
        else:
            cap = F.lit(int(max_cell))
        sizes = counts.select(
            "cell", F.ceil(F.col("cnt") / cap).cast("int").alias("n_subs")
        )
        # LEFT join + n_subs default 1: the counts above are a snapshot
        # of one evaluation of the emb lineage, and the joins below
        # re-evaluate it — under a NONDETERMINISTIC emb source (unseeded
        # sample(), unordered limit()) a vector can land in a cell the
        # snapshot never saw. An inner join would silently drop it (and
        # queries probing that cell); defaulting the missing cell to one
        # sub keeps both sides consistent (candidate sub = pmod(h,1) = 0,
        # query probes exactly sub 0), so drift degrades to an unsplit
        # cell instead of a missing neighbor. Deterministic sources hit
        # every cell in sizes and behave identically to the inner join.
        nsubs = F.coalesce(F.col("n_subs"), F.lit(1))
        c = c.join(F.broadcast(sizes), "cell", "left").withColumn(
            "sub",
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), nsubs).cast("int"),
        ).drop("n_subs")
        q = q.join(F.broadcast(sizes), "cell", "left").withColumn(
            "sub", F.explode(F.sequence(F.lit(0).cast("int"), nsubs - 1))
        ).drop("n_subs")
        join_keys = ["cell", "sub"]
    scored = q.join(c, join_keys).withColumn(
        "cosine", _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
