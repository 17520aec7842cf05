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
) -> DataFrame:
    """IVF ANN: bucket-by-centroid, probe n_probe buckets per query.

    Centroids train on a bounded driver sample (at 100 TB you train on a
    sample regardless); assignment is one numpy matmul per Arrow batch;
    the probe join is an equi-join on centroid id — no cross join of the
    full corpus.
    """
    sample = np.stack(
        [r[0] for r in emb.select(vec_col).limit(sample_size).collect()]
    ).astype(np.float32)
    cent = train_centroids(sample, n_centroids, seed=seed).astype(np.float32)

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(IntegerType())
    def assign1(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float32)
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        return pd.Series((m @ cent.T).argmax(axis=1).astype(np.int32))

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign_probe(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float32)
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        sims = m @ cent.T
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

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
    scored = q.join(c, "cell").withColumn(
        "cosine", _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
