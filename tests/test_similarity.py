"""ANN tests: brute-force exactness vs numpy, IVF recall vs brute force."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cc_dbp_spark.operators import similarity as sim


def _emb_df(spark, n=200, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, m[i].tolist()) for i in range(n)], "vec_id int, embedding array<float>"
    )
    return df, m


def test_brute_force_matches_numpy(spark):
    emb, m = _emb_df(spark)
    queries = spark.createDataFrame(
        [(i, m[i].tolist()) for i in range(5)], "query_id int, embedding array<float>"
    )
    got = sim.brute_force_topk(emb, queries, k=10).collect()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in range(5):
        cos = mn @ mn[qid]
        order = np.lexsort((np.arange(len(cos)), -cos))[:10]
        want = list(order)
        rows = sorted([r for r in got if r.query_id == qid], key=lambda r: r.rank)
        assert [r.vec_id for r in rows] == want
        # self is rank 1 with cosine ~1
        assert rows[0].vec_id == qid and abs(rows[0].cosine - 1.0) < 1e-5


def test_ivf_recall(spark):
    emb, m = _emb_df(spark, n=400)
    queries = spark.createDataFrame(
        [(i, m[i].tolist()) for i in range(20)], "query_id int, embedding array<float>"
    )
    bf = sim.brute_force_topk(emb, queries, k=10)
    ivf = sim.ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=4)
    bf_sets = {}
    for r in bf.collect():
        bf_sets.setdefault(r.query_id, set()).add(r.vec_id)
    ivf_sets = {}
    for r in ivf.collect():
        ivf_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(bf_sets[q] & ivf_sets.get(q, set())) / 10 for q in bf_sets]
    assert np.mean(recalls) >= 0.7, np.mean(recalls)
    # every IVF result must be a genuine corpus vector with correct cosine
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for r in ivf.collect():
        want = float(mn[r.query_id] @ mn[r.vec_id])
        assert abs(r.cosine - want) < 1e-5


def test_audio_and_video_features(spark):
    from cc_dbp_spark.operators import multimodal as MM

    media = MM.synth_media_table(
        spark, [f"http://m/{i}" for i in range(6)], kind="audio"
    )
    af = {r.media_ref: r for r in MM.extract_audio_features(media).collect()}
    assert all(r.ok for r in af.values())
    assert all(r.n_samples > 0 and 0 < r.rms < 1 for r in af.values())
    # deterministic: same payload -> same features
    af2 = {r.media_ref: r for r in MM.extract_audio_features(media).collect()}
    assert {k: v.rms for k, v in af.items()} == {k: v.rms for k, v in af2.items()}

    vids = MM.synth_media_table(spark, ["http://m/v0"], kind="video")
    vf = MM.video_frame_features(vids, every_ms=1000).collect()
    # duration 1000 + d[3]*20 ms -> at least 2 sampled frames
    assert len(vf) >= 2
    assert all(r.ok and r.media_ref.startswith("http://m/v0#t=") for r in vf)
