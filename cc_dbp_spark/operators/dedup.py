"""Deduplication operators for web-scale corpora over a
``documents(doc_id, text, ...)`` table.

Exact dedup is a hash groupBy (Catalyst partial-agg, shuffle on the
digest — uniform keys, no skew). Near-dup families (MinHash+LSH,
SimHash, n-gram Jaccard) follow the standard shingle->sketch->band->
bucket-join construction; all sketch math is numpy inside Arrow UDFs,
all joins/groupBys are DataFrame ops so they scale by partitioning.

Reference analogue: per-group dedup by uniqueness string
(``RelexTsvDataset.java:229-249``, dedupe before grouping per SURVEY
A4 note) — generalized here to whole-document content identity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_text(text):
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of exact duplicates (after whitespace/case normalization).

    Returns (fp, n_dups, keeper, dup_ids): one row per content with >1
    copy; keeper = min id (first occurrence wins, like the seen set).
    """
    fp = F.md5(_norm_text(F.col(text_col)))
    return (
        docs.select(F.col(id_col), fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keeper"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per normalized content (min id wins). Window-based so
    all original columns survive."""
    fp = F.md5(_norm_text(F.col(text_col)))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("__fp", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def _spread(docs: DataFrame) -> DataFrame:
    """Round-robin the input across the cluster when it arrives in fewer
    partitions than cores (a single small parquet file reads as ONE
    partition, serializing the shingle explode). No-op at scale, where
    the scan already yields >= defaultParallelism splits."""
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        return docs.repartition(sc.defaultParallelism)
    return docs


def shingles_col(text, k: int = 3):
    """Word k-gram shingles (array<string>) of normalized text."""
    toks = F.split(_norm_text(text), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n >= k,
        F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))),
    ).otherwise(F.array(_norm_text(text)))


# ------------------------------------------------------------------ MinHash

def _minhash_params(num_hashes: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    seed: int = 1,
) -> DataFrame:
    """(id, sig array<bigint>): MinHash signature over word-k-gram shingles.

    Shingle hashing is Spark xxhash64 (JVM); the num_hashes permutations
    ((a*x+b) mod p, min per row) are one numpy matrix op per Arrow batch.
    """
    a, b = _minhash_params(num_hashes, seed)
    p = np.uint64((1 << 61) - 1)

    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def mh(hashes: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for arr in hashes:
                if arr is None or len(arr) == 0:
                    out.append(np.zeros(num_hashes, dtype=np.int64))
                    continue
                x = np.asarray(arr, dtype=np.int64).view(np.uint64)[:, None]
                vals = (x * a[None, :] + b[None, :]) % p
                out.append(vals.min(axis=0).view(np.int64))
        return pd.Series(out)

    sh = shingles_col(F.col(text_col), k)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))
    return _spread(docs).select(F.col(id_col), mh(hashed).alias("sig"))


def _capped_bucket_pairs(
    b: DataFrame,
    keys: list[str],
    id_col: str,
    max_bucket: int | None,
    payload: str | None = None,
) -> DataFrame:
    """Self-join (id, *keys) rows within each bucket, id_a < id_b — with a
    skew guard: buckets holding more than ``max_bucket`` members are NOT
    self-joined (that clique is quadratic in the degenerate case —
    boilerplate-identical shards, empty docs). Instead each oversized
    bucket emits a star: every member pairs with the bucket's min-id
    representative, O(n) rows. Downstream exact verifiers (est_jaccard /
    hamming / shingle Jaccard) still score every emitted pair.

    Approximation under the cap (deliberate, like every production LSH
    cap): the star preserves the component in the CANDIDATE graph, but a
    member-member pair that is similar to each other yet dissimilar to
    the representative can fail the downstream verify threshold and drop
    out of the VERIFIED pair set. In the degenerate buckets the cap
    targets (near-identical content) members are mutually similar to the
    rep, so the loss is empty there; set ``max_bucket=None`` for exact
    (quadratic) behavior. Reference pattern: the gsplits hot-key split
    (RelexTsvDataset.java:100-118)."""
    from pyspark.sql.window import Window

    if max_bucket is None:
        small, big = b, None
    else:
        w = Window.partitionBy(*keys)
        b = b.withColumn("__sz", F.count("*").over(w))
        small = b.filter(F.col("__sz") <= max_bucket).drop("__sz")
        big = b.filter(F.col("__sz") > max_bucket).drop("__sz")

    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    cond = cond & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    out_cols = [
        F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
    ]
    if payload is not None:
        out_cols += [
            F.col(f"l.{payload}").alias(f"{payload}_a"),
            F.col(f"r.{payload}").alias(f"{payload}_b"),
        ]
    pairs = small.alias("l").join(small.alias("r"), cond).select(*out_cols)
    if big is not None:
        # runtime observability for the silent-recall caveat above: star
        # diversion is auditable via :func:`oversized_buckets` on the
        # same (keys, max_bucket); plan_audit checks it on the bench
        # corpus so a hot-but-heterogeneous bucket can't divert unseen.
        pcols = [id_col] + ([payload] if payload is not None else [])
        rep = big.groupBy(*keys).agg(
            F.min(F.struct(*pcols)).alias("__rep")  # min by id (ids distinct)
        )
        star_cols = [
            F.col("__rep")[id_col].alias("id_a"), F.col(id_col).alias("id_b")
        ]
        if payload is not None:
            star_cols += [
                F.col("__rep")[payload].alias(f"{payload}_a"),
                F.col(payload).alias(f"{payload}_b"),
            ]
        star = (
            big.join(rep, keys)
            .filter(F.col(id_col) != F.col("__rep")[id_col])
            .select(*star_cols)
        )
        pairs = pairs.unionByName(star)
    return pairs


def oversized_buckets(
    b: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """Buckets that :func:`_capped_bucket_pairs` diverts to the O(n) star
    path — the runtime signal for the cap's recall caveat (a
    hot-but-HETEROGENEOUS bucket loses member-member pairs silently
    otherwise). Returns (keys..., n_members) for every bucket over the
    cap; run it on the candidate-bucket table (the minhash banding, the
    simhash block columns, the hyperplane buckets) whenever recall
    matters, and alert when it is non-empty. plan_audit runs it on the
    bench corpus in CI."""
    return (
        b.groupBy(*keys)
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") > max_bucket)
    )


def minhash_band_buckets(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """(id, band, bucket) rows: the LSH banding projection — ONE shared
    construction for the candidate join and the plan-audit bucket-size
    invariant, so the checked cap can never drift from the engine."""
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[i].cast("string")
                                for i in range(bi * rows_per_band, (bi + 1) * rows_per_band)
                            ],
                        )
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int | None = 1024,
) -> DataFrame:
    """LSH banding: pairs sharing >=1 band bucket. Returns (id_a, id_b,
    n_shared_bands). Classic band->bucket->self-join; the join key is
    (band, hash-of-rows) so co-bucketed docs collide in the shuffle.
    Buckets over ``max_bucket`` members are star-linked instead of
    self-joined (skew guard — see :func:`_capped_bucket_pairs`)."""
    assert bands * rows_per_band <= 1024
    # the signature UDF would otherwise re-run once per self-join branch
    sigs = sigs.localCheckpoint(eager=True)
    b = minhash_band_buckets(sigs, id_col, bands, rows_per_band)
    return (
        _capped_bucket_pairs(b, ["band", "bucket"], id_col, max_bucket)
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def minhash_similarity(
    pairs: DataFrame,
    sigs: DataFrame,
    id_col: str = "doc_id",
    broadcast: bool | None = None,
) -> DataFrame:
    """Estimated Jaccard = fraction of equal signature slots per pair.

    ``broadcast``: True hints both signature lookup joins broadcast
    (right when sigs is small — ~0.5KB/doc, fine up to ~10^5 docs);
    False/None leaves the strategy to Catalyst/AQE. The caller decides —
    embedding a ``sigs.count()`` action here would re-run the signature
    UDF pass for callers that did not materialize ``sigs``. NOTE: the
    round-2 default auto-broadcast (count <= 100k) was removed, so
    callers on the default now get whatever AQE picks — on small
    materialized inputs that can be a shuffle join; pass broadcast=True
    there (the driver queries do)."""
    s1 = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    s2 = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    if broadcast:
        s1, s2 = F.broadcast(s1), F.broadcast(s2)
    j = pairs.join(s1, "id_a").join(s2, "id_b")
    eq = F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int"))
    return j.withColumn(
        "est_jaccard", F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / F.size("sig_a")
    ).select("id_a", "id_b", "n_shared_bands", "est_jaccard")


# ------------------------------------------------------------------ SimHash

def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, simhash bigint): 64-bit SimHash over shingle xxhash64 values —
    majority vote per bit, numpy-vectorized per Arrow batch."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def sh(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        bit_idx = np.arange(64, dtype=np.uint64)
        for i, arr in enumerate(hashes):
            if arr is None or len(arr) == 0:
                continue
            x = np.asarray(arr, dtype=np.int64).view(np.uint64)
            bits = (x[:, None] >> bit_idx[None, :]) & np.uint64(1)
            votes = bits.sum(axis=0) * 2 >= len(x)
            val = np.uint64(0)
            for bi in np.where(votes)[0]:
                val |= np.uint64(1) << np.uint64(bi)
            out[i] = np.int64(val.astype(np.int64))
        return pd.Series(out)

    shingled = F.transform(shingles_col(F.col(text_col), k), lambda s: F.xxhash64(s))
    return _spread(docs).select(F.col(id_col), sh(shingled).alias("simhash"))


def simhash_near_dups(
    sim: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int | None = 1024,
) -> DataFrame:
    """Near-dup pairs by Hamming distance <= max_hamming, via the
    block-rotation trick: split 64 bits into (max_hamming+1) blocks; any
    pair within distance shares >=1 exact block -> equi-join per block,
    then exact popcount filter. No cartesian product. Block-value groups
    over ``max_bucket`` members are star-linked instead of self-joined
    (skew guard — see :func:`_capped_bucket_pairs`; under the cap, a
    degenerate group of near-identical docs links through its min-id
    representative rather than emitting the quadratic clique)."""
    nblocks = max_hamming + 1
    width = 64 // nblocks
    blocks = []
    for i in range(nblocks):
        shifted = F.shiftrightunsigned(F.col("simhash"), i * width)
        mask = (1 << width) - 1 if i < nblocks - 1 else (1 << (64 - i * width)) - 1
        blocks.append(shifted.bitwiseAND(F.lit(mask)).alias(f"b{i}"))
    # materialize once: the simhash UDF upstream would re-run for every
    # of the 2*(max_hamming+1) self-join branches below
    withb = sim.select(F.col(id_col), F.col("simhash"), *blocks).localCheckpoint(eager=True)
    pairs = None
    for i in range(nblocks):
        cand = _capped_bucket_pairs(
            withb.select(F.col(id_col), F.col("simhash"), F.col(f"b{i}")),
            [f"b{i}"], id_col, max_bucket, payload="simhash",
        ).withColumnsRenamed({"simhash_a": "h_a", "simhash_b": "h_b"})
        pairs = cand if pairs is None else pairs.unionByName(cand)
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        pairs.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    prefix_filter: bool = True,
    broadcast: bool | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs over `threshold`,
    via shingle explode + inverted-index equi-join (never a cartesian
    product) + |A∩B| / (|A|+|B|-|A∩B|).

    Scale path (`prefix_filter=True`): the candidate-generating
    self-join runs only over each document's *prefix* — its first
    ``sz - ceil(threshold*sz) + 1`` shingles under a global
    (document-frequency asc, shingle) order. Positional prefix filtering
    (Bayardo et al., "Scaling Up All Pairs"; Chaudhuri et al.) is exact:
    J(A,B) >= t implies |A∩B| >= ceil(t*|A|), so the df-smallest common
    shingle sits inside both prefixes and every qualifying pair is still
    generated. Hot boilerplate shingles sort *last* and fall out of
    almost every prefix, defusing the skewed-quadratic join that plain
    inverted indexing hits at corpus scale; the exact intersection is
    then recomputed per *candidate pair*, so emitted jaccard values are
    identical to the unfiltered plan and the same DuckDB oracle checks
    both paths.
    """
    # 64-bit shingle hashes end-to-end: 4-5x smaller joins/shuffles than
    # raw shingle strings, and set identity is preserved up to xxhash64
    # collisions (~2^-64 per pair — the same identity assumption MinHash
    # rests on, and far below the oracle's 1e-6 value rounding).
    arr = (
        _spread(docs)
        .select(
            F.col(id_col),
            F.transform(
                shingles_col(F.col(text_col), k), lambda s: F.xxhash64(s)
            ).alias("arr"),
        )
        .localCheckpoint(eager=True)  # reused: index explode + pair verify
    )
    sh = arr.select(F.col(id_col), F.explode("arr").alias("sh"))

    if prefix_filter:
        dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
        w = Window.partitionBy(id_col).orderBy("df", "sh")
        wc = Window.partitionBy(id_col)  # same shuffle as w, adds sz
        pref = (
            sh.join(dfreq, "sh")  # equi-join; hot key fan-out is 1:df, never quadratic
            .withColumn("rn", F.row_number().over(w))
            .withColumn("sz", F.count("*").over(wc))
            .filter(F.col("rn") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1)
            .select(id_col, "sh")
        )
        pl, pr = pref.alias("l"), pref.alias("r")
        cand = (
            pl.join(pr, (F.col("l.sh") == F.col("r.sh")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        l, r = sh.alias("l"), sh.alias("r")
        cand = (
            l.join(r, (F.col("l.sh") == F.col("r.sh")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    # exact verify per candidate pair with native array_intersect over
    # the hashed shingle sets. When the doc-side array table fits in a
    # broadcast (hashed arrays are ~2KB/doc), both verify joins are
    # shuffle-free broadcast hash joins over the candidate rows; at
    # corpus scales beyond that, AQE picks the shuffle join and the
    # candidate set is sparse anyway (real shingle dfs are Zipfian, so
    # the prefix index prunes hard).
    aa = arr.select(F.col(id_col).alias("id_a"), F.col("arr").alias("arr_a"))
    ab = arr.select(F.col(id_col).alias("id_b"), F.col("arr").alias("arr_b"))
    if broadcast is None:
        # arr IS checkpointed above, so the count is one cheap job; an
        # explicit broadcast=True/False skips even that
        broadcast = arr.count() <= 100_000
    if broadcast:
        aa, ab = F.broadcast(aa), F.broadcast(ab)
    return (
        cand.join(aa, "id_a")
        .join(ab, "id_b")
        .withColumn("inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("arr_a") + F.size("arr_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------- embedding cosine near-dup

def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 5,
    max_bucket: int | None = 1024,
) -> DataFrame:
    """Near-dup pairs by embedding cosine >= threshold.

    Scale path: random-hyperplane LSH bucket (numpy matmul per Arrow
    batch) -> capped equi-join within bucket -> exact cosine confirm
    (native zip_with/aggregate). High-cosine pairs collide with high
    probability; the exact filter keeps precision 1.0.

    Buckets over ``max_bucket`` members star-link through their min-id
    representative instead of self-joining (:func:`_capped_bucket_pairs`)
    — a 100 TB crawl's boilerplate/SEO-farm pages produce exactly the
    many-near-identical-embeddings corpora that would otherwise collapse
    into few hyperplane buckets and go quadratic. Same cap discipline as
    the MinHash/SimHash families; audit with :func:`oversized_buckets`.
    """
    from pyspark.sql.types import LongType

    rng = np.random.default_rng(seed)

    def mk_bucket_udf(dim: int):
        planes = rng.standard_normal((dim, n_planes)).astype(np.float32)

        @F.pandas_udf(LongType())
        def bucket(vecs: pd.Series) -> pd.Series:
            m = np.stack(vecs.to_numpy())
            signs = (m @ planes) > 0
            powers = (1 << np.arange(n_planes, dtype=np.int64))
            return pd.Series((signs * powers).sum(axis=1).astype(np.int64))

        return bucket

    dim = len(emb.select(vec_col).first()[0])
    bucket_udf = mk_bucket_udf(dim)
    # materialize once: the bucket UDF + vector column feed the bucket-size
    # window AND both self-join sides (3 consumers otherwise re-run the UDF)
    b = emb.select(
        F.col(id_col), F.col(vec_col), bucket_udf(F.col(vec_col)).alias("bucket")
    ).localCheckpoint(eager=True)

    pairs = _capped_bucket_pairs(b, ["bucket"], id_col, max_bucket, payload=vec_col)
    va, vb = F.col(f"{vec_col}_a"), F.col(f"{vec_col}_b")
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )

    def norm(v):
        return F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
            )
        )

    return (
        pairs.withColumn("cosine", dot / (norm(va) * norm(vb)))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ------------------------------------------------ connected components

def _unpersist_local_ckpt(df: DataFrame) -> None:
    """Free the executor-storage blocks behind a ``localCheckpoint``-ed
    DataFrame. Iterative loops checkpoint a new state table every round;
    the superseded copies are only reclaimed by the ContextCleaner on a
    driver GC, so at frontier scale an explicit unpersist keeps storage
    bounded at ONE live copy instead of ``max_iter``."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # non-LogicalRDD plan / Spark Connect: bounded leak, GC reclaims


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, comp) for every id appearing in ``pairs``: comp = the min id
    of the node's connected component — the cluster step that turns
    near-dup PAIRS into dedup GROUPS (keep comp, drop the rest).

    Min-label propagation: each round every node takes the min of its
    own label and its neighbors' labels — one shuffle per round, with a
    localCheckpoint truncating the plan and one count barrier deciding
    convergence. Rounds needed = the graph diameter. Degenerate buckets
    star-link through a representative (:func:`_capped_bucket_pairs`),
    which keeps THEIR diameter O(1); threshold-filtered pair graphs can
    still chain (A~B~C where A!~C), so convergence is enforced: the
    function RAISES if the diameter exceeds ``max_iter`` rather than
    returning silently-wrong labels — raise ``max_iter`` for long
    chains, or contract with the alternating large-star/small-star of
    Kiveris et al. (O(log^2 n) rounds) for adversarial graphs.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    comp = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_ckpt = comp  # superseded label tables unpersist once replaced
    for _ in range(max_iter):
        nbr = (
            edges.join(
                comp.select(F.col("id").alias("dst"), F.col("comp").alias("dcomp")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dcomp").alias("nmin"))
        )
        new = (
            comp.join(nbr, comp["id"] == nbr["src"], "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                    "comp"
                ),
                (F.col("nmin") < F.col("comp")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.filter(F.col("__chg")).count()
        # `new` is materialized (eager + the count above), so the old
        # label table's blocks are dead — free them now, not at GC time
        _unpersist_local_ckpt(prev_ckpt)
        prev_ckpt = new
        comp = new.drop("__chg")
        if changed == 0:
            return comp
    # silent wrong labels are worse than a loud failure: an unconverged
    # exit would split true components and dedup against bad keepers
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter — raise max_iter, or use "
        "connected_components_star, whose round count is O(log^2 n) "
        "regardless of diameter)"
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, comp) via alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the diameter-independent alternative to
    :func:`connected_components`: O(log^2 n) rounds on ANY graph, so
    adversarial long chains (threshold-filtered near-dup graphs can
    chain A~B~C with A!~C) converge where min-label propagation needs
    diameter rounds.

    large-star: every node points its LARGER neighbors at the minimum
    of its closed neighborhood; small-star: every node points its
    not-larger neighbors (and itself) at that minimum. Each star
    operation is one groupBy + one join (+ a distinct); the large-star
    intermediate is materialized once per round (the small-star plan
    consumes it from several subtrees — left unmaterialized it would
    re-execute those shuffles per subtree) and superseded checkpoints
    unpersist eagerly. Convergence = the edge set is a fixed point
    (stars), checked with a fused both-direction anti-join barrier.
    Works on any orderable id type (strings use lexicographic order).
    Nodes appearing only in self-pairs label themselves, matching
    :func:`connected_components`.
    """
    all_nodes = (
        pairs.select(F.col(id_a).alias("id"))
        .unionByName(pairs.select(F.col(id_b).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_ckpt = edges

    def _star(e: DataFrame, large: bool) -> DataFrame:
        # symmetrize: neighborhood of every node under both roles
        und = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = und.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        if large:  # (v, m) for neighbors v > u
            out = und.join(m, "u").filter(F.col("v") > F.col("u")).select("v", "m")
        else:  # (v, m) for neighbors v <= u, plus (u, m) itself
            out = (
                und.join(m, "u")
                .filter(F.col("v") <= F.col("u"))
                .select("v", "m")
                .unionByName(m.select(F.col("u").alias("v"), "m"))
            )
        return (
            out.select(
                F.least(F.col("v"), F.col("m")).alias("u"),
                F.greatest(F.col("v"), F.col("m")).alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    for _ in range(max_iter):
        ls = _star(edges, large=True).localCheckpoint(eager=True)
        new = _star(ls, large=False).localCheckpoint(eager=True)
        _unpersist_local_ckpt(ls)
        # fixed point iff the edge multisets match (both are distinct
        # sets, so two anti-join counts in ONE fused barrier suffice)
        diff = (
            new.exceptAll(edges).select(F.lit(1).alias("d"))
            .unionByName(edges.exceptAll(new).select(F.lit(1).alias("d")))
            .count()
        )
        _unpersist_local_ckpt(prev_ckpt)
        prev_ckpt = new
        edges = new
        if diff == 0:
            # stars: every edge is (root, member); roots label themselves;
            # self-pair-only nodes come back as singletons
            members = edges.select(F.col("v").alias("id"), F.col("u").alias("comp"))
            roots = edges.select(F.col("u").alias("id")).distinct().withColumn(
                "comp", F.col("id")
            )
            labeled = members.unionByName(roots)
            singletons = all_nodes.join(
                labeled.select("id"), "id", "left_anti"
            ).withColumn("comp", F.col("id"))
            return labeled.unionByName(singletons)
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )
