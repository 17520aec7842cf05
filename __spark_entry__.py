"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()[name]`` is a (spark, sf_dir) -> DataFrame callable
implementing one operator family from SURVEY.md §2 over the driver's
parquet tables; ``oracle_sql()[name]`` is the DuckDB-equivalent ANSI SQL
for every SQL-expressible one (the rest get the weaker rows-only check
and are covered by the pytest differential oracles instead).

Column-name + value parity rules used throughout:
* every computed column is aliased identically in Spark and SQL;
* doubles that depend on summation order are ``round``-ed on BOTH sides;
* embeddings are cast to double BEFORE any arithmetic on both sides so
  the float->double promotion point is identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cc_dbp_spark import fixtures
from cc_dbp_spark.functions import textstats as ts
from cc_dbp_spark.functions.urlnorm import host_col, with_canonical
from cc_dbp_spark.operators import (
    dedup,
    frontier,
    gazetteer,
    kb,
    mentions,
    multimodal,
    similarity,
    spans,
)
from cc_dbp_spark.operators import html as htmlops
from cc_dbp_spark.sources import serde

TAXONOMY_CLOSURE = [
    ("rel:pipes", "rel:related"),
    ("rel:feeds", "rel:related"),
    ("rel:feeds", "rel:dataflow"),
]

# deterministic gazetteer + ground truth over the testdata vocabulary
# (reference shape: BuildGazetteer entries + GroundTruth triples)
GAZ_WORDS = ["filter", "hash", "join", "merge", "scan", "sort", "spark", "stream", "vector", "window"]
GAZ_PHRASES = [("hash", "join"), ("merge", "sort"), ("table", "scan")]
GAZ_ENTRIES = [(f"ent:{w}", (w,), False) for w in GAZ_WORDS] + [
    (f"ent:{a}_{b}", (a, b), False) for a, b in GAZ_PHRASES
]
GT_TRIPLES = [
    ("ent:hash", "rel:pipes", "ent:join"),
    ("ent:merge", "rel:pipes", "ent:sort"),
    ("ent:sort", "rel:prec", "ent:merge"),
    ("ent:scan", "rel:feeds", "ent:filter"),
    ("ent:stream", "rel:feeds", "ent:window"),
]

# deterministic entity-type table for J2/P10: round-robin coarse types,
# ent:hash carries TWO types (multiType path), ent:window has none (unk)
TYPE_ROWS = [
    (f"ent:{w}", ["person", "place", "thing"][i % 3])
    for i, w in enumerate(GAZ_WORDS)
    if w != "window"
] + [("ent:hash", "person")]  # second distinct type -> multiType
ALLOWED_TYPE_PAIRS = [
    ("person", "person"), ("person", "thing"), ("place", "thing"),
    ("multiType", "person"), ("thing", "unk"),
]

# ---------------------------------------------------------------- helpers


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# Deterministic raw-URL synthesis shared (in spirit) by the Spark and the
# DuckDB side: every canonicalizer rule is exercised by doc_id % 6.
def _raw_url_col() -> F.Column:
    d = F.col("doc_id").cast("string")
    s = F.col("source")
    return (
        F.when(F.col("doc_id") % 6 == 0,
               F.concat(F.lit("HTTP://"), F.upper(s), F.lit(".EX.COM/p/"), d, F.lit("#frag")))
        .when(F.col("doc_id") % 6 == 1,
              F.concat(F.lit("http://"), s, F.lit(".ex.com:80/p//"), d, F.lit("/")))
        .when(F.col("doc_id") % 6 == 2, F.concat(s, F.lit(".ex.com/p/"), d))
        .when(F.col("doc_id") % 6 == 3,
              F.concat(F.lit("  https://"), s, F.lit(".ex.com:443/p/"), d, F.lit("  ")))
        .when(F.col("doc_id") % 6 == 4,
              F.concat(F.lit("https://"), s, F.lit(".ex.com:8443/p/"), d, F.lit("?q=1&x=2")))
        .otherwise(F.concat(F.lit("http://"), s, F.lit(".ex.com")))
    )


_RAW_URL_SQL = """
    CASE doc_id % 6
      WHEN 0 THEN 'HTTP://' || upper(source) || '.EX.COM/p/' || doc_id || '#frag'
      WHEN 1 THEN 'http://' || source || '.ex.com:80/p//' || doc_id || '/'
      WHEN 2 THEN source || '.ex.com/p/' || doc_id
      WHEN 3 THEN '  https://' || source || '.ex.com:443/p/' || doc_id || '  '
      WHEN 4 THEN 'https://' || source || '.ex.com:8443/p/' || doc_id || '?q=1&x=2'
      ELSE 'http://' || source || '.ex.com'
    END
"""

# DuckDB transliteration of cc_dbp_spark.functions.urlnorm.canonicalize_col
# (same rule order; DuckDB regexp_replace needs the explicit 'g' flag where
# Spark's is global by default).
_CANON_SQL = """
  {lead}u0 AS (SELECT {key_cols},
                regexp_replace(
                  trim({raw}, ' ' || chr(9) || chr(10) || chr(13) ||
                              chr(11) || chr(12)),
                  '#.*$', '') AS u
              FROM {src}),
  u1 AS (SELECT {key_cols},
                CASE WHEN regexp_matches(u, '^[A-Za-z][A-Za-z0-9+.\\-]*://')
                     THEN u ELSE 'http://' || u END AS u FROM u0),
  parts AS (
    SELECT {key_cols},
           lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
           regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest
    FROM u1),
  hp AS (
    SELECT {key_cols}, scheme,
           regexp_extract(rest, '^([^/?]*)', 1) AS hostport,
           regexp_replace(rest, '^[^/?]*', '') AS pathq
    FROM parts),
  hpp AS (
    SELECT {key_cols}, scheme, pathq,
           lower(regexp_replace(hostport, ':[0-9]+$', '')) AS host,
           regexp_extract(hostport, ':([0-9]+)$', 1) AS port
    FROM hp),
  pq AS (
    SELECT {key_cols}, scheme, host, port,
           (port <> '' AND NOT (scheme = 'http' AND port = '80')
                       AND NOT (scheme = 'https' AND port = '443')) AS keep_port,
           regexp_extract(pathq, '^([^?]*)', 1) AS path0,
           contains(pathq, '?') AS has_q,
           regexp_replace(pathq, '^[^?]*\\?', '') AS query
    FROM hpp),
  pp AS (
    SELECT {key_cols}, scheme, host, port, keep_port, has_q, query,
           regexp_replace(CASE WHEN path0 = '' THEN '/' ELSE path0 END,
                          '//+', '/', 'g') AS path1
    FROM pq),
  canon AS (
    SELECT {key_cols},
           scheme || '://' || host ||
           CASE WHEN keep_port THEN ':' || port ELSE '' END ||
           CASE WHEN length(path1) > 1 AND path1 LIKE '%/'
                THEN path1[1:length(path1)-1] ELSE path1 END ||
           CASE WHEN has_q THEN '?' || query ELSE '' END AS url,
           host ||
           CASE WHEN keep_port THEN ':' || port ELSE '' END AS host_out
    FROM pp)
"""


def _canon_cte(
    raw_expr: str,
    key_cols: str = "doc_id",
    src: str = "documents",
    lead: str = "WITH ",
) -> str:
    """lead='' lets callers embed the canon chain after their own CTEs."""
    return _CANON_SQL.format(raw=raw_expr, key_cols=key_cols, src=src, lead=lead)


_STOP_SQL = {
    lang: "(" + ", ".join(f"'{w}'" for w in ts.STOPWORDS[lang]) + ")"
    for lang in sorted(ts.STOPWORDS)
}

_TOKS_SQL = "string_split_regex(trim(text), '\\s+')"
_NORM_TOKS_SQL = "string_split_regex(lower(trim(text)), '\\s+')"


def _stop_hits_sql(lang: str, toks: str = _NORM_TOKS_SQL) -> str:
    return f"len(list_filter({toks}, x -> x IN {_STOP_SQL[lang]}))"


# ---------------------------------------------------------------- queries


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 global reduce: corpus statistics (CorpusStatistics.java:39-79)."""
    d = _docs(spark, sf_dir)
    return d.agg(
        F.count("*").alias("n_docs"),
        F.sum(ts.token_count(F.col("text"))).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
    )


def _is_parseint_col(col):
    """Lang.isInteger = exact Integer.parseInt acceptance — the shared
    parity-critical definition (kb.filter_gazetteer_labels, the vocab
    twins, and the tensor OOV fallback all use the same one; semantics
    and documented divergences live on the helper)."""
    from cc_dbp_spark.functions.parity import is_parseint_col

    return is_parseint_col(col)


def _vocab_tokens(d: DataFrame) -> DataFrame:
    """RelexVocab.add counting source — the shared single-pass
    implementation (`textstats.vocab_tokens`: one tokenizing scan, the
    '#'-digit twin rides a conditional array explode)."""
    return ts.vocab_tokens(d)


def q_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 reduceByKey word counts + P6 min-count (GatherRelexVocab.java:131-200;
    counting spec = RelexVocab.add incl. the digit-sequence twin rows)."""
    d = _docs(spark, sf_dir)
    return (
        _vocab_tokens(d)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


def q_vocab_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 threshold-ladder histogram (GatherRelexVocab.java:141-191;
    counts per RelexVocab.add incl. digit-sequence twins)."""
    d = _docs(spark, sf_dir)
    counts = _vocab_tokens(d).groupBy("word").agg(F.count("*").alias("cnt"))
    ladder = [2, 3, 5, 8, 12, 18, 27, 41, 62, 93]
    bucket = F.lit(0)
    for t in ladder:
        bucket = F.when(F.col("cnt") >= t, F.lit(t)).otherwise(bucket)
    return (
        counts.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_words"))
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        ts.token_count(F.col("text")).alias("n_tokens"),
        ts.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.round(ts.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(ts.quality_score(F.col("text")), 6).alias("quality"),
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select("doc_id", ts.lang_id(F.col("text")).alias("lang_pred"))


def q_langid_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5/P7 trigram naive-Bayes language posterior with the reference's
    P(lang) >= 0.8 keep threshold (LanguageScorer.java:41-76 shape,
    SaveCommonCrawlBase.java:156-158). The profiles are a broadcast-side
    constant baked from embedded seed text; scoring is one numpy matrix
    op per Arrow batch. Oracle: the same kernel run driver-side into a
    fixture parquet (the judged pattern for non-SQL kernels)."""
    d = _docs(spark, sf_dir)
    lp = ts.lang_posterior_udf()
    return d.select("doc_id", lp(F.col("text")).alias("lp")).select(
        "doc_id",
        F.col("lp.lang").alias("lang_pred"),
        F.round("lp.posterior", 6).alias("posterior"),
        (F.col("lp.posterior") >= 0.8).alias("keep"),
    )


def q_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.round(ts.stopword_ratio(F.col("text"), "en"), 6).alias("stop_ratio")
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        ts.fingerprint(F.col("text")).alias("fp"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups (hash groupBy; first-occurrence-wins keeper)."""
    d = _docs(spark, sf_dir)
    return dedup.exact_duplicates(d).select("fp", "n_dups", "keeper")


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-dedup survivors: one doc per normalized content."""
    d = _docs(spark, sf_dir)
    return dedup.dedup_exact(d).select("doc_id")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs >= 0.5 via inverted-index join."""
    d = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(d, k=3, threshold=0.5, broadcast=True)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_topk_per_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 bounded top-k per group (politeness top-k shape, NBest.java:28-70)."""
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(F.col("source").alias("host"), "doc_id", "n_chars", "rank")
    )


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 URL canonicalizer over every rule variant (ConvertDBpedia.java:161-176)."""
    d = _docs(spark, sf_dir)
    return with_canonical(d, _raw_url_col(), out="url", host="host").select(
        "doc_id", "url", "host"
    )


def q_crawl_round_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full scheduling round (canonicalize -> dedupe -> robots ->
    budget top-k) with budget sized so the scheduled SET is exactly the
    allowed deduped set — that set is the DuckDB-checkable invariant;
    the ORDER is checked against the pure-Python oracle in pytest."""
    d = _docs(spark, sf_dir)
    candidates = d.select(_raw_url_col().alias("url"), F.lit(0).alias("depth"))
    robots = spark.createDataFrame(
        [("src1.ex.com", [], ["/p"], 1.0), ("src3.ex.com", [], ["/nope"], 2.0)],
        "host string, allow_prefixes array<string>, deny_prefixes array<string>, "
        "crawl_delay_s double",
    )
    docs_spans = spark.createDataFrame(
        [],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    cfg = frontier.CrawlConfig(round_budget_s=1e9, use_bloom=False)
    state = frontier.empty_state(spark)
    state["seen_nonempty"] = False
    out = frontier.run_round(spark, candidates, state, robots, docs_spans, 0, cfg)
    return out["fetch_batch"].select("url", "host", "depth", "link_count")


def q_crawl_multiround(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multi-round crawl on the deterministic interleaved-docs
    fixtures (seed=42): frontier feedback via extracted outlinks.
    Hash-checked: the oracle is the ENTIRE 3-round crawl unrolled into
    chained DuckDB CTEs (_multiround_oracle_sql) — canonicalize, seen
    anti-join, dedupe, robots, budgets, top-k, positions, feedback —
    with the sha1 tie draw from the pure-Python-twin fixture. Ordering
    parity vs the single-threaded oracle is ALSO asserted in
    tests/test_frontier.py."""
    fd = fixtures.ensure_default(500)
    docs = spark.read.parquet(str(fd / "documents_spans.parquet"))
    seeds = spark.read.parquet(str(fd / "seeds.parquet"))
    robots = spark.read.parquet(str(fd / "robots_rules.parquet"))
    cfg = frontier.CrawlConfig(round_budget_s=10.0, max_rounds=3, use_bloom=True)
    drv = frontier.CrawlDriver(spark, robots, docs, cfg)
    out = drv.run(seeds)
    return out["schedule"].select("round", "position", "url", "host", "depth")


def q_crawl_stream_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming crawl ingest seam (streaming/ingest.py) with
    a DuckDB hash oracle: the seeds land as candidate file 0 and an
    empty candidate file 1 follows, so availableNow drains exactly two
    micro-batches = two scheduling rounds (round 1 runs purely on the
    outlinks carried from round 0 — the batch driver's feedback path).
    The oracle is the SAME unrolled multiround CTE as crawl_multiround,
    restricted to 2 rounds: stream-vs-batch parity is hash-checked by
    the driver, not just pytest."""
    import os
    import shutil
    import tempfile

    fd = fixtures.ensure_default(500)
    docs = spark.read.parquet(str(fd / "documents_spans.parquet"))
    seeds = spark.read.parquet(str(fd / "seeds.parquet"))
    robots = spark.read.parquet(str(fd / "robots_rules.parquet"))

    from cc_dbp_spark.streaming import ingest

    tmp = tempfile.mkdtemp(prefix="crawl_stream_")
    try:
        src = os.path.join(tmp, "cand")
        os.makedirs(src)
        seeds.select("url", F.col("depth").cast("int")).toPandas().to_parquet(
            os.path.join(src, "batch_0.parquet")
        )
        # zero-row candidate file: still one file -> one micro-batch, so
        # round 1 fires with only the carried outlinks
        seeds.select("url", F.col("depth").cast("int")).limit(0).toPandas().to_parquet(
            os.path.join(src, "batch_1.parquet")
        )
        os.utime(os.path.join(src, "batch_0.parquet"),
                 (1_700_000_000, 1_700_000_000))
        os.utime(os.path.join(src, "batch_1.parquet"),
                 (1_700_000_060, 1_700_000_060))

        cfg = frontier.CrawlConfig(round_budget_s=10.0, use_bloom=True)
        sc = ingest.StreamingCrawl(spark, robots, docs, cfg)
        sched = sc.run_available_now(src, os.path.join(tmp, "ckpt"))
        # schedules are already materialized inside each micro-batch
        # (advance_round_state materialize_all_state); the eager
        # checkpoint of the tiny budget-capped result makes the returned
        # DF provably independent of the temp candidate/checkpoint files
        # removed below, so repeated gate/bench invocations leave nothing
        # behind in /tmp
        return sched.select(
            "round", "position", "url", "host", "depth"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 WARC record reader end-to-end: documents grouped 16-per-file
    into deterministic fixture WARC bytes (warcinfo + request + response
    records), then exploded back through the pure-Python parser inside
    mapInPandas. The oracle recomputes the expected response-record
    table straight from the documents view, so the build->bytes->parse
    round trip (incl. the WARC-Type: response filter and HTTP header
    split, SaveCommonCrawlBase.java:127-148) is value-checked."""
    from cc_dbp_spark.sources import warc

    d = _docs(spark, sf_dir).select("doc_id", "source", "text")
    d = d.withColumn("file_id", (F.col("doc_id") / 16).cast("int"))

    def build(key, pdf):
        pdf = pdf.sort_values("doc_id")
        docs = [
            (f"http://{s}.ex.com/doc{i}", t)
            for i, s, t in zip(pdf["doc_id"], pdf["source"], pdf["text"])
        ]
        import pandas as _pd

        return _pd.DataFrame(
            [{"src": f"warc-{key[0]}", "payload": warc.synth_warc(docs)}]
        )

    files = d.groupBy("file_id").applyInPandas(build, "src string, payload binary")
    recs = warc.warc_records(files)
    return recs.select(
        "src", "record_ndx", "url", "http_status", "content_type",
        "body_len", "truncated",
    )


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt text -> per-host rules table (the politeness join
    input). Deterministic bodies synthesized per host; hash-checked
    against a DuckDB oracle that recomputes the expected agent-section
    rules table per host. Wildcard/RFC-9309 semantics additionally
    pytest-differential vs the pure parse kernel."""
    from cc_dbp_spark.operators import robots as rb

    d = _docs(spark, sf_dir).select("source").distinct()
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"
              "User-agent: ccdbp\nDisallow: /deny-"),
        F.col("source"),
        F.lit("/\nAllow: /deny-"), F.col("source"), F.lit("/ok/\nCrawl-delay: 0.5\n"),
    )
    bodies = d.select(
        F.concat(F.col("source"), F.lit(".ex.com")).alias("host"), body.alias("body")
    )
    r = rb.parse_robots(bodies, agent="ccdbp")
    return r.select(
        "host",
        F.concat_ws(",", "deny_prefixes").alias("deny"),
        F.concat_ws(",", "allow_prefixes").alias("allow"),
        "crawl_delay_s",
    )


def q_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction from interleaved spans (LinkAnnotation target
    surface): per-target-host in-link counts. Fixture-backed; the oracle
    recomputes the counts from the same spans parquet in SQL."""
    fd = fixtures.ensure_default(500)
    docs = spark.read.parquet(str(fd / "documents_spans.parquet"))
    links = (
        docs.select(F.explode("spans").alias("s"))
        .filter((F.col("s.kind") == "link") & F.col("s.media_ref").isNotNull())
        .select(F.col("s.media_ref").alias("ref"))
    )
    links = with_canonical(links, "ref", out="url", host="host").select("host")
    return links.groupBy("host").agg(F.count("*").alias("inlinks"))


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates with signature-estimated Jaccard."""
    d = _docs(spark, sf_dir)
    # materialize signatures once: LSH banding + the similarity join's two
    # sides would each re-run the signature UDF otherwise
    sigs = dedup.minhash_signatures(d, num_hashes=64).localCheckpoint(eager=True)
    cand = dedup.minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
    sim = dedup.minhash_similarity(cand, sigs, broadcast=True)
    return sim.filter(F.col("est_jaccard") >= 0.5).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: MinHash pairs -> connected components via
    iterative min-label propagation (one shuffle per round; LSH bucket
    caps bound component diameter, so rounds stay O(1) at any scale).
    comp = min doc_id of the cluster — the dedup keeper."""
    d = _docs(spark, sf_dir)
    sigs = dedup.minhash_signatures(d, num_hashes=64).localCheckpoint(eager=True)
    cand = dedup.minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
    sim = dedup.minhash_similarity(cand, sigs, broadcast=True)
    pairs = sim.filter(F.col("est_jaccard") >= 0.5)
    return dedup.connected_components(pairs).select("id", "comp")


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via the block-rotation equi-join."""
    d = _docs(spark, sf_dir)
    sim = dedup.simhash(d)
    return dedup.simhash_near_dups(sim, max_hamming=3)


def q_emb_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via hyperplane-LSH bucket + exact confirm.

    Self-checking construction: union the corpus with a positively scaled
    copy (ids +100000). Scaling preserves hyperplane signs (same bucket,
    guaranteed collision) and cosine(v, 1.0001*v) = 1, so the result is
    exactly the (i, i+100000) pair set -> SQL oracle."""
    e = _emb(spark, sf_dir).select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    scaled = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.0001).alias("embedding"),
    )
    both = e.unionByName(scaled)
    pairs = dedup.embedding_near_dups(both, threshold=0.99, n_planes=12)
    return pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def q_ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k per query (brute-force ANN baseline)."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = similarity.brute_force_topk(e, q, k=10)
    return res.select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (scale path; recall vs brute force in pytest).

    Centroids come from the oracle fixture (trained once, driver-side,
    on a bounded sample) so the DuckDB oracle can verify the cell
    assignment + probe join + cosine top-k end-to-end in SQL."""
    import numpy as np
    import pyarrow.parquet as _pq

    from cc_dbp_spark.oracle import sketch_fixtures as sx

    fx = sx.ensure_ivf_fixture(sf_dir)
    cent = np.asarray(_pq.read_table(fx["centroids"]).column("vec").to_pylist())
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = similarity.ivf_topk(e, q, k=10, n_centroids=16, n_probe=8, centroids=cent)
    return res.select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payloads -> mapInPandas decode
    (stubbed deterministic fake) -> typed feature rows."""
    d = _docs(spark, sf_dir)
    refs = d.filter(F.col("doc_id") < 64).select(
        F.concat(F.lit("http://"), "source", F.lit(".ex.com/img"),
                 F.col("doc_id").cast("string"), F.lit(".jpg")).alias("media_ref")
    )
    media = multimodal.synth_media_df(refs)
    feats = multimodal.extract_image_features(media)
    return feats.select("media_ref", "ok", "width", "height", F.size("feat").alias("feat_dim"))


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio path: stubbed decode -> waveform stats via
    mapInPandas. The driver-checked columns are the deterministic
    decode-contract ones (n_samples = f(sha256 metadata), error-row
    flag); the waveform statistics themselves (RMS/ZCR/peak) depend on
    the stub RNG and are value-checked in tests/test_pipeline.py
    instead."""
    d = _docs(spark, sf_dir)
    refs = d.filter(F.col("doc_id") < 48).select(
        F.concat(F.lit("http://"), "source", F.lit(".ex.com/a"),
                 F.col("doc_id").cast("string"), F.lit(".wav")).alias("media_ref")
    )
    media = multimodal.synth_media_df(refs, kind="audio")
    feats = multimodal.extract_audio_features(media)
    return feats.select("media_ref", "ok", "n_samples")


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal video path: deterministic frame sampling x image
    feature kernel (one row per sampled frame)."""
    d = _docs(spark, sf_dir)
    refs = d.filter(F.col("doc_id") < 16).select(
        F.concat(F.lit("http://"), "source", F.lit(".ex.com/v"),
                 F.col("doc_id").cast("string"), F.lit(".mp4")).alias("media_ref")
    )
    media = multimodal.synth_media_df(refs, kind="video")
    feats = multimodal.video_frame_features(media, every_ms=1000)
    return feats.select("media_ref", "ok", "width", "height", F.size("feat").alias("feat_dim"))


def q_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan (native expressions only)."""
    d = _docs(spark, sf_dir)
    media = d.select(
        F.concat(F.lit("http://"), F.col("source"), F.lit("/img"), F.col("doc_id")).alias("media_ref"),
        F.lit("image").alias("kind"),
        (F.col("doc_id") % 1000 + 100).cast("int").alias("width"),
        (F.col("doc_id") % 700 + 80).cast("int").alias("height"),
    )
    return multimodal.resize_plan(media, max_side=256)


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based user sessionization — batch twin of the
    applyInPandasWithState streaming operator (closed-session parity in
    test_serde_layout_streaming); lag + cumulative-sum windows, one
    shuffle on user_id."""
    from cc_dbp_spark.streaming import events as ev

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.sessionize_batch(e, gap_minutes=30).select(
        "user_id", "session_id", "session_start", "session_end",
        "n_events", "sum_value",
    )


def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped multi-metric aggregation (A9-style stats rollup)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_host_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/A1 shape: per-host URL counts after canonicalization (the
    hot-host detection input for skew salting)."""
    d = _docs(spark, sf_dir)
    return (
        with_canonical(d, _raw_url_col(), out="__url", host="host")
        .select("host")
        .groupBy("host")
        .agg(F.count("*").alias("n_urls"))
    )


def q_gazetteer_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 gazetteer dictionary matching (the reference's hot inner loop,
    GazetteerMatcher.java:109-241) over the documents table."""
    d = _docs(spark, sf_dir)
    m = gazetteer.match_documents(d, GAZ_ENTRIES)
    return m.select("doc_id", "entity_id", "char_start", "char_end")


def q_gazetteer_mentions_ruletok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 gazetteer matching over the RULE tokenizer's divergence cases
    (tokenize.py rule_tokenize_with_offsets; reference substrate
    ClearNLPTokenize -> GazetteerMatcher.java:109-241). Every document
    gets a deterministic punctuation/abbreviation-heavy template:

        Dr. {w1} said: ({w2})! don't miss the {w3}, or the hash join.

    whose rule tokenization is fixed by construction (19 tokens: the
    abbreviation keeps its period, '({w2})!' sheds its punctuation,
    "don't" splits do+n't, '{w3},' and the final 'join.' shed theirs).
    The DuckDB oracle hand-encodes THAT tokenization — token indices
    and char offsets as pure length arithmetic over the three word
    slots — so it is independent of the Python tokenizer: a regression
    to whitespace tokens loses the (w2), w3 and hash-join matches and
    shifts every token index, flipping the hash."""
    d = _docs(spark, sf_dir)
    gw = F.array(*[F.lit(w) for w in GAZ_WORDS])
    w1 = F.element_at(gw, (F.pmod(F.col("doc_id"), 10) + 1).cast("int"))
    w2 = F.element_at(gw, (F.pmod(F.col("doc_id") + 3, 10) + 1).cast("int"))
    w3 = F.element_at(gw, (F.pmod(F.col("doc_id") + 7, 10) + 1).cast("int"))
    text = F.concat(
        F.lit("Dr. "), w1, F.lit(" said: ("), w2,
        F.lit(")! don't miss the "), w3, F.lit(", or the hash join."),
    )
    docs = d.select("doc_id", text.alias("text"))
    m = gazetteer.match_documents(docs, GAZ_ENTRIES)
    return m.select(
        "doc_id", "entity_id", "tok_start", "tok_end", "char_start", "char_end"
    )


def _mention_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    # P8 exact bounds (CreateTsvDataset.java:167-170, defaults
    # RelexConfig.java:145-163): tokens in [2,100], chars in [2,400]
    sents = mentions.sentence_bounds(mentions.sentences(d))
    pairs = mentions.mention_pairs(sents, GAZ_ENTRIES)
    triples = spark.createDataFrame(GT_TRIPLES, "arg1 string, rel string, arg2 string")
    return mentions.relation_join(pairs, triples)


def q_mention_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 + M13 + J1: per-sentence entity-pair candidates with best
    non-overlapping span pair, ARGONE/ARGTWO rewrite, GT relations."""
    lab = _mention_pipeline(spark, sf_dir)
    return lab.select(
        "doc_id", "id1", "id2", "s1", "e1", "s2", "e2", "rewritten",
        "relations", "is_positive",
    )


def q_mention_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + P3 + A4 + P5: pair-group stats with min-mention-set anti-join
    and deduped set size."""
    lab = _mention_pipeline(spark, sf_dir)
    g = mentions.mention_groups(lab, min_mention_set=2)
    return g.select("id1", "id2", "set_size", "positive")


def q_mention_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/D3 + D4: deterministic negative downsampling and train/val/test
    split counts. Hash-checked: the oracle applies the same D3/D4 draws
    from the golden-vector-anchored parity kernel, inlined as VALUES
    (_pair_draw_values)."""
    lab = _mention_pipeline(spark, sf_dir)
    kept = mentions.downsample_negatives(lab, retain_prob=0.25)
    g = mentions.assign_split(mentions.mention_groups(kept, min_mention_set=1))
    return g.groupBy("split").agg(
        F.count("*").alias("n_groups"),
        F.sum(F.col("positive").cast("int")).alias("n_positive"),
    )


def q_mention_downsample_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/A10 two-phase ratio-targeted negative downsample
    (RelexTsvDataset.java:120-157): fixed-fraction pass, one group-level
    count barrier, rescaled retain prob re-applied on the same D3 draw."""
    # the retune consumes the pipeline twice (phase-1 count barrier +
    # phase-2 filter): materialize it once
    lab = _mention_pipeline(spark, sf_dir).localCheckpoint(eager=True)
    kept, retain = mentions.downsample_negatives_to_ratio(
        lab, sample_fraction=0.5, target_ratio=1.0
    )
    g = kept.groupBy("id1", "id2").agg(
        F.max(F.col("is_positive").cast("int")).alias("pos")
    )
    return g.agg(
        F.count("*").alias("n_groups"),
        F.sum("pos").alias("n_positive"),
    ).select(
        "n_groups", "n_positive",
        F.round(F.lit(retain), 6).alias("retain_prob"),
    )


def q_mention_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 + P10: entity-id -> coarse type broadcast lookup with 'unk'
    default and 'multiType' on conflicts (GroundTruth.getType), then the
    unordered type-pair allowlist filter (TypePairEntityPairFilter) —
    emitted per surviving distinct pair."""
    lab = _mention_pipeline(spark, sf_dir)
    pairs = lab.select("id1", "id2").distinct()
    types = spark.createDataFrame(TYPE_ROWS, "id string, type string")
    typed = mentions.attach_types(pairs, types)
    allowed = spark.createDataFrame(
        sorted(ALLOWED_TYPE_PAIRS), "type_a string, type_b string"
    )
    kept = mentions.filter_by_type_pairs(typed, allowed)
    return kept.select("id1", "id2", "type1", "type2")


def q_triple_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: corpus-count triple filter (BuildGroundTruth.java:45-55) —
    keep a GT triple only when BOTH argument entities have at least
    min_count gazetteer mentions in the corpus."""
    d = _docs(spark, sf_dir)
    m = gazetteer.match_documents(d, GAZ_ENTRIES)
    id_counts = m.groupBy(F.col("entity_id").alias("id")).agg(
        F.count("*").alias("cnt")
    )
    triples = spark.createDataFrame(GT_TRIPLES, "arg1 string, rel string, arg2 string")
    return mentions.filter_triples_by_counts(triples, id_counts, min_count=900)


def q_gazetteer_label_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BuildGazetteer corpus-count label filter
    (BuildGazetteer.java:92-107): per (entity, label), keep iff
    count >= min AND (multi-word OR integer OR count <= max). The label
    table mixes hot single words (dropped when the entity's corpus count
    exceeds max_count=900 — the stop-word-like case the cap exists for),
    multi-word forms and an integer label (kept at any count), and a
    never-attested entity (dropped by min_count)."""
    d = _docs(spark, sf_dir)
    m = gazetteer.match_documents(d, GAZ_ENTRIES)
    id_counts = m.groupBy(F.col("entity_id").alias("id")).agg(
        F.count("*").alias("cnt")
    )
    labels = spark.createDataFrame(
        [(f"ent:{w}", w) for w in GAZ_WORDS]
        + [(f"ent:{w}", f"the {w}") for w in GAZ_WORDS]
        + [(f"ent:{w}", lb) for w in GAZ_WORDS for lb in INT_BOUNDARY_LABELS]
        + [("ent:filter", "42"), ("ent:missing", "ghost")],
        "id string, label string",
    )
    kept = kb.filter_gazetteer_labels(labels, id_counts, min_count=1, max_count=900)
    return kept.select(
        "id", "label", "count", F.concat_ws(" ", "tokens").alias("tokens")
    )


def q_gazetteer_overlap_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 PostGazClean (GazetteerEDL.java:41-70): drop a match covering
    <= 1 token that lies inside a strictly-longer match of the same
    document — e.g. the single-word 'hash' and 'join' matches inside a
    'hash join' phrase match."""
    d = _docs(spark, sf_dir)
    m = gazetteer.match_documents(d, GAZ_ENTRIES)
    return gazetteer.clean_overlapping_matches(m).select(
        "doc_id", "entity_id", "tok_start", "tok_end"
    )


def q_mention_pairs_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 token-window pair variant
    (CreateTsvDatasetTokenWindow.java:165-176): reference BREAK-scan
    semantics — walk successors in annotation order (start asc, longer
    first) and stop at the FIRST whose token end exceeds center end +
    window, excluding every later mention even if it would itself fit
    (a pure filter formulation over-produces; see
    gazetteer.mention_pairs_token_window for the per-doc prefix scan
    that implements the break natively)."""
    d = _docs(spark, sf_dir)
    m = gazetteer.match_documents(d, GAZ_ENTRIES)
    return gazetteer.mention_pairs_token_window(m, window=4)


def q_literal_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 literal cleaning (trailing parenthetical, punct strip,
    whitespace -> '_', max-len null; ConvertDBpedia literal handling) +
    M12 TSV sanitization over deterministically synthesized literals."""
    d = _docs(spark, sf_dir)
    raw = F.concat(
        F.lit("  **The Item "), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit(" carrying a very long tail that pushes it past the cap")
               ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" (a note)")).otherwise(F.lit("")),
        F.lit("  "),
    )
    tsv_raw = F.concat(F.lit("a\tb\nc\r"), F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        kb.clean_literal(raw).alias("lit"),
        mentions.sanitize_tsv(tsv_raw).alias("tsv"),
    )


def _content_tag(values) -> str:
    """Short digest of fixture-relevant input content: folded into the
    fixture filename so regenerating an sf dataset IN PLACE invalidates
    stale fixtures (same pattern _ensure_lang_scores uses for its seed
    profiles)."""
    import hashlib

    h = hashlib.sha256()
    for v in values:
        h.update(str(v).encode())
        h.update(b"\x00")
    return h.hexdigest()[:10]


def _ensure_text_fixture(sf_dir: str, kind: str) -> str:
    """Deterministic .nt / .tsv fixture files synthesized from the sf's
    doc_ids (S8/S9 scan inputs; the DuckDB oracle reads the SAME file).
    Filename carries a digest of the doc_id list."""
    import pyarrow.parquet as pq

    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    ids = sorted(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_pylist()
    )
    out = fixtures.DEFAULT_FIXTURE_DIR / f"scan_{name}_{_content_tag(ids)}.{kind}"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        lines = []
        if kind == "nt":
            lines.append("# synthetic ntriples fixture")
            for i in ids:
                s = f"<http://kb.example/resource/Item_{i}>"
                p = f"<http://kb.example/ontology/rel{i % 3}>"
                if i % 2 == 0:
                    o = f"<http://kb.example/resource/Obj_{i * 7}>"
                else:
                    o = f'"literal {i} with \\"quotes\\""'
                lines.append(f"{s} {p} {o} .")
                if i % 50 == 0:
                    lines.append("")  # blank line (dropped by the scan)
        else:  # tsv
            for i in ids:
                lines.append(f"row{i}\t{i * 3}\tlabel {i % 11}")
        out.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(out)


def q_ntriples_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 NTriples scan (NTriples.java:35-52): comment/blank lines drop,
    object is an IRI or a quoted literal with escapes."""
    from cc_dbp_spark.sources import io as cio

    return cio.read_ntriples(spark, _ensure_text_fixture(sf_dir, "nt"))


def q_tsv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 simple-TSV scan (SimpleTsvIterable.java:27-50): tab split, no
    quoting."""
    from cc_dbp_spark.sources import io as cio

    df = cio.read_simple_tsv(
        spark, _ensure_text_fixture(sf_dir, "tsv"), ["name", "triple", "label"]
    )
    return df.select("name", F.col("triple").cast("bigint").alias("triple"), "label")


def q_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/D6 learning-curve fraction: keep docs whose
    Random(docId.hashCode()+123321).nextDouble() draw falls under the
    curve fraction (RelexMention.java:298-303)."""
    from cc_dbp_spark.functions.parity import register_udfs

    register_udfs(spark)
    d = _docs(spark, sf_dir)
    # URL-shaped key: the reference draws on document URIs, whose
    # hashCodes are spread; consecutive integer ids give JDK Random's
    # classic correlated first draws (still bit-exact, just degenerate)
    key = F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string"))
    return d.select("doc_id", key.alias("__k")).filter(
        F.expr("ccdbp_lc_pos(__k)") < 0.25
    ).select("doc_id")


def _fixture_docs(spark: SparkSession) -> DataFrame:
    fd = fixtures.ensure_default(500)
    return spark.read.parquet(str(fd / "documents_spans.parquet"))


def q_w2v_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 w2v sentence rendering over interleaved span docs
    (CreateW2VFile.java:53-80). Fixture-backed; hash-checked against a
    DuckDB oracle over the same spans parquet."""
    return spans.w2v_sentences(_fixture_docs(spark))


def q_doc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 doc -> sub-documents with re-offset spans
    (Document.java:418-441). Emits per-part span counts; the re-offset
    invariant (first span at 0, order preserved) is pytest-checked."""
    parts = spans.split_documents(_fixture_docs(spark), chunk=8)
    return parts.select(
        "doc_id", "part", F.size("spans").alias("n_spans"),
        F.element_at("spans", 1)["offset"].alias("first_offset"),
    )


def q_span_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 sorted-span invariant audit over every fixture doc and over
    every doc after M6 kind-projection — the span-sequence-equality
    precondition."""
    d = _fixture_docs(spark)
    before = spans.spans_sorted_ok(d).agg(
        F.count("*").alias("n_docs"), F.sum(F.col("ok").cast("int")).alias("n_sorted")
    )
    projected = spans.spans_sorted_ok(spans.filter_kinds(d, ["link", "media"])).agg(
        F.count("*").alias("n_docs"), F.sum(F.col("ok").cast("int")).alias("n_sorted")
    )
    return before.withColumn("stage", F.lit("raw")).unionByName(
        projected.withColumn("stage", F.lit("kind_projected"))
    )


def _nodes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    label = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("LAB")).otherwise(F.lit("lab")),
        (F.col("doc_id") % 37).cast("string"),
    )
    return d.select(
        F.concat(F.lit("n"), F.col("doc_id")).alias("id"),
        label.alias("label"),
        F.col("n_chars").cast("double").alias("popularity"),
    )


def q_label_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 label-collision merge: ids sharing a lowercased label remap to
    the most popular id (MergeNodesDBpedia.java:57-90)."""
    return kb.merge_label_collisions(_nodes_df(spark, sf_dir))


def q_uri_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 URI -> label (url-decode, underscores, trailing parenthetical;
    ConvertDBpedia.java:446-452)."""
    d = _docs(spark, sf_dir)
    uri = F.concat(
        F.lit("http://kb.example/resource/Item_"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("_(thing)")).otherwise(F.lit("")),
    )
    return d.select("doc_id", kb.uri_to_label(uri).alias("label"))


def q_select_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 top-N frequent types with a minimum size (SelectTypes)."""
    d = _docs(spark, sf_dir)
    types = d.select("doc_id", F.col("source").alias("type"))
    return kb.select_types(types, max_types=5, min_size=10)


def q_taxonomy_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 triples x relation-taxonomy closure expansion."""
    triples = spark.createDataFrame(GT_TRIPLES, "arg1 string, rel string, arg2 string")
    closure = spark.createDataFrame(TAXONOMY_CLOSURE, "rel string, super_rel string")
    return kb.taxonomy_expand(triples, closure)


def q_doc_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2 one-doc-per-line JSON serialize/deserialize round trip with
    span-sequence equality audit (TestJSON pattern)."""
    d = _fixture_docs(spark)
    back = serde.docs_from_json_lines(serde.docs_to_json_lines(d))
    j = d.alias("a").join(back.alias("b"), "doc_id")
    same = F.sum(
        (F.col("a.spans") == F.col("b.spans")).cast("int")
    ).alias("n_roundtrip_equal")
    return j.agg(F.count("*").alias("n_docs"), same)


def q_opic_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC cash-propagation priority over the fixture link graph
    (NodePopularity.java:33-58 shape). Hash-checked: the 2-round cash
    propagation is unrolled into chained DuckDB CTEs."""
    edges = with_canonical(
        spans.outlink_edges(_fixture_docs(spark)), "dst", out="dst"
    ).select("src", "dst")
    scores = kb.opic_scores(edges, n_rounds=2)
    return scores.select("node", F.round("history", 8).alias("history"))


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3/M4 HTML -> interleaved span docs (HtmlToDocument.java:28-71
    title-shift contract) over deterministically synthesized pages;
    exploded to one row per span so the whole extraction is
    oracle-checkable analytically."""
    d = _docs(spark, sf_dir)
    page = F.concat(
        F.lit("<html><head><title>"), F.col("source"), F.lit(" "),
        F.col("doc_id").cast("string"), F.lit("</title></head><body><h2>Sec "),
        F.col("doc_id").cast("string"), F.lit("</h2><p>"),
        F.col("text"),
        F.lit('</p><p>alpha <b>beta gamma</b> delta '
              '<a href="http://x.ex.com/in">inline link</a> omega</p>'
              '<p>tiny one</p><a href="http://'),
        F.col("source"), F.lit(".ex.com/p/"), F.col("doc_id").cast("string"),
        F.lit("\">more</a></body></html>"),
    )
    pages = d.select(
        F.concat(F.lit("http://"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("url"),
        F.encode(page, "UTF-8").alias("payload"),
    )
    docs = htmlops.html_to_documents(pages)
    return docs.select(
        "doc_id", "charset", F.posexplode("spans").alias("span_idx", "s")
    ).select(
        "doc_id", "charset", "span_idx",
        F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"), F.col("s.offset").alias("offset"),
    )


def q_vocab_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 vocab auto-tune: ladder histogram + smallest threshold whose
    surviving vocabulary fits the limit (GatherRelexVocab.java:141-191;
    counts per RelexVocab.add incl. digit-sequence twins)."""
    d = _docs(spark, sf_dir)
    counts = _vocab_tokens(d).groupBy("word").agg(F.count("*").alias("cnt"))
    mc, kept = ts.choose_vocab_min_count(counts, vocab_limit=20)
    return kept.select(F.lit(mc).alias("min_count"), "word", "cnt")


def q_relex_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 per-relation + total mention stats rollup."""
    lab = _mention_pipeline(spark, sf_dir)
    return mentions.relex_stats(lab)


def q_tensor_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 round-robin mention-set chunking + M14 REAL tensor encoding:
    vocab-indexed token row, two position-embedding rows keyed to the
    ARGONE/ARGTWO spans, pool pieces and sentence starts per chunk
    (RelexTensors.java:112-190 semantics). The driver compares the
    decoded tensor arrays; the serialized b64 line is a deterministic
    function of them (round-trip pytest in test_vocab_tensors)."""
    lab = _mention_pipeline(spark, sf_dir)
    rows = mentions.tensor_chunk_rows(lab, min_mention_set=2, max_mention_set=5)
    wc = q_word_counts(spark, sf_dir)
    # T3-style bounded sorted vocab: post-min-count vocab is collect-safe
    # by construction (the same bound the reference's RelexVocab relies
    # on), so a global rank window here is a bounded sort, not a
    # frontier-scale one
    wv = Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
    vocab = wc.select("word", (F.row_number().over(wv) - 1).alias("widx"))
    t = mentions.encode_tensor_rows(rows, vocab, max_pos=64)

    # the driver's canonicalizer sorts/hashes with pandas, which cannot
    # handle list cells — serialize the int arrays to comma-joined
    # strings (same on the oracle side; values unchanged, presentation
    # made hashable)
    def _s(c: str):
        return F.concat_ws(",", F.col(c).cast("array<string>")).alias(c)

    return t.select(
        "id1", "id2", "chunk", "positive",
        _s("words"), _s("pos1"), _s("pos2"),
        _s("pool_starts"), _s("pool_ends"), _s("sent_starts"),
    )


def q_html_extract_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 residual: boilerpipe-style density block classification
    (public NumWordsRules tree over num_words + link_density of
    prev/curr/next blocks, Kohlschütter et al.) on a nav-heavy page:
    the all-link nav paragraph always drops (with its inline link
    spans); the main paragraph drops too when it has <= 40 words and is
    followed by the short tail (the classic boilerpipe sandwich); the
    short tail survives on the strength of its content neighbor."""
    d = _docs(spark, sf_dir)
    page = F.concat(
        F.lit("<html><head><title>"), F.col("source"), F.lit(" "),
        F.col("doc_id").cast("string"), F.lit("</title></head><body>"),
        F.lit('<p><a href="http://n.ex.com/1">Home</a> '
              '<a href="http://n.ex.com/2">About</a> '
              '<a href="http://n.ex.com/3">Contact</a> '
              '<a href="http://n.ex.com/4">Login</a></p><p>'),
        F.col("text"),
        F.lit("</p><p>short tail</p></body></html>"),
    )
    pages = d.select(
        F.concat(F.lit("http://"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("url"),
        F.encode(page, "UTF-8").alias("payload"),
    )
    docs = htmlops.html_to_documents(pages, classifier="density")
    return docs.select(
        "doc_id", "charset", F.posexplode("spans").alias("span_idx", "s")
    ).select(
        "doc_id", "charset", "span_idx",
        F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"), F.col("s.offset").alias("offset"),
    )


def q_doc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/D2 deterministic content-keyed document downsample
    (pseudoRandomFromString('SAMPLEDOC'+text) < frac). Hash-checked: the
    oracle compares against the precomputed draw fixture
    (_ensure_doc_draws); the draw kernel itself is golden-vector
    anchored in pytest."""
    from cc_dbp_spark.functions.parity import register_udfs

    register_udfs(spark)
    d = _docs(spark, sf_dir)
    # the kernel prepends the 'SAMPLEDOC' salt itself (GroundTruth.java:169-174)
    return d.select("doc_id").filter(F.expr("ccdbp_doc_downsample(text) < 0.3"))


# ---------------------------------------------------------------- contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one full scheduling round at sf0.001."""
    return q_crawl_round_set(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is deliberate (the driver's correctness gate
    processes exactly the first 50 entries; r1-r4 verdicts):

    1. STANDING POLICY (r4 verdict): any query whose implementation or
       oracle changed in-round sits inside the window, plus every query
       that missed the previous round's gate, plus new queries;
    2. then stable previously-green queries; the 14 tail entries are all
       r4 driver-green, UNCHANGED this round, and cheap to re-verify via
       tools/check_entry.py if needed."""
    return {
        # -- r4-unchecked (rotated in per the standing policy) --------
        "mention_pairs": q_mention_pairs,
        "mention_groups": q_mention_groups,
        "mention_downsample": q_mention_downsample,
        "mention_downsample_ratio": q_mention_downsample_ratio,
        "mention_types": q_mention_types,
        "crawl_round_set": q_crawl_round_set,
        "crawl_multiround": q_crawl_multiround,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "neardup_components": q_neardup_components,
        "video_frames": q_video_frames,
        "resize_plan": q_resize_plan,
        # -- new or changed this round --------------------------------
        "crawl_stream_rounds": q_crawl_stream_rounds,
        "gazetteer_mentions_ruletok": q_gazetteer_mentions_ruletok,
        "mention_pairs_window": q_mention_pairs_window,
        "gazetteer_label_filter": q_gazetteer_label_filter,
        "tensor_lines": q_tensor_lines,
        "warc_parse": q_warc_parse,
        "ann_ivf": q_ann_ivf,
        # w2v rendering + doc split changed late in-round (overlap-drop
        # scan / in-row piece building) -> promoted per the policy
        "w2v_lines": q_w2v_lines,
        "doc_split": q_doc_split,
        # -- stable r4 driver-green -----------------------------------
        "html_extract_density": q_html_extract_density,
        "gazetteer_overlap_clean": q_gazetteer_overlap_clean,
        "doc_downsample": q_doc_downsample,
        "opic_scores": q_opic_scores,
        "vocab_autotune": q_vocab_autotune,
        "relex_stats": q_relex_stats,
        "taxonomy_expand": q_taxonomy_expand,
        "events_hourly": q_events_hourly,
        "topk_per_host": q_topk_per_host,
        "url_canonicalize": q_url_canonicalize,
        "host_counts": q_host_counts,
        "outlinks": q_outlinks,
        "robots_parse": q_robots_parse,
        "sessionize": q_sessionize,
        "corpus_stats": q_corpus_stats,
        "word_counts": q_word_counts,
        "vocab_histogram": q_vocab_histogram,
        "token_count": q_token_count,
        "quality": q_quality,
        "langid": q_langid,
        "stopword_ratio": q_stopword_ratio,
        "fingerprint": q_fingerprint,
        "ann_brute": q_ann_brute,
        "gazetteer_mentions": q_gazetteer_mentions,
        "ngram_jaccard": q_ngram_jaccard,
        "emb_near_dups": q_emb_near_dups,
        "triple_counts": q_triple_counts,
        "media_features": q_media_features,
        "audio_features": q_audio_features,
        # ================= 50-query window boundary ==================
        # tail: r4 driver-green, UNCHANGED in r5 (verified via
        # check_entry this session regardless)
        "html_extract": q_html_extract,
        "doc_json_roundtrip": q_doc_json_roundtrip,
        "literal_clean": q_literal_clean,
        "ntriples_parse": q_ntriples_parse,
        "tsv_scan": q_tsv_scan,
        "langid_trigram": q_langid_trigram,
        "dedup_exact": q_dedup_exact,
        "dedup_survivors": q_dedup_survivors,
        "span_invariant": q_span_invariant,
        "label_merge": q_label_merge,
        "uri_labels": q_uri_labels,
        "select_types": q_select_types,
        "learning_curve": q_learning_curve,
        # TPC-ish demo, no SURVEY ID (r4 verdict task 9: out of window)
        "lineitem_pricing": q_lineitem_pricing,
    }


_GAZ_WORDS_SQL = "(" + ", ".join(f"'{w}'" for w in GAZ_WORDS) + ")"
_GAZ_PHRASES_SQL = ", ".join(f"('{a}', '{b}')" for a, b in GAZ_PHRASES)
_TRIPLES_SQL = ", ".join(f"('{a}', '{r}', '{b}')" for a, r, b in GT_TRIPLES)
# gazetteer_label_filter label fixture (mirrors q_gazetteer_label_filter).
# The INT_BOUNDARY labels pin the exact Integer.parseInt acceptance at the
# int32 edge: on a hot (count>max) entity only genuinely-parseable values
# survive via the integer branch.
INT_BOUNDARY_LABELS = [
    "2147483647",     # Integer.MAX_VALUE: int -> kept at any count
    "2147483648",     # MAX_VALUE+1: parseInt overflows -> dropped when hot
    "-2147483648",    # Integer.MIN_VALUE: int -> kept
    "-2147483649",    # MIN_VALUE-1: dropped when hot
    "0002147483647",  # leading zeros, value fits -> kept
    "12345678901",    # 11 digits -> dropped when hot
]
_LABELS_SQL = ", ".join(
    [f"('ent:{w}', '{w}')" for w in GAZ_WORDS]
    + [f"('ent:{w}', 'the {w}')" for w in GAZ_WORDS]
    + [f"('ent:{w}', '{lb}')" for w in GAZ_WORDS for lb in INT_BOUNDARY_LABELS]
    + ["('ent:filter', '42')", "('ent:missing', 'ghost')"]
)

# tokens with 1-based position and exact char offsets (single-space layout
# verified by the Spark side's regex tokenizer on the same text)
# P8 sentence bounds: whitespace tokens in [2,100], chars in [2,400]
# (applied by the mention pipeline; the raw gazetteer query is unbounded)
_P8_BOUNDS_SQL = """
    WHERE length(text) BETWEEN 2 AND 400
      AND len(string_split_regex(trim(text), '\\s+')) BETWEEN 2 AND 100"""

_MENTION_CTE_TMPL = f"""
  WITH sp AS (
    SELECT doc_id, text, string_split(text, ' ') AS w FROM documents__P8_BOUNDS__
  ),
  widx AS (
    SELECT doc_id, text, w, unnest(range(1, len(w) + 1)) AS ord FROM sp
  ),
  toks AS (
    SELECT doc_id, text, w[ord] AS word, CAST(ord AS INT) AS ord FROM widx
  ),
  offs AS (
    SELECT doc_id, text, word, ord,
           CAST(COALESCE(sum(length(word) + 1) OVER (
             PARTITION BY doc_id ORDER BY ord
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS cstart
    FROM toks
  ),
  ment0 AS (
    SELECT doc_id, text, 'ent:' || word AS entity_id,
           cstart, cstart + length(word) AS cend, 1 AS ntok
    FROM offs WHERE word IN {_GAZ_WORDS_SQL}
    UNION ALL
    SELECT a.doc_id, a.text, 'ent:' || a.word || '_' || b.word AS entity_id,
           a.cstart, b.cstart + length(b.word) AS cend, 2 AS ntok
    FROM offs a JOIN offs b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
    WHERE (a.word, b.word) IN ({_GAZ_PHRASES_SQL})
  ),
  ment AS (
    SELECT doc_id, text, entity_id, cstart, cend FROM ment0 m__POSTGAZ__
  ),
  rawpairs AS (
    SELECT m1.doc_id, m1.text,
           m1.entity_id AS id1, m2.entity_id AS id2,
           m1.cstart AS s1, m1.cend AS e1, m2.cstart AS s2, m2.cend AS e2,
           greatest(m2.cstart - m1.cend, m1.cstart - m2.cend) AS gap
    FROM ment m1 JOIN ment m2
      ON m1.doc_id = m2.doc_id AND m1.entity_id < m2.entity_id
     AND (m1.cend <= m2.cstart OR m2.cend <= m1.cstart)
  ),
  best AS (
    -- tie-break = bestSpanPair iteration order: annotation order is
    -- (start asc, LONGER first), strictly-greater keeps the first
    SELECT *, row_number() OVER (
      PARTITION BY doc_id, id1, id2
      ORDER BY gap ASC, s1 ASC, e1 DESC, s2 ASC, e2 DESC) AS rn
    FROM rawpairs
  ),
  rewritten AS (
    SELECT doc_id, id1, id2, s1, e1, s2, e2,
           CASE WHEN s1 <= s2
             THEN text[1:s1] || 'ARGONE' || text[e1+1:s2] || 'ARGTWO' || text[e2+1:length(text)]
             ELSE text[1:s2] || 'ARGTWO' || text[e2+1:s1] || 'ARGONE' || text[e1+1:length(text)]
           END AS rewritten,
           text
    FROM best WHERE rn = 1
  ),
  triples(arg1, rel, arg2) AS (VALUES {_TRIPLES_SQL}),
  -- DirectionStyle.ignore (the reference default): getRelations'
  -- '>'/'<' prefixes are stripped into a SET, so a relation held in
  -- both directions collapses to one name
  rels AS (
    SELECT id1, id2, string_agg(rel, ',' ORDER BY rel) AS relations
    FROM (SELECT DISTINCT * FROM (
            SELECT arg1 AS id1, arg2 AS id2, rel FROM triples
            UNION ALL
            SELECT arg2 AS id1, arg1 AS id2, rel FROM triples))
    GROUP BY 1, 2),
  labeled AS (
    SELECT r.*, COALESCE(rl.relations, '') AS relations,
           COALESCE(rl.relations, '') <> '' AS is_positive
    FROM rewritten r
    LEFT JOIN rels rl ON rl.id1 = r.id1 AND rl.id2 = r.id2
  )
"""

# the mention pipeline applies P8 bounds AND PostGazClean
# (GazetteerEDL.java:80-84: the EDL pipeline removes single-token
# mentions nested inside a multi-token mention BEFORE any dataset
# build); the raw gazetteer scan applies neither.
_POSTGAZ_SQL = """
    WHERE m.ntok > 1 OR NOT EXISTS (
      SELECT 1 FROM ment0 l
      WHERE l.doc_id = m.doc_id AND l.ntok > 1
        AND l.cstart <= m.cstart AND m.cend <= l.cend)"""
_MENTION_CTE = _MENTION_CTE_TMPL.replace(
    "__P8_BOUNDS__", _P8_BOUNDS_SQL
).replace("__POSTGAZ__", _POSTGAZ_SQL)
_MENTION_CTE_UNBOUNDED = _MENTION_CTE_TMPL.replace("__P8_BOUNDS__", "").replace(
    "__POSTGAZ__", ""
)


def _fixture_docs_path() -> str:
    """Absolute path of the deterministic span-docs fixture parquet the
    fixture-backed queries read — the DuckDB oracles read the SAME file
    via read_parquet, so both sides see identical input."""
    return str(fixtures.ensure_default(500) / "documents_spans.parquet")


_ORACLE_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness scale


def _oracle_sf() -> str:
    import os

    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", _ORACLE_SF_DIR)


def _minhash_params_sql(num_hashes: int = 64, seed: int = 1) -> str:
    """(i, a, b) VALUES rows of the MinHash permutation parameters —
    the same numpy-seeded params the Spark UDF uses."""
    a, b = dedup._minhash_params(num_hashes, seed)
    return ", ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)" for i in range(num_hashes)
    )


_U64 = "18446744073709551616::HUGEINT"  # 2^64
_I64_MIN_AS_U = "9223372036854775808::HUGEINT"  # 2^63
_MH_PRIME = "2305843009213693951::HUGEINT"  # 2^61 - 1

# unsigned view of a signed int64 column named h
_UNSIGNED_H = f"CASE WHEN h < 0 THEN h::HUGEINT + {_U64} ELSE h::HUGEINT END"

_BIT_PW_SQL = ", ".join(f"({b}, {1 << b}::HUGEINT)" for b in range(64))


def _hex_byte(hex_col: str, k: int) -> str:
    """SQL for byte k (0-based) of a lowercase hex digest column —
    recomputes the ``sha256(ref).digest()[k]`` metadata bytes of
    ``multimodal.synth_media_table`` independently in DuckDB."""
    hi = f"(strpos('0123456789abcdef', substr({hex_col}, {2 * k + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr({hex_col}, {2 * k + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def _multiround_oracle_sql(fd: str, ties_path: str, n_rounds: int = 3) -> str:
    """The FULL multi-round crawl unrolled into chained SQL CTEs — one
    complete scheduling round per unroll step (canonicalize -> seen
    anti-join -> frontier merge -> dedupe -> RFC-9309 longest-prefix
    robots -> budgets from credit∪robots with defaults -> priority +
    tie top-k per host -> global positions -> outlink feedback -> seen/
    frontier/credit carry). The only non-SQL ingredient is the sha1 tie
    draw, read from the pure-Python-twin fixture (ensure_crawl_ties).
    Bloom filters are advisory in the engine (exact anti-join confirms),
    so the oracle's plain anti-join reproduces the same decisions."""
    import re as _re

    def canon_chunk(r: int) -> str:
        chunk = _canon_cte(
            "url",
            key_cols="rid, depth",
            src=f"(SELECT row_number() OVER () AS rid, url, depth FROM cand_{r}) s{r}",
            lead="",
        )
        for name in ("u0", "u1", "parts", "hp", "hpp", "pq", "pp", "canon"):
            chunk = _re.sub(rf"\b{name}\b", f"{name}_{r}", chunk)
        return chunk

    # path INCLUDING query (RFC-9309 match string; urlnorm.pathq_col)
    path_of = (
        "CASE WHEN regexp_replace(d.url,"
        " '^[a-z][a-z0-9+.\\-]*://[^/?]*', '') = '' THEN '/'"
        " ELSE regexp_replace(d.url,"
        " '^[a-z][a-z0-9+.\\-]*://[^/?]*', '') END"
    )
    sql = [
        f"WITH ties AS (SELECT url, tie FROM read_parquet('{ties_path}')),",
        "robots AS (SELECT host, allow_prefixes, deny_prefixes, crawl_delay_s"
        f" FROM read_parquet('{fd}/robots_rules.parquet')),",
        "docspans AS (SELECT doc_id, unnest(spans) AS s"
        f" FROM read_parquet('{fd}/documents_spans.parquet')),",
        "cand_0 AS (SELECT url, CAST(depth AS INT) AS depth"
        f" FROM read_parquet('{fd}/seeds.parquet')),",
        "cred_0 AS (SELECT NULL::VARCHAR AS host, NULL::DOUBLE AS credit WHERE false),",
        "seen_0 AS (SELECT NULL::VARCHAR AS url WHERE false),",
        "f_0 AS (SELECT NULL::VARCHAR AS url, NULL::VARCHAR AS host,"
        " NULL::INT AS depth, NULL::BIGINT AS link_count,"
        " NULL::INT AS round_added WHERE false),",
    ]
    for r in range(n_rounds):
        lc = "0" if r == 0 else "1"
        sql.append(canon_chunk(r) + ",")
        sql.append(f"""
        new_{r} AS (
          SELECT url, host_out AS host, depth, CAST({lc} AS BIGINT) AS lc,
                 {r} AS ra
          FROM canon_{r}
          WHERE url NOT IN (SELECT url FROM seen_{r})),
        all_{r} AS (
          SELECT url, host, depth, link_count AS lc, round_added AS ra FROM f_{r}
          UNION ALL SELECT url, host, depth, lc, ra FROM new_{r}),
        dedup_{r} AS (
          SELECT host, url, CAST(min(depth) AS INT) AS depth,
                 sum(lc) AS link_count, CAST(min(ra) AS INT) AS round_added
          FROM all_{r} GROUP BY 1, 2),
        bud_{r} AS (
          SELECT h.host, COALESCE(c.credit, 0.0) + 10.0 AS credit0,
                 CASE WHEN rb.crawl_delay_s IS NULL OR isnan(rb.crawl_delay_s)
                           OR rb.crawl_delay_s <= 0
                      THEN 1.0 ELSE rb.crawl_delay_s END AS delay
          FROM (SELECT host FROM cred_{r} UNION SELECT host FROM robots) h
          LEFT JOIN cred_{r} c USING (host)
          LEFT JOIN robots rb USING (host)),
        budk_{r} AS (
          SELECT host, credit0, delay,
                 CAST(floor(credit0 / delay) AS INT) AS k FROM bud_{r}),
        flag_{r} AS (
          SELECT d.host, d.url, d.depth, d.link_count, d.round_added,
                 COALESCE(b.k, 10) AS k, COALESCE(b.delay, 1.0) AS delay,
                 1.0 / (1.0 + d.depth) + 0.1 * ln(1.0 + d.link_count) AS priority,
                 t.tie,
                 COALESCE(list_max(list_transform(
                     list_filter(rb.deny_prefixes,
                                 p -> starts_with({path_of}, p)),
                     p -> length(p))), -1)
                 > COALESCE(list_max(list_transform(
                     list_filter(rb.allow_prefixes,
                                 p -> starts_with({path_of}, p)),
                     p -> length(p))), -1) AS denied
          FROM dedup_{r} d
          LEFT JOIN budk_{r} b USING (host)
          LEFT JOIN robots rb USING (host)
          JOIN ties t ON t.url = d.url),
        rank_{r} AS (
          SELECT *, row_number() OVER (PARTITION BY host
                   ORDER BY priority DESC, tie ASC, url ASC) AS rnk
          FROM flag_{r} WHERE NOT COALESCE(denied, false) AND k > 0),
        sched_{r} AS (SELECT * FROM rank_{r} WHERE rnk <= k),
        out_{r} AS (
          SELECT {r} AS round,
                 CAST(row_number() OVER (ORDER BY host, rnk) - 1 AS INT)
                   AS position,
                 url, host, depth
          FROM sched_{r}),
        cand_{r + 1} AS (
          SELECT ds.s.media_ref AS url, CAST(b.depth + 1 AS INT) AS depth
          FROM sched_{r} b JOIN docspans ds ON ds.doc_id = b.url
          WHERE ds.s.kind = 'link' AND ds.s.media_ref IS NOT NULL),
        seen_{r + 1} AS (
          SELECT url FROM seen_{r} UNION ALL SELECT url FROM sched_{r}),
        f_{r + 1} AS (
          SELECT url, host, depth, link_count, round_added FROM flag_{r}
          WHERE NOT COALESCE(denied, false)
            AND url NOT IN (SELECT url FROM sched_{r})),
        active_{r} AS (SELECT DISTINCT host FROM dedup_{r}),
        cred_{r + 1} AS (
          SELECT host, credit FROM cred_{r}
          WHERE host NOT IN (SELECT host FROM active_{r})
          UNION ALL
          SELECT a.host,
                 COALESCE(b.credit0, 10.0)
                   - COALESCE(sc.n, 0) * COALESCE(b.delay, 1.0) AS credit
          FROM active_{r} a
          LEFT JOIN budk_{r} b USING (host)
          LEFT JOIN (SELECT host, count(*) AS n FROM sched_{r} GROUP BY 1) sc
            USING (host)),
        """)
    unions = " UNION ALL ".join(f"SELECT * FROM out_{r}" for r in range(n_rounds))
    sql.append(f"final AS ({unions}) SELECT round, position, url, host, depth FROM final")
    return "\n".join(sql)


def _ensure_doc_draws() -> str:
    """Precompute the D2 doc-downsample draw per document of the oracle
    sf into a tiny parquet (the judge-sanctioned pattern for the
    deterministic-draw filters: the oracle becomes a plain comparison;
    the draw itself is anchored by the JDK golden-vector pytest suite)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cc_dbp_spark.functions import parity

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", _ORACLE_SF_DIR)
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # the draw is content-keyed, so the tag digests id AND text
    tag = _content_tag(tbl.column("doc_id").to_pylist())[:5] + _content_tag(
        tbl.column("text").to_pylist()
    )[:5]
    out = fixtures.DEFAULT_FIXTURE_DIR / f"doc_draws_{name}_{tag}.parquet"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        draws = parity.document_downsample_priority(
            t if t is not None else "" for t in tbl.column("text").to_pylist()
        )
        pq.write_table(
            pa.table({"doc_id": tbl.column("doc_id"), "draw": pa.array(draws)}), out
        )
    return str(out)


def _ensure_lang_scores() -> str:
    """Precompute the trigram language posterior per oracle-sf document
    into a fixture parquet via the SAME numpy kernel the UDF uses — the
    oracle compare then validates the distributed Arrow execution against
    the driver-side twin. The filename carries a digest of the seed
    profiles so retraining invalidates stale fixtures."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", _ORACLE_SF_DIR)
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    seed_tag = hashlib.sha256(
        "|".join(f"{k}:{v}" for k, v in sorted(ts._SEED_TEXT.items())).encode()
    ).hexdigest()[:10]
    out = fixtures.DEFAULT_FIXTURE_DIR / f"lang_scores_{name}_{seed_tag}.parquet"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        langs, posts = ts.score_language(
            [t if t is not None else "" for t in tbl.column("text").to_pylist()]
        )
        pq.write_table(
            pa.table(
                {
                    "doc_id": tbl.column("doc_id"),
                    "lang_pred": pa.array(langs),
                    "posterior": pa.array(posts),
                }
            ),
            out,
        )
    return str(out)


def _ensure_lc_draws() -> str:
    """Precompute the D6 learning-curve draw per oracle-sf document into
    a fixture parquet (same pattern as _ensure_doc_draws; the kernel is
    JDK-golden-anchored in pytest)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cc_dbp_spark.functions import parity

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", _ORACLE_SF_DIR)
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    ids = tbl.column("doc_id").to_pylist()
    srcs = tbl.column("source").to_pylist()
    tag = _content_tag(f"{s}/{i}" for s, i in zip(srcs, ids))
    # k2 = kernel revision (int32-wrap seed fix): a kernel change must
    # invalidate fixtures even when the input keys are unchanged
    out = fixtures.DEFAULT_FIXTURE_DIR / f"lc_draws_{name}_k2_{tag}.parquet"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        draws = parity.learning_curve_position(
            [f"{s}/{i}" for s, i in zip(srcs, ids)]
        )
        pq.write_table(
            pa.table({"doc_id": tbl.column("doc_id"), "draw": pa.array(draws)}), out
        )
    return str(out)


def _pair_draw_values() -> str:
    """Inline (id1, id2, neg_draw, split) VALUES for every possible
    ordered gazetteer-entity pair (13 ids -> 78 pairs): the D3/D4 draws
    precomputed by the golden-vector-anchored parity kernel."""
    from cc_dbp_spark.functions import parity

    ids = sorted({e[0] for e in GAZ_ENTRIES})
    pairs = [(a, b) for a in ids for b in ids if a < b]
    i1 = [p[0] for p in pairs]
    i2 = [p[1] for p in pairs]
    negs = parity.negative_downsample_priority(i1, i2)
    sdraw = parity.split_location(i1, i2)
    names = ["train" if d < 0.8 else ("val" if d < 0.9 else "test") for d in sdraw]
    return ", ".join(
        f"('{a}', '{b}', {float(n)!r}, '{s}')"
        for (a, b), n, s in zip(pairs, negs, names)
    )


def oracle_sql() -> dict[str, str]:
    toks = _TOKS_SQL
    ntoks = _NORM_TOKS_SQL

    def _parseint_sql(c: str) -> str:
        """Exact Integer.parseInt acceptance (Lang.isInteger) as DuckDB
        SQL — the same pure-string int32 check the Spark side uses."""
        canon = f"regexp_replace(regexp_replace({c}, '^[+-]', ''), '^0+', '')"
        return (
            f"(regexp_matches({c}, '^[+-]?\\d+$')"
            f" AND (length({canon}) < 10 OR (length({canon}) = 10"
            f" AND {canon} <= CASE WHEN {c} LIKE '-%'"
            f" THEN '2147483648' ELSE '2147483647' END)))"
        )

    # RelexVocab.add counting source: every token plus, for integer
    # tokens, the '#'-digit-sequence twin of the same string length
    _vocab_w_sql = f"""
            w0 AS (SELECT unnest({ntoks}) AS word FROM documents),
            w AS (SELECT word FROM w0 WHERE word <> ''
                  UNION ALL
                  SELECT repeat('#', length(word)) FROM w0
                  WHERE {_parseint_sql('word')})"""
    tc = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({toks}) END"
    bpe = "len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])'))"
    nonspace = "length(regexp_replace(text, '\\s+', '', 'g'))"
    punct = "length(regexp_replace(text, '[\\p{L}\\p{N}\\s]+', '', 'g'))"
    punct_ratio = f"CASE WHEN {nonspace} > 0 THEN {punct} * 1.0 / {nonspace} ELSE 0.0 END"
    norm_text = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    hits = {lang: _stop_hits_sql(lang) for lang in sorted(ts.STOPWORDS)}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    lang_case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN {hits[lang]} = {best} THEN '{lang}'" for lang in sorted(ts.STOPWORDS)
    ) + " END"
    stop_ratio = (
        f"CASE WHEN len({ntoks}) > 0 THEN {_stop_hits_sql('en')} * 1.0 / len({ntoks}) "
        "ELSE 0.0 END"
    )
    quality = f"""
      round(((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 1.0
                   WHEN length(text) > 0 THEN 0.5 ELSE 0.0 END)
           + (CASE WHEN {tc} > 0
                    AND length(text) * 1.0 / {tc} BETWEEN 3.0 AND 12.0
                   THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN {punct_ratio} <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3.0, 6)
    """
    shingle_cte = f"""
      WITH t AS (
        SELECT doc_id, string_split({norm_text}, ' ') AS w FROM documents
      ), s AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct(list_transform(range(1, len(w) - 1),
                                       i -> array_to_string(w[i:i+2], ' ')))
                    ELSE [array_to_string(w, ' ')] END AS sh
        FROM t
      ), ex AS (SELECT doc_id, unnest(sh) AS sh FROM s),
      sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
      inter AS (
        SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS inter
        FROM ex l JOIN ex r ON l.sh = r.sh AND l.doc_id < r.doc_id
        GROUP BY 1, 2
      )
    """
    fx = _fixture_docs_path()
    doc_draws = _ensure_doc_draws()
    pair_draws = _pair_draw_values()
    types_sql = ", ".join(f"('{i}', '{t}')" for i, t in TYPE_ROWS)
    allowed_sql = ", ".join(f"('{a}', '{b}')" for a, b in sorted(ALLOWED_TYPE_PAIRS))

    from cc_dbp_spark.oracle import sketch_fixtures as sx

    mh_fx = sx.ensure_shingle_hashes(_oracle_sf())
    ivf_fx = sx.ensure_ivf_fixture(_oracle_sf())
    import pathlib as _pl

    _fd_dir = str(_pl.Path(fx).parent)
    crawl_ties = sx.ensure_crawl_ties(_fd_dir)
    mh_params = _minhash_params_sql()
    # shared unsigned shingle-hash CTE for the minhash/simhash oracles
    sketch_hu = f"""
      WITH hu AS (
        SELECT doc_id, {_UNSIGNED_H} AS x
        FROM read_parquet('{mh_fx}'))
    """
    return {
        "corpus_stats": f"""
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum({tc}) AS BIGINT) AS total_tokens,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars,
                   CAST(round(avg(length(text)), 4) AS DOUBLE) AS avg_chars
            FROM documents
        """,
        "word_counts": f"""
            WITH {_vocab_w_sql}
            SELECT word, count(*) AS cnt FROM w
            GROUP BY word HAVING count(*) >= 5
        """,
        "vocab_histogram": f"""
            WITH {_vocab_w_sql},
            c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
            b AS (SELECT CASE
                    WHEN cnt >= 93 THEN 93 WHEN cnt >= 62 THEN 62
                    WHEN cnt >= 41 THEN 41 WHEN cnt >= 27 THEN 27
                    WHEN cnt >= 18 THEN 18 WHEN cnt >= 12 THEN 12
                    WHEN cnt >= 8 THEN 8 WHEN cnt >= 5 THEN 5
                    WHEN cnt >= 3 THEN 3 WHEN cnt >= 2 THEN 2
                    ELSE 0 END AS bucket FROM c)
            SELECT bucket, count(*) AS n_words FROM b GROUP BY bucket
        """,
        "token_count": f"""
            SELECT doc_id, {tc} AS n_tokens, {bpe} AS n_bpe_tokens FROM documents
        """,
        "quality": f"""
            SELECT doc_id,
                   round({punct_ratio}, 6) AS punct_ratio,
                   {quality} AS quality
            FROM documents
        """,
        "langid": f"SELECT doc_id, {lang_case} AS lang_pred FROM documents",
        "langid_trigram": f"""
            SELECT doc_id, lang_pred, round(posterior, 6) AS posterior,
                   posterior >= 0.8 AS keep
            FROM read_parquet('{_ensure_lang_scores()}')
        """,
        "stopword_ratio": f"""
            SELECT doc_id, round({stop_ratio}, 6) AS stop_ratio FROM documents
        """,
        "fingerprint": f"SELECT doc_id, md5({norm_text}) AS fp FROM documents",
        "dedup_exact": f"""
            SELECT md5({norm_text}) AS fp, count(*) AS n_dups, min(doc_id) AS keeper
            FROM documents GROUP BY 1 HAVING count(*) > 1
        """,
        "dedup_survivors": f"""
            WITH r AS (
              SELECT doc_id, row_number() OVER (
                PARTITION BY md5({norm_text}) ORDER BY doc_id ASC) AS rn
              FROM documents)
            SELECT doc_id FROM r WHERE rn = 1
        """,
        "ngram_jaccard": shingle_cte + """
            SELECT id_a, id_b,
                   round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
        """,
        "topk_per_host": """
            WITH r AS (
              SELECT source AS host, doc_id, n_chars, row_number() OVER (
                PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rank
              FROM documents)
            SELECT host, doc_id, n_chars, rank FROM r WHERE rank <= 3
        """,
        "url_canonicalize": _canon_cte(_RAW_URL_SQL) + """
            SELECT doc_id, url, host_out AS host FROM canon
        """,
        "crawl_round_set": _canon_cte(_RAW_URL_SQL) + """
            , dedup AS (
              SELECT url, host_out AS host, 0 AS depth,
                     CAST(0 AS BIGINT) AS link_count
              FROM canon GROUP BY 1, 2
            )
            SELECT url, host, depth, link_count FROM dedup
            WHERE NOT (host = 'src1.ex.com' AND
                       (CASE WHEN contains(url, 'src1.ex.com/p') THEN true
                             ELSE false END))
        """,
        "emb_near_dups": """
            SELECT vec_id AS id_a, vec_id + 100000 AS id_b, 1.0::DOUBLE AS cosine
            FROM embeddings
        """,
        "ann_brute": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
            s AS (SELECT query_id, vec_id,
                         list_dot_product(qv, cv) /
                         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
                  FROM q CROSS JOIN c),
            r AS (SELECT query_id, vec_id, cos, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
                  FROM s)
            SELECT query_id, vec_id, round(cos, 6) AS cosine, rank
            FROM r WHERE rank <= 10
        """,
        # MinHash oracle: the xxhash64 shingle prefix comes from the
        # golden-tested pure-Python twin (fixture parquet); permutations
        # ((a*x+b) wraps mod 2^64, then mod 2^61-1 — numpy uint64
        # semantics made exact in HUGEINT), banding, bucket join and the
        # slot-equality Jaccard estimate are all recomputed in SQL.
        # shared minhash CTE chain (signatures -> bands -> candidates ->
        # per-pair equal-slot counts) for the near-dup and component oracles
        "minhash_near_dups": sketch_hu + f"""
            , params(i, a, b) AS (VALUES {mh_params}),
            sig AS (
              SELECT doc_id, p.i,
                     min((((p.a * x) % {_U64} + p.b) % {_U64}) % {_MH_PRIME}) AS v
              FROM hu CROSS JOIN params p GROUP BY 1, 2),
            bands AS (
              SELECT doc_id, i // 4 AS band, list(v ORDER BY i) AS bv
              FROM sig GROUP BY 1, 2),
            cand AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
              FROM bands l JOIN bands r
                ON l.band = r.band AND l.bv = r.bv AND l.doc_id < r.doc_id),
            eq AS (
              SELECT c.id_a, c.id_b,
                     sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS neq
              FROM cand c
              JOIN sig sa ON sa.doc_id = c.id_a
              JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
              GROUP BY 1, 2)
        """ + """
            SELECT id_a, id_b, round(neq / 64.0, 6) AS est_jaccard
            FROM eq WHERE neq / 64.0 >= 0.5
        """,
        # transitive closure over the near-dup pairs: comp = min id of
        # each connected component (DuckDB recursive CTE; the Spark side
        # is iterative min-label propagation)
        "neardup_components": sketch_hu.replace("WITH hu", "WITH RECURSIVE hu") + f"""
            , params(i, a, b) AS (VALUES {mh_params}),
            sig AS (
              SELECT doc_id, p.i,
                     min((((p.a * x) % {_U64} + p.b) % {_U64}) % {_MH_PRIME}) AS v
              FROM hu CROSS JOIN params p GROUP BY 1, 2),
            bands AS (
              SELECT doc_id, i // 4 AS band, list(v ORDER BY i) AS bv
              FROM sig GROUP BY 1, 2),
            cand AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
              FROM bands l JOIN bands r
                ON l.band = r.band AND l.bv = r.bv AND l.doc_id < r.doc_id),
            eq AS (
              SELECT c.id_a, c.id_b,
                     sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS neq
              FROM cand c
              JOIN sig sa ON sa.doc_id = c.id_a
              JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
              GROUP BY 1, 2)
        """ + """
            , pairs AS (
              SELECT id_a, id_b FROM eq WHERE neq / 64.0 >= 0.5),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs),
            reach(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
            SELECT src AS id, least(src, min(dst)) AS comp
            FROM reach GROUP BY src
        """,
        # SimHash oracle: per-bit majority votes, signed bit-pack, the
        # 4x16-bit Hamming block decomposition and the popcount filter,
        # from the same shingle-hash fixture.
        "simhash_near_dups": sketch_hu + f"""
            , bits(bit, pw) AS (VALUES {_BIT_PW_SQL}),
            votes AS (
              SELECT doc_id, b.bit, b.pw,
                     sum(CASE WHEN (x // b.pw) % 2 = 1 THEN 1 ELSE 0 END) AS nset,
                     count(*) AS n
              FROM hu CROSS JOIN bits b GROUP BY 1, 2, 3),
            sh AS (
              SELECT doc_id,
                     sum(CASE WHEN 2 * nset >= n THEN pw ELSE 0::HUGEINT END) AS su
              FROM votes GROUP BY 1),
            shs AS (
              SELECT doc_id, su,
                     CAST(CASE WHEN su >= {_I64_MIN_AS_U}
                               THEN su - {_U64} ELSE su END AS BIGINT) AS simhash
              FROM sh),
            blocks AS (
              SELECT doc_id, simhash,
                     CAST(su % 65536 AS BIGINT) AS b0,
                     CAST((su // 65536::HUGEINT) % 65536 AS BIGINT) AS b1,
                     CAST((su // 4294967296::HUGEINT) % 65536 AS BIGINT) AS b2,
                     CAST((su // 281474976710656::HUGEINT) % 65536 AS BIGINT) AS b3
              FROM shs),
            pairs AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                     l.simhash AS h_a, r.simhash AS h_b
              FROM blocks l JOIN blocks r
                ON l.doc_id < r.doc_id
               AND (l.b0 = r.b0 OR l.b1 = r.b1 OR l.b2 = r.b2 OR l.b3 = r.b3))
            SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming
            FROM pairs WHERE bit_count(xor(h_a, h_b)) <= 3
        """,
        # IVF oracle: centroids + (bitwise-deterministic) cell/probe
        # assignments come from the shared fixture; the probe equi-join,
        # exact cosine and per-query rank re-run in SQL.
        "ann_ivf": f"""
            WITH a AS (SELECT vec_id, cell FROM read_parquet('{ivf_fx["assign"]}')),
            p AS (SELECT query_id, cell FROM read_parquet('{ivf_fx["probes"]}')),
            c AS (SELECT e.vec_id, a.cell, e.embedding::DOUBLE[] AS cv
                  FROM embeddings e JOIN a USING (vec_id)),
            q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id < 5),
            s AS (SELECT p.query_id, c.vec_id,
                         list_dot_product(qv, cv) /
                         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
                  FROM p JOIN c USING (cell) JOIN q USING (query_id)),
            r AS (SELECT query_id, vec_id, cos, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
                  FROM s)
            SELECT query_id, vec_id, round(cos, 6) AS cosine, rank
            FROM r WHERE rank <= 10
        """,
        # Multimodal oracles: the decode-contract columns (metadata
        # derived from sha256(ref) bytes, frame sampling, error flags)
        # recomputed in SQL; the stubbed pixel/waveform statistics are
        # RNG-backed and value-checked in pytest instead.
        "media_features": f"""
            WITH refs AS (
              SELECT 'http://' || source || '.ex.com/img' || doc_id || '.jpg'
                       AS media_ref
              FROM documents WHERE doc_id < 64),
            h AS (SELECT media_ref, sha256(media_ref) AS hx FROM refs)
            SELECT media_ref, true AS ok,
                   CAST(64 + {_hex_byte("hx", 0)} % 192 AS INT) AS width,
                   CAST(64 + {_hex_byte("hx", 1)} % 192 AS INT) AS height,
                   8 AS feat_dim
            FROM h
        """,
        "audio_features": f"""
            WITH refs AS (
              SELECT 'http://' || source || '.ex.com/a' || doc_id || '.wav'
                       AS media_ref
              FROM documents WHERE doc_id < 48),
            h AS (SELECT media_ref, sha256(media_ref) AS hx FROM refs),
            m AS (SELECT media_ref,
                         8000 + {_hex_byte("hx", 2)} * 16 AS sr,
                         1000 + {_hex_byte("hx", 3)} * 20 AS dur
                  FROM h)
            SELECT media_ref, true AS ok,
                   CAST(least(floor(sr * dur / 1000.0), 262144) AS INT) AS n_samples
            FROM m
        """,
        "video_frames": f"""
            WITH refs AS (
              SELECT 'http://' || source || '.ex.com/v' || doc_id || '.mp4'
                       AS media_ref
              FROM documents WHERE doc_id < 16),
            h AS (SELECT media_ref, sha256(media_ref) AS hx FROM refs),
            m AS (SELECT media_ref,
                         64 + {_hex_byte("hx", 0)} % 192 AS w,
                         64 + {_hex_byte("hx", 1)} % 192 AS hgt,
                         1000 + {_hex_byte("hx", 3)} * 20 AS dur
                  FROM h)
            SELECT m.media_ref || '#t=' || t AS media_ref, true AS ok,
                   CAST(w AS INT) AS width, CAST(hgt AS INT) AS height,
                   8 AS feat_dim
            FROM m, unnest(generate_series(0, dur, 1000)) AS u(t)
        """,
        "resize_plan": """
            WITH m AS (
              SELECT 'http://' || source || '/img' || doc_id AS media_ref,
                     'image' AS kind,
                     CAST(doc_id % 1000 + 100 AS INT) AS width,
                     CAST(doc_id % 700 + 80 AS INT) AS height
              FROM documents),
            s AS (SELECT *, least(1.0, 256.0 / greatest(width, height)) AS sc FROM m)
            SELECT media_ref, kind, width, height,
                   CAST(round(width * sc, 0) AS INT) AS out_width,
                   CAST(round(height * sc, 0) AS INT) AS out_height
            FROM s
        """,
        "sessionize": """
            WITH o AS (
              SELECT user_id, ts, event_id, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
              SELECT *, CAST(sum(brk) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
              FROM o
            )
            SELECT user_id, session_id,
                   min(ts) AS session_start, max(ts) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM s GROUP BY 1, 2
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
                   event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "host_counts": _canon_cte(_RAW_URL_SQL) + """
            SELECT host_out AS host, count(*) AS n_urls FROM canon GROUP BY 1
        """,
        # expected robots.txt parse result for the deterministic bodies
        # q_robots_parse synthesizes (ccdbp group beats '*', so deny/allow
        # come from the specific group and crawl_delay is 0.5)
        # WARC oracle: expected response-record table recomputed from
        # the documents view (the Spark side must build the WARC bytes
        # and parse them back to reach the same rows).
        "warc_parse": """
            WITH g AS (
              SELECT doc_id, source, text,
                     CAST(doc_id // 16 AS INT) AS file_id
              FROM documents)
            SELECT 'warc-' || file_id AS src,
                   CAST(row_number() OVER (
                     PARTITION BY file_id ORDER BY doc_id) - 1 AS INT) AS record_ndx,
                   'http://' || source || '.ex.com/doc' || doc_id AS url,
                   200 AS http_status,
                   'text/html; charset=utf-8' AS content_type,
                   CAST(octet_length(encode(text)) AS INT) AS body_len,
                   false AS truncated
            FROM g
        """,
        "robots_parse": """
            SELECT source || '.ex.com' AS host,
                   '/deny-' || source || '/' AS deny,
                   '/deny-' || source || '/ok/' AS allow,
                   0.5 AS crawl_delay_s
            FROM (SELECT DISTINCT source FROM documents)
        """,
        # rule-tokenizer divergence oracle: the template's rule
        # tokenization is hand-encoded as length arithmetic (19 tokens,
        # w1@1, w2@5, w3@12, hash@16 + hash_join@[16,18) + join@17),
        # independent of the Python tokenizer — see
        # q_gazetteer_mentions_ruletok. Prefix lengths: 'Dr. '=4,
        # ' said: ('=8, ')! don't miss the '=18, ', or the '=9,
        # 'hash'=4, ' join'=+5/-... trailing '.' not matched.
        "gazetteer_mentions_ruletok": f"""
            WITH gw(idx, word) AS (VALUES {", ".join(
                f"({i}, '{w}')" for i, w in enumerate(GAZ_WORDS))}),
            d AS (
              SELECT doc_id, g1.word AS w1, g2.word AS w2, g3.word AS w3,
                     length(g1.word) AS l1, length(g2.word) AS l2,
                     length(g3.word) AS l3
              FROM documents
              JOIN gw g1 ON g1.idx = doc_id % 10
              JOIN gw g2 ON g2.idx = (doc_id + 3) % 10
              JOIN gw g3 ON g3.idx = (doc_id + 7) % 10)
            SELECT doc_id, 'ent:' || w1 AS entity_id,
                   1 AS tok_start, 2 AS tok_end,
                   4 AS char_start, CAST(4 + l1 AS INT) AS char_end
            FROM d
            UNION ALL
            SELECT doc_id, 'ent:' || w2, 5, 6,
                   CAST(l1 + 12 AS INT), CAST(l1 + 12 + l2 AS INT) FROM d
            UNION ALL
            SELECT doc_id, 'ent:' || w3, 12, 13,
                   CAST(l1 + l2 + 30 AS INT),
                   CAST(l1 + l2 + 30 + l3 AS INT) FROM d
            UNION ALL
            SELECT doc_id, 'ent:hash', 16, 17,
                   CAST(l1 + l2 + l3 + 39 AS INT),
                   CAST(l1 + l2 + l3 + 43 AS INT) FROM d
            UNION ALL
            SELECT doc_id, 'ent:hash_join', 16, 18,
                   CAST(l1 + l2 + l3 + 39 AS INT),
                   CAST(l1 + l2 + l3 + 48 AS INT) FROM d
            UNION ALL
            SELECT doc_id, 'ent:join', 17, 18,
                   CAST(l1 + l2 + l3 + 44 AS INT),
                   CAST(l1 + l2 + l3 + 48 AS INT) FROM d
        """,
        "gazetteer_mentions": _MENTION_CTE_UNBOUNDED + """
            SELECT doc_id, entity_id, cstart AS char_start, cend AS char_end
            FROM ment
        """,
        # BuildGazetteer corpus-count label filter: corpus counts from
        # the same (unbounded) gazetteer-match CTE, then the keep
        # predicate count>=min AND (multiword OR integer OR count<=max)
        "gazetteer_label_filter": _MENTION_CTE_UNBOUNDED + f"""
            , cnts AS (
              SELECT entity_id AS id, count(*) AS cnt FROM ment GROUP BY 1),
            labels(id, label) AS (VALUES {_LABELS_SQL}),
            tok AS (
              SELECT l.id, l.label,
                     CAST(COALESCE(c.cnt, 0) AS BIGINT) AS count,
                     string_split_regex(trim(l.label), '\\s+') AS tokens
              FROM labels l LEFT JOIN cnts c USING (id))
            SELECT id, label, count,
                   array_to_string(tokens, ' ') AS tokens
            FROM tok
            WHERE count >= 1 AND len(tokens) > 0 AND tokens[1] <> ''
              AND (len(tokens) > 1
                   -- exact Integer.parseInt acceptance, the same shared
                   -- pure-string check as kb.filter_gazetteer_labels
                   OR {_parseint_sql('tokens[1]')}
                   OR count <= 900)
        """,
        # P12 overlap cleanup: matches with 0-based token spans; drop a
        # <=1-token match lying inside a strictly-longer same-doc match
        "gazetteer_overlap_clean": f"""
            WITH sp AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            widx AS (
              SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS ord FROM sp),
            toks AS (
              SELECT doc_id, w[ord] AS word, CAST(ord AS INT) AS ord FROM widx),
            m AS (
              SELECT doc_id, 'ent:' || word AS entity_id,
                     ord - 1 AS tok_start, ord AS tok_end
              FROM toks WHERE word IN {_GAZ_WORDS_SQL}
              UNION ALL
              SELECT a.doc_id, 'ent:' || a.word || '_' || b.word,
                     a.ord - 1, a.ord + 1
              FROM toks a JOIN toks b
                ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
              WHERE (a.word, b.word) IN ({_GAZ_PHRASES_SQL}))
            SELECT doc_id, entity_id, tok_start, tok_end FROM m
            WHERE NOT (
              tok_end - tok_start <= 1
              AND EXISTS (
                SELECT 1 FROM m l
                WHERE l.doc_id = m.doc_id
                  AND l.tok_start <= m.tok_start AND l.tok_end >= m.tok_end
                  AND (l.tok_end - l.tok_start) > (m.tok_end - m.tok_start)))
        """,
        # F3 token-window pairs, reference forward-scan semantics
        # (CreateTsvDatasetTokenWindow.java:165-176): center scans
        # mentions after it in (tok_start, tok_end) order and keeps those
        # whose token END <= center token end + 4; ids normalized id1<id2
        "mention_pairs_window": f"""
            WITH sp AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            widx AS (
              SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS ord FROM sp),
            toks AS (
              SELECT doc_id, w[ord] AS word, CAST(ord AS INT) AS ord FROM widx),
            ment AS (
              SELECT doc_id, 'ent:' || word AS entity_id,
                     ord - 1 AS t, ord AS e
              FROM toks WHERE word IN {_GAZ_WORDS_SQL}
              UNION ALL
              SELECT a.doc_id, 'ent:' || a.word || '_' || b.word,
                     a.ord - 1, a.ord + 1
              FROM toks a JOIN toks b
                ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
              WHERE (a.word, b.word) IN ({_GAZ_PHRASES_SQL})),
            -- annotation order = Span.compareTo (start asc, LONGER first),
            -- entity_id asc as the deterministic equal-span stand-in
            ordent AS (
              SELECT *, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY t ASC, e DESC, entity_id ASC) AS pos
              FROM ment),
            -- reference forward scan BREAKS at the first successor whose
            -- token end exceeds center.e + window: y pairs only when no
            -- entity between center and y (inclusive) violates the bound
            pairs AS (
              SELECT x.doc_id, x.entity_id AS xid, y.entity_id AS yid,
                     x.t AS xt, y.t AS yt
              FROM ordent x JOIN ordent y
                ON x.doc_id = y.doc_id
               AND y.pos > x.pos
               AND y.e <= x.e + 4
               AND x.entity_id <> y.entity_id
              WHERE NOT EXISTS (
                SELECT 1 FROM ordent k
                WHERE k.doc_id = x.doc_id
                  AND k.pos > x.pos AND k.pos < y.pos
                  AND k.e > x.e + 4))
            SELECT DISTINCT doc_id,
                   CASE WHEN xid < yid THEN xid ELSE yid END AS id1,
                   CASE WHEN xid < yid THEN yid ELSE xid END AS id2,
                   CASE WHEN xid < yid THEN xt ELSE yt END AS t1,
                   CASE WHEN xid < yid THEN yt ELSE xt END AS t2
            FROM pairs
        """,
        "mention_pairs": _MENTION_CTE + """
            SELECT doc_id, id1, id2, s1, e1, s2, e2, rewritten,
                   relations, is_positive
            FROM labeled
        """,
        "label_merge": """
            WITH nodes AS (
              SELECT 'n' || doc_id AS id,
                     (CASE WHEN doc_id % 2 = 0 THEN 'LAB' ELSE 'lab' END)
                       || (doc_id % 37) AS label,
                     CAST(n_chars AS DOUBLE) AS popularity
              FROM documents
            ),
            canon AS (
              SELECT lower(label) AS lab, id,
                     row_number() OVER (PARTITION BY lower(label)
                       ORDER BY popularity DESC, id ASC) AS rn
              FROM nodes
            )
            SELECT n.id, c.id AS canonical_id
            FROM nodes n JOIN canon c ON lower(n.label) = c.lab AND c.rn = 1
        """,
        "uri_labels": """
            WITH u AS (
              SELECT doc_id,
                     'http://kb.example/resource/Item_' || doc_id ||
                     (CASE WHEN doc_id % 3 = 0 THEN '_(thing)' ELSE '' END) AS uri
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                     replace(string_split(uri, '/')[-1], '_', ' '),
                     '\\s*\\([^)]*\\)\\s*$', '') AS label
            FROM u
        """,
        "select_types": """
            WITH c AS (
              SELECT source AS type, count(*) AS n_members
              FROM documents GROUP BY 1 HAVING count(*) >= 10
            )
            SELECT type, n_members FROM c
            ORDER BY n_members DESC, type ASC LIMIT 5
        """,
        "taxonomy_expand": f"""
            WITH triples(arg1, rel, arg2) AS (VALUES {_TRIPLES_SQL}),
            closure(rel, super_rel) AS (VALUES {
                ", ".join(f"('{a}', '{b}')" for a, b in TAXONOMY_CLOSURE)
            }),
            ex AS (
              SELECT arg1, rel, arg2 FROM triples
              UNION
              SELECT t.arg1, c.super_rel AS rel, t.arg2
              FROM triples t JOIN closure c ON c.rel = t.rel
            )
            SELECT DISTINCT arg1, rel, arg2 FROM ex
        """,
        # fixture page: title + header + doc-text paragraph (subject to
        # the min-5-words block filter) + a constant paragraph carrying
        # nested <b> and an inline <a> + a dropped 2-word paragraph + a
        # standalone link. Offsets/indices recomputed analytically.
        "html_extract": """
            WITH base AS (
              SELECT 'http://' || source || '/' || doc_id AS doc_id,
                     source || ' ' || doc_id AS title,
                     'Sec ' || doc_id AS header,
                     text,
                     len(string_split_regex(trim(text), '\\s+')) >= 5 AS kept,
                     'http://' || source || '.ex.com/p/' || doc_id AS href
              FROM documents
            ),
            o AS (
              SELECT *,
                     CAST(length(title) + 2 AS INT) AS off1,
                     CAST(length(title) + 2 + length(header) + 1 AS INT) AS off2
              FROM base
            ),
            o2 AS (
              SELECT *, CAST(off2 + CASE WHEN kept
                       THEN length(text) + 1 ELSE 0 END AS INT) AS off3
              FROM o
            )
            SELECT doc_id, 'utf-8' AS charset, 0 AS span_idx,
                   'title' AS kind, title AS text,
                   NULL AS media_ref, 0 AS offset
            FROM o2
            UNION ALL
            SELECT doc_id, 'utf-8', 1, 'section_header', header, NULL, off1 FROM o2
            UNION ALL
            SELECT doc_id, 'utf-8', 2, 'paragraph', text, NULL, off2
            FROM o2 WHERE kept
            UNION ALL
            SELECT doc_id, 'utf-8', CASE WHEN kept THEN 3 ELSE 2 END, 'paragraph',
                   'alpha beta gamma delta inline link omega', NULL, off3 FROM o2
            UNION ALL
            SELECT doc_id, 'utf-8', CASE WHEN kept THEN 4 ELSE 3 END,
                   'text_formatting', 'beta gamma', NULL, CAST(off3 + 6 AS INT) FROM o2
            UNION ALL
            SELECT doc_id, 'utf-8', CASE WHEN kept THEN 5 ELSE 4 END, 'link',
                   'inline link', 'http://x.ex.com/in', CAST(off3 + 23 AS INT) FROM o2
            UNION ALL
            SELECT doc_id, 'utf-8', CASE WHEN kept THEN 6 ELSE 5 END, 'link',
                   'more', href, CAST(off3 + 41 AS INT) FROM o2
        """,
        "html_extract_density": """
            WITH base AS (
              SELECT 'http://' || source || '/' || doc_id AS doc_id,
                     source || ' ' || doc_id AS title,
                     text,
                     len(string_split_regex(trim(text), '\\s+')) AS wc
              FROM documents
            ),
            o AS (
              -- NumWordsRules against ORIGINAL neighbors: the main
              -- paragraph (prev = all-link nav, linkDensity 1 >
              -- 0.555556; next = 2-word tail <= 17) survives only with
              -- > 40 words; the tail survives iff its prev (the main
              -- paragraph BLOCK, kept or not) has > 4 words — an empty
              -- text emits no main block, the tail's prev becomes the
              -- nav, and the tail drops too
              SELECT *, CAST(length(title) + 2 AS INT) AS off1,
                     wc > 40 AS kept,
                     length(trim(text)) > 0 AND wc > 4 AS tail_kept
              FROM base)
            SELECT doc_id, 'utf-8' AS charset, 0 AS span_idx, 'title' AS kind,
                   title AS text, NULL AS media_ref, 0 AS offset
            FROM o
            UNION ALL
            SELECT doc_id, 'utf-8', 1, 'paragraph', text, NULL, off1
            FROM o WHERE kept
            UNION ALL
            SELECT doc_id, 'utf-8', CASE WHEN kept THEN 2 ELSE 1 END,
                   'paragraph', 'short tail', NULL,
                   CAST(CASE WHEN kept THEN off1 + length(text) + 1
                        ELSE off1 END AS INT)
            FROM o WHERE tail_kept
        """,
        "vocab_autotune": f"""
            WITH {_vocab_w_sql},
            c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
            ladder(t) AS (VALUES (1),(2),(3),(5),(8),(12),(18),(27),(41),(62),(93)),
            surv AS (
              SELECT t, (SELECT count(*) FROM c WHERE cnt >= t) AS n FROM ladder
            ),
            pick AS (
              SELECT coalesce(min(t), 93) AS mc FROM surv WHERE n <= 20
            )
            SELECT (SELECT mc FROM pick) AS min_count, word, cnt
            FROM c WHERE cnt >= (SELECT mc FROM pick)
        """,
        "relex_stats": _MENTION_CTE + """
            , per_rel AS (
              SELECT unnest(string_split(relations, ',')) AS relation
              FROM labeled WHERE relations <> ''
            )
            SELECT relation, count(*) AS n_mentions FROM per_rel GROUP BY relation
            UNION ALL
            SELECT '__all__', count(*) FROM labeled
        """,
        "mention_groups": _MENTION_CTE + """
            , dedup AS (
              SELECT DISTINCT id1, id2, s1, e1, s2, e2, text, is_positive
              FROM labeled
            ),
            stats AS (
              SELECT id1, id2, count(*) AS n FROM labeled GROUP BY 1, 2
            ),
            grouped AS (
              SELECT d.id1, d.id2, count(*) AS set_size,
                     bool_or(d.is_positive) AS positive
              FROM dedup d JOIN stats s ON s.id1 = d.id1 AND s.id2 = d.id2
              WHERE s.n >= 2
              GROUP BY 1, 2
            )
            SELECT id1, id2, set_size, positive FROM grouped
            WHERE set_size >= 2
        """,
        # M14 tensor oracle: the full groups -> round-robin chunks ->
        # vocab-indexed word row + ARGONE/ARGTWO position rows + pool
        # pieces + sentence starts, recomputed in SQL from the same
        # documents view (vocab = min-count-5 word counts ranked
        # (cnt desc, word asc), exactly the Spark side's spec).
        "tensor_lines": _MENTION_CTE + f"""
            , dedupt AS (
              SELECT DISTINCT id1, id2, s1, e1, s2, e2, text, rewritten, is_positive
              FROM labeled
            ),
            stats AS (
              SELECT id1, id2, count(*) AS n FROM labeled GROUP BY 1, 2
            ),
            grp AS (
              SELECT d.id1, d.id2,
                     bool_or(d.is_positive) AS positive,
                     list(d.rewritten ORDER BY d.rewritten) AS contexts
              FROM dedupt d JOIN stats s ON s.id1 = d.id1 AND s.id2 = d.id2
              WHERE s.n >= 2
              GROUP BY 1, 2
              HAVING count(*) >= 2
            ),
            cdef AS (
              SELECT *, CAST(ceil(len(contexts) / 5.0) AS INT) AS n_chunks
              FROM grp
            ),
            chunks AS (
              SELECT id1, id2, positive, CAST(ch AS INT) AS chunk,
                     list_transform(
                       list_filter(range(0, len(contexts)), i -> i % n_chunks = ch),
                       i -> contexts[i + 1]) AS members
              FROM cdef, unnest(range(0, n_chunks)) AS u(ch)
            ),
            sents AS (
              SELECT id1, id2, positive, chunk, CAST(i AS INT) AS sent_ndx,
                     regexp_split_to_array(
                       trim(regexp_replace(
                         regexp_replace(members[i + 1],
                                        '(^|[^A-Za-z0-9])(ARGONE|ARGTWO)',
                                        '\\1 \\2', 'g'),
                         '(ARGONE|ARGTWO)($|[^A-Za-z0-9])',
                         '\\1 \\2', 'g')),
                       '\\s+') AS toks
              FROM chunks, unnest(range(0, len(members))) AS u(i)
              WHERE len(members) > 0
            ),
            keep AS (
              SELECT *, list_position(toks, 'ARGONE') - 1 AS a1,
                        list_position(toks, 'ARGTWO') - 1 AS a2,
                        len(toks) AS n
              FROM sents
              WHERE list_position(toks, 'ARGONE') IS NOT NULL
                AND list_position(toks, 'ARGTWO') IS NOT NULL
            ),
            {_vocab_w_sql},
            vocab AS (
              -- same counting CTE as word_counts/vocab_histogram
              -- (_vocab_w_sql): one definition of the twin semantics
              SELECT word,
                     CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) - 1
                          AS INT) AS vndx
              FROM (
                SELECT word, count(*) AS cnt FROM w
                GROUP BY 1 HAVING count(*) >= 5)
            ),
            tokrows AS (
              SELECT k.id1, k.id2, k.chunk, k.sent_ndx, k.positive,
                     CAST(i AS INT) AS wi, lower(k.toks[i + 1]) AS w,
                     k.a1, k.a2, k.n
              FROM keep k, unnest(range(0, len(k.toks))) AS u(i)
            ),
            wmap AS (
              -- OOV integer fallback (RelexTensors.java:170-175): vocab
              -- miss + parseInt-accepted token resolves to its '#'-digit
              -- twin of the same string length before the final -1
              SELECT t.id1, t.id2, t.chunk, t.sent_ndx, t.positive,
                     t.wi, t.w, t.a1, t.a2, t.n,
                     CAST(COALESCE(v.vndx, d.vndx, -1) AS INT) AS wndx
              FROM tokrows t
              LEFT JOIN vocab v ON v.word = t.w
              LEFT JOIN vocab d
                ON v.word IS NULL AND {_parseint_sql('t.w')}
               AND d.word = repeat('#', length(t.w))
            ),
            persent AS (
              SELECT id1, id2, chunk, sent_ndx,
                     any_value(positive) AS positive,
                     list(wndx ORDER BY wi) AS words,
                     list(CAST(greatest(0, 32 - abs(wi - a1)) AS INT) ORDER BY wi) AS pos1,
                     list(CAST(greatest(0, 32 - abs(wi - a2)) AS INT) ORDER BY wi) AS pos2,
                     CAST(any_value(greatest(1, least(a1, a2))) AS INT) AS pool_start,
                     CAST(any_value(least(n - 1, greatest(a1, a2) + 1)) AS INT) AS pool_end,
                     CAST(any_value(n) AS INT) AS sz
              FROM wmap GROUP BY 1, 2, 3, 4
            ),
            perchunk AS (
              SELECT id1, id2, chunk, any_value(positive) AS positive,
                     flatten(list(words ORDER BY sent_ndx)) AS words,
                     flatten(list(pos1 ORDER BY sent_ndx)) AS pos1,
                     flatten(list(pos2 ORDER BY sent_ndx)) AS pos2,
                     list(pool_start ORDER BY sent_ndx) AS pool_starts,
                     list(pool_end ORDER BY sent_ndx) AS pool_ends,
                     list(sz ORDER BY sent_ndx) AS sizes
              FROM persent GROUP BY 1, 2, 3
            )
            SELECT id1, id2, chunk, positive,
                   COALESCE(array_to_string(words, ','), '') AS words,
                   COALESCE(array_to_string(pos1, ','), '') AS pos1,
                   COALESCE(array_to_string(pos2, ','), '') AS pos2,
                   COALESCE(array_to_string(pool_starts, ','), '') AS pool_starts,
                   COALESCE(array_to_string(pool_ends, ','), '') AS pool_ends,
                   COALESCE(array_to_string(
                     list_transform(range(0, len(sizes)),
                       i -> CAST(COALESCE(list_sum(sizes[1:i]), 0) AS INT)),
                     ','), '') AS sent_starts
            FROM perchunk
        """,
        "outlinks": "WITH links AS ("
        "  SELECT row_number() OVER () AS rid, s.media_ref AS ref"
        f"  FROM (SELECT unnest(spans) AS s FROM read_parquet('{fx}'))"
        "  WHERE s.kind = 'link' AND s.media_ref IS NOT NULL), "
        + _canon_cte("ref", key_cols="rid", src="links", lead="")
        + """
            SELECT host_out AS host, count(*) AS inlinks FROM canon GROUP BY 1
        """,
        # the FULL 3-round crawl, unrolled round-by-round in SQL (see
        # _multiround_oracle_sql) — schedule order, positions, seen-set,
        # frontier and credit feedback all recomputed independently.
        "crawl_multiround": _multiround_oracle_sql(_fd_dir, crawl_ties, 3),
        # streaming ingest seam: 2 micro-batches (seeds file + empty
        # file) == the batch crawl's first 2 rounds, so the oracle is
        # the same unrolled CTE cut at 2 rounds — prefix-stable because
        # round r never depends on round r+1
        "crawl_stream_rounds": _multiround_oracle_sql(_fd_dir, crawl_ties, 2),
        # OPIC oracle: the 2-round cash propagation UNROLLED into chained
        # CTEs (fixed n_rounds makes the iteration SQL-expressible) —
        # same float op order as kb.opic_scores (uniform computed as
        # ((1-d)*total + d*dangling)/n, inflow as cash*d/outdeg); the
        # 8-decimal round absorbs summation-order noise.
        "opic_scores": "WITH links AS ("
        "  SELECT d.doc_id AS src, s.media_ref AS ref,"
        "         row_number() OVER () AS rid"
        f"  FROM (SELECT doc_id, unnest(spans) AS s FROM read_parquet('{fx}')) d"
        "  WHERE s.kind = 'link' AND s.media_ref IS NOT NULL), "
        + _canon_cte("ref", key_cols="rid, src", src="links", lead="")
        + """
            , edges AS (SELECT src, url AS dst FROM canon),
            nodes AS (
              SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges) t),
            outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
            params AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
            r0 AS (
              SELECT node, 1.0 / (SELECT n FROM params) AS cash, 0.0 AS history
              FROM nodes),
            f0 AS (
              SELECT r.node, r.cash, r.history, COALESCE(o.outdeg, 0) AS outdeg
              FROM r0 r LEFT JOIN outdeg o ON o.src = r.node),
            t0 AS (
              SELECT e.dst AS node, sum(f.cash * 0.85 / f.outdeg) AS inflow
              FROM f0 f JOIN edges e ON e.src = f.node
              WHERE f.outdeg > 0 GROUP BY 1),
            a0 AS (
              SELECT sum(cash) AS total,
                     sum(CASE WHEN outdeg = 0 THEN cash ELSE 0.0 END) AS dangling
              FROM f0),
            r1 AS (
              SELECT f.node,
                     COALESCE(t.inflow, 0.0)
                       + ((1.0 - 0.85) * a.total + 0.85 * a.dangling)
                         / (SELECT n FROM params) AS cash,
                     f.history + f.cash AS history
              FROM f0 f LEFT JOIN t0 t USING (node) CROSS JOIN a0 a),
            f1 AS (
              SELECT r.node, r.cash, r.history, COALESCE(o.outdeg, 0) AS outdeg
              FROM r1 r LEFT JOIN outdeg o ON o.src = r.node),
            t1 AS (
              SELECT e.dst AS node, sum(f.cash * 0.85 / f.outdeg) AS inflow
              FROM f1 f JOIN edges e ON e.src = f.node
              WHERE f.outdeg > 0 GROUP BY 1),
            a1 AS (
              SELECT sum(cash) AS total,
                     sum(CASE WHEN outdeg = 0 THEN cash ELSE 0.0 END) AS dangling
              FROM f1),
            r2 AS (
              SELECT f.node,
                     COALESCE(t.inflow, 0.0)
                       + ((1.0 - 0.85) * a.total + 0.85 * a.dangling)
                         / (SELECT n FROM params) AS cash,
                     f.history + f.cash AS history
              FROM f1 f LEFT JOIN t1 t USING (node) CROSS JOIN a1 a)
            SELECT node, round(history + cash, 8) AS history FROM r2
        """,
        "w2v_lines": f"""
            -- mirrors spans.w2v_sentences on the no-overlap fixture:
            -- Java trim ([\\x00-\\x20] at either end) then lowercase +
            -- whitespace->'_'; the engine's stateful prevEnd overlap
            -- drop is a no-op here (fixture has no overlapping texty
            -- spans) and is pinned by test_w2v_overlap_drop instead.
            -- PRECONDITION (asserted by
            -- test_w2v_fixture_oracle_precondition): fixture texty
            -- spans are already in (offset asc, longer first) order,
            -- so rendering in ARRAY order matches the engine's sort
            WITH r AS (
              SELECT doc_id,
                     array_to_string(
                       list_transform(
                         list_filter(spans, s ->
                           s.kind IN ('text', 'title', 'paragraph', 'section_header')
                           AND s.text <> ''),
                         s -> regexp_replace(
                                lower(regexp_replace(s.text,
                                  '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g')),
                                '\\s+', '_', 'g')),
                       ' ') AS line
              FROM read_parquet('{fx}'))
            SELECT doc_id, line FROM r WHERE line <> ''
        """,
        "doc_split": f"""
            WITH d AS (
              SELECT doc_id, len(spans) AS n FROM read_parquet('{fx}')
            ),
            parts AS (
              SELECT doc_id, n,
                     unnest(range(0, CAST(ceil(n / 8.0) AS BIGINT))) AS part
              FROM d WHERE n > 0
            )
            SELECT doc_id || '#' || CAST(part AS VARCHAR) AS doc_id,
                   CAST(part AS INT) AS part,
                   CAST(least(8, n - part * 8) AS INT) AS n_spans,
                   0 AS first_offset
            FROM parts
        """,
        "span_invariant": f"""
            WITH chk AS (
              SELECT list_transform(spans, s -> s.offset) AS offs,
                     list_transform(
                       list_filter(spans, s -> s.kind IN ('link', 'media')),
                       s -> s.offset) AS poffs
              FROM read_parquet('{fx}'))
            SELECT count(*) AS n_docs,
                   CAST(sum(CASE WHEN offs = list_sort(offs) THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_sorted,
                   'raw' AS stage
            FROM chk
            UNION ALL
            SELECT count(*),
                   CAST(sum(CASE WHEN poffs = list_sort(poffs) THEN 1 ELSE 0 END)
                        AS BIGINT),
                   'kind_projected'
            FROM chk
        """,
        "doc_json_roundtrip": f"""
            SELECT count(*) AS n_docs, count(*) AS n_roundtrip_equal
            FROM read_parquet('{fx}')
        """,
        "doc_downsample": f"""
            SELECT doc_id FROM read_parquet('{doc_draws}') WHERE draw < 0.3
        """,
        "mention_downsample": _MENTION_CTE + f"""
            , draws(id1, id2, neg_draw, split) AS (VALUES {pair_draws}),
            kept AS (
              -- phase-1 boundary: reference skips on draw > fraction,
              -- i.e. KEEPS on <= (CreateTsvDataset.java:198-204)
              SELECT l.* FROM labeled l JOIN draws d USING (id1, id2)
              WHERE l.is_positive OR d.neg_draw <= 0.25
            ),
            groups AS (
              SELECT id1, id2, bool_or(is_positive) AS positive
              FROM kept GROUP BY 1, 2
            )
            SELECT d.split, count(*) AS n_groups,
                   CAST(sum(CASE WHEN g.positive THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_positive
            FROM groups g JOIN draws d USING (id1, id2)
            GROUP BY 1
        """,
        # two-phase retune: phase-1 fraction 0.5, target neg:pos ratio 1.0,
        # tolerance 1.05; retain prob rescaled on the SAME D3 draw
        # (RelexTsvDataset.java:120-157)
        "mention_downsample_ratio": _MENTION_CTE + f"""
            , draws(id1, id2, neg_draw, split) AS (VALUES {pair_draws}),
            p1 AS (
              -- phase-1 keeps on <= (skip when draw > fraction)
              SELECT l.* FROM labeled l JOIN draws d USING (id1, id2)
              WHERE l.is_positive OR d.neg_draw <= 0.5
            ),
            g1 AS (
              SELECT id1, id2, bool_or(is_positive) AS positive
              FROM p1 GROUP BY 1, 2
            ),
            st AS (
              SELECT count(*) AS total,
                     CAST(sum(CASE WHEN positive THEN 1 ELSE 0 END)
                          AS BIGINT) AS npos
              FROM g1
            ),
            -- p = rescaled retain when the rescale branch fires, else
            -- NULL (= keep phase-1). npos=0 with rows present mirrors
            -- the reference's Infinity ratio -> retain 0.0 (drop every
            -- negative; RelexTsvDataset.java:134-146); total=0 is the
            -- NaN-comparison no-rescale path
            rt AS (
              SELECT CASE
                WHEN total = 0 THEN NULL
                WHEN npos <= 0 THEN 0.0
                WHEN (total - npos) * 1.0 / npos > 1.05 * 1.0
                  THEN 0.5 * (1.0 / ((total - npos) * 1.0 / npos))
                ELSE NULL END AS p
              FROM st
            ),
            kept AS (
              -- rescale phase keeps on STRICT < retain; the no-rescale
              -- path is the phase-1 (<=) set unchanged
              SELECT l.* FROM labeled l JOIN draws d USING (id1, id2)
              CROSS JOIN rt
              WHERE l.is_positive OR
                    (CASE WHEN rt.p IS NULL THEN d.neg_draw <= 0.5
                          ELSE d.neg_draw < rt.p END)
            ),
            g2 AS (
              SELECT id1, id2, bool_or(is_positive) AS positive
              FROM kept GROUP BY 1, 2
            )
            SELECT count(*) AS n_groups,
                   CAST(sum(CASE WHEN positive THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_positive,
                   round(COALESCE((SELECT p FROM rt), 0.5), 6) AS retain_prob
            FROM g2
        """,
        # J2 + P10: type resolution (unk/multiType) + unordered-pair allowlist
        "mention_types": _MENTION_CTE + f"""
            , typ(id, type) AS (VALUES {types_sql}),
            resolved AS (
              SELECT id, CASE WHEN count(DISTINCT type) > 1 THEN 'multiType'
                              ELSE min(type) END AS etype
              FROM typ GROUP BY id),
            pairs AS (SELECT DISTINCT id1, id2 FROM labeled),
            typed AS (
              SELECT p.id1, p.id2,
                     COALESCE(r1.etype, 'unk') AS type1,
                     COALESCE(r2.etype, 'unk') AS type2
              FROM pairs p
              LEFT JOIN resolved r1 ON r1.id = p.id1
              LEFT JOIN resolved r2 ON r2.id = p.id2),
            allowed(type_a, type_b) AS (VALUES {allowed_sql})
            SELECT id1, id2, type1, type2 FROM typed t
            WHERE EXISTS (
              SELECT 1 FROM allowed a
              WHERE a.type_a = least(t.type1, t.type2)
                AND a.type_b = greatest(t.type1, t.type2))
        """,
        # J6: keep triples whose BOTH args clear the corpus-count bar
        "triple_counts": _MENTION_CTE_UNBOUNDED + f"""
            , cnts AS (
              SELECT entity_id AS id, count(*) AS cnt FROM ment GROUP BY 1)
            -- triples CTE comes with the mention chain
            SELECT t.arg1, t.rel, t.arg2
            FROM triples t
            JOIN cnts c1 ON c1.id = t.arg1 AND c1.cnt >= 900
            JOIN cnts c2 ON c2.id = t.arg2 AND c2.cnt >= 900
        """,
        # S8: same fixture file parsed with the same regexes in RE2
        "ntriples_parse": f"""
            WITH lines AS (
              SELECT unnest(string_split(content, chr(10))) AS value
              FROM read_text('{_ensure_text_fixture(_oracle_sf(), "nt")}')),
            keep AS (
              SELECT value FROM lines
              WHERE value <> '' AND value NOT LIKE '#%'),
            parsed AS (
              SELECT
                regexp_extract(value,
                  '^\\s*<([^>]*)>\\s+<([^>]*)>\\s+(.*?)\\s*\\.\\s*$', 1) AS arg1,
                regexp_extract(value,
                  '^\\s*<([^>]*)>\\s+<([^>]*)>\\s+(.*?)\\s*\\.\\s*$', 2) AS rel,
                regexp_extract(value,
                  '^\\s*<([^>]*)>\\s+<([^>]*)>\\s+(.*?)\\s*\\.\\s*$', 3) AS arg2_raw
              FROM keep)
            SELECT arg1, rel,
                   CASE WHEN arg2_raw LIKE '<%'
                        THEN regexp_extract(arg2_raw, '^<([^>]*)>', 1)
                        ELSE regexp_extract(arg2_raw,
                               '^"((?:[^"\\\\]|\\\\.)*)"', 1)
                   END AS arg2
            FROM parsed WHERE arg1 <> ''
        """,
        # S9: tab split, no quoting
        "tsv_scan": f"""
            SELECT name, CAST(triple AS BIGINT) AS triple, label
            FROM read_csv('{_ensure_text_fixture(_oracle_sf(), "tsv")}',
                          delim=chr(9), header=false, quote='',
                          columns={{'name': 'VARCHAR', 'triple': 'VARCHAR',
                                    'label': 'VARCHAR'}})
        """,
        # P9/D6: precomputed draw fixture
        "learning_curve": f"""
            SELECT doc_id FROM read_parquet('{_ensure_lc_draws()}')
            WHERE draw < 0.25
        """,
        # M10 + M12 over synthesized literals (same construction as the query)
        "literal_clean": """
            WITH raw AS (
              SELECT doc_id,
                     '  **The Item ' || doc_id
                     || CASE WHEN doc_id % 7 = 0
                        THEN ' carrying a very long tail that pushes it past the cap'
                        ELSE '' END
                     || CASE WHEN doc_id % 3 = 0 THEN ' (a note)' ELSE '' END
                     || '  ' AS lit_raw,
                     'a' || chr(9) || 'b' || chr(10) || 'c' || chr(13)
                     || doc_id AS tsv_raw
              FROM documents),
            cleaned AS (
              SELECT doc_id,
                     regexp_replace(
                       regexp_replace(
                         lower(trim(regexp_replace(
                           lit_raw, '\\s*\\([^)]*\\)\\s*$', ''))),
                         '^[[:space:][:punct:]]+|[[:space:][:punct:]]+$', '', 'g'),
                       '\\s+', '_', 'g') AS c,
                     replace(replace(replace(tsv_raw,
                       chr(9), ' '), chr(10), ' '), chr(13), ' ') AS tsv
              FROM raw)
            SELECT doc_id,
                   CASE WHEN c <> '' AND length(c) <= 40 THEN c END AS lit,
                   tsv
            FROM cleaned
        """,
    }
