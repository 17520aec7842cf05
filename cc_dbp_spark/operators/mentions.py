"""Relation-extraction mention pipeline — the reference's core dataset
build re-expressed as declarative DataFrame ops:

* sentence segmentation (explode; reference: Sentence annotations,
  ``kbp/.../CreateTsvDataset.java:130-177``)
* entity mentions via gazetteer (J3, :mod:`.gazetteer`)
* ordered entity-pair candidates per sentence with best
  (closest non-overlapping) span pair (F2 ``bestSpanPair``,
  ``CreateTsvDataset.java:81-98``)
* ARGONE/ARGTWO placeholder rewrite (M13, ``RelexMention.java:56-80``)
* ground-truth relation lookup both directions with ``<`` prefix for the
  reverse direction (J1, ``GroundTruth.getRelations``,
  ``kbp/.../GroundTruth.java:341-355``)
* deterministic negative downsampling (P2/D3, ``GroundTruth.java:213-241``)
* per-pair grouping: count + positive flag (A3), min-mention-set anti-join
  (P3/J4, ``RelexTsvDataset.java:187-199``), mention-set collection with
  dedup by uniqueness string (A4, ``RelexTsvDataset.java:229-249``)
* train/val/test split assignment by the D4 draw (``GroundTruth.java:184-205``)

All set/join/group logic is native Catalyst (broadcast joins for the tiny
GT side, anti-join for small groups, window for best-pair selection);
Python appears only in the gazetteer Arrow pass and the D3/D4 parity
draws.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cc_dbp_spark.functions import parity
from cc_dbp_spark.operators import gazetteer as gaz

_udf_cache: dict[str, object] = {}


def _neg_udf():
    if "neg" not in _udf_cache:
        from pyspark.sql.types import DoubleType

        @F.pandas_udf(DoubleType())
        def fn(id1: pd.Series, id2: pd.Series) -> pd.Series:
            return pd.Series(
                parity.negative_downsample_priority(id1.fillna(""), id2.fillna(""))
            )

        _udf_cache["neg"] = fn
    return _udf_cache["neg"]


def _split_udf():
    if "split" not in _udf_cache:
        from pyspark.sql.types import DoubleType

        @F.pandas_udf(DoubleType())
        def fn(id1: pd.Series, id2: pd.Series) -> pd.Series:
            return pd.Series(parity.split_location(id1.fillna(""), id2.fillna("")))

        _udf_cache["split"] = fn
    return _udf_cache["split"]


def sentences(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sent_id, sentence): split at sentence-final punctuation
    with abbreviation + single-initial guards and a capital/digit
    continuation requirement (tokenize.SENTENCE_SPLIT_REGEX — the
    rule-based stand-in for the reference's ClearNLPSentence annotator;
    "Dr. Smith arrived. He sat." splits once, not twice). Native
    F.split, zero Python stages; the pure-Python twin
    (tokenize.split_sentences) pins the boundary semantics in pytest."""
    from cc_dbp_spark.functions import tokenize as _tok

    parts = F.split(F.col(text_col), _tok.SENTENCE_SPLIT_REGEX)
    return docs.select(
        F.col(id_col),
        F.posexplode(parts).alias("sent_id", "sentence"),
    ).filter(F.col("sentence") != "")


def sentence_bounds(
    sents: DataFrame,
    sent_col: str = "sentence",
    min_tokens: int = 2,
    max_tokens: int = 100,
    min_chars: int = 2,
    max_chars: int = 400,
    tokens: str = "whitespace",
) -> DataFrame:
    """P8 exact sentence-bounds predicate (CreateTsvDataset.java:167-170):
    keep sentences with token count in [min_tokens, max_tokens] and char
    length in [min_chars, max_chars]. Defaults are the reference's
    (RelexConfig.java:145-163: 2/100 tokens, 2/400 chars).

    TOKEN-NOTION DECISION (documented, differential-tested): the
    reference counts Token ANNOTATIONS — i.e. rule tokens. The default
    here counts WHITESPACE RUNS instead, deliberately: it is a native
    column expression (no Python stage ahead of the gazetteer match)
    and it is what every DuckDB oracle can replicate exactly. The two
    notions relate one-sidedly — the rule tokenizer only ever splits
    *within* a whitespace chunk, never merges across whitespace, so
    ``whitespace count <= rule count`` always: the default can only
    differ from reference behavior by (a) keeping a punctuation-heavy
    sentence whose rule count exceeds ``max_tokens`` or (b) dropping a
    short one whose punctuation would push it over ``min_tokens``.
    Pass ``tokens='rule'`` for reference Token parity (Arrow-batched
    count via the same rule_tokenize_with_offsets kernel the gazetteer
    matcher uses). tests/test_mentions.py pins both modes and the
    ordering invariant differentially."""
    if tokens == "rule":
        if "ruletok_count" not in _udf_cache:
            from pyspark.sql.types import IntegerType

            from cc_dbp_spark.functions import tokenize as _tok

            @F.pandas_udf(IntegerType())
            def _count(s: pd.Series) -> pd.Series:
                return s.fillna("").map(
                    lambda t: len(_tok.rule_tokenize_with_offsets(t)[0])
                ).astype("int32")

            _udf_cache["ruletok_count"] = _count
        ntok = _udf_cache["ruletok_count"](F.col(sent_col))
    else:
        ntok = F.size(F.split(F.trim(F.col(sent_col)), r"\s+"))
    nch = F.length(F.col(sent_col))
    return sents.filter(
        ntok.between(min_tokens, max_tokens) & nch.between(min_chars, max_chars)
    )


def entity_mentions(sents: DataFrame, entries) -> DataFrame:
    """Gazetteer matches per sentence: (doc_id, sent_id, entity_id,
    tok/char spans) with sentence-local half-open char spans."""
    keyed = sents.select(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("sent_id")).alias("skey"),
        "sentence",
    )
    matched = gaz.match_documents(keyed, entries, id_col="skey", text_col="sentence")
    return matched.select(
        F.substring_index(F.col("doc_id"), "#", 1).cast("bigint").alias("doc_id"),
        F.substring_index(F.col("doc_id"), "#", -1).cast("int").alias("sent_id"),
        "entity_id",
        "tok_start",
        "tok_end",
        "char_start",
        "char_end",
    )


def mention_pairs(sents: DataFrame, entries) -> DataFrame:
    """Best non-overlapping span pair per (sentence, id1<id2) with
    ARGONE/ARGTWO placeholder rewrite. Columns: doc_id, sent_id, id1,
    id2, s1, e1, s2, e2, sentence, rewritten."""
    keyed = sents.select(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("sent_id")).alias("skey"),
        "doc_id",
        "sent_id",
        "sentence",
    )
    # PostGazClean runs in the EDL pipeline BETWEEN the matcher and any
    # dataset build (GazetteerEDL.java:80-84): single-token mentions
    # nested inside a multi-token mention are removed BEFORE pair
    # generation — without this, 'hash join' fabricates (hash, join)
    # pairs the reference never emits. post_clean=True applies the rule
    # inside the matcher kernel (same output as the DataFrame
    # clean_overlapping_matches, minus its two shuffle joins).
    ments = gaz.match_documents(
        keyed.select("skey", "sentence"), entries, id_col="skey",
        text_col="sentence", post_clean=True,
    ).select(
        F.col("doc_id").alias("skey"),
        F.col("entity_id"),
        F.col("char_start"),
        F.col("char_end"),
    )
    m1 = ments.alias("m1")
    m2 = ments.alias("m2")
    pairs = (
        m1.join(
            m2,
            (F.col("m1.skey") == F.col("m2.skey"))
            & (F.col("m1.entity_id") < F.col("m2.entity_id"))
            # non-overlapping spans only (bestSpanPair contract)
            & (
                (F.col("m1.char_end") <= F.col("m2.char_start"))
                | (F.col("m2.char_end") <= F.col("m1.char_start"))
            ),
        )
        .select(
            F.col("m1.skey").alias("skey"),
            F.col("m1.entity_id").alias("id1"),
            F.col("m2.entity_id").alias("id2"),
            F.col("m1.char_start").alias("s1"),
            F.col("m1.char_end").alias("e1"),
            F.col("m2.char_start").alias("s2"),
            F.col("m2.char_end").alias("e2"),
        )
        .withColumn(
            "gap",
            F.greatest(
                F.col("s2") - F.col("e1"), F.col("s1") - F.col("e2")
            ),
        )
    )
    # tie-break mirrors bestSpanPair's iteration (CreateTsvDataset.java
    # :81-97): lists sorted in annotation order (start asc, LONGER first
    # — Span.compareTo, Span.java:633-638) and a strictly-greater score
    # update keeps the FIRST pair, so equal gaps resolve to the longer
    # span at the earlier start (e1/e2 DESC), deterministically.
    w = Window.partitionBy("skey", "id1", "id2").orderBy(
        F.col("gap").asc(),
        F.col("s1").asc(), F.col("e1").desc(),
        F.col("s2").asc(), F.col("e2").desc(),
    )
    best = pairs.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop(
        "__rn", "gap"
    )
    out = best.join(keyed, "skey").drop("skey")

    sent = F.col("sentence")
    first_is_1 = F.col("s1") <= F.col("s2")
    sA = F.when(first_is_1, F.col("s1")).otherwise(F.col("s2"))
    eA = F.when(first_is_1, F.col("e1")).otherwise(F.col("e2"))
    sB = F.when(first_is_1, F.col("s2")).otherwise(F.col("s1"))
    eB = F.when(first_is_1, F.col("e2")).otherwise(F.col("e1"))
    tagA = F.when(first_is_1, F.lit("ARGONE")).otherwise(F.lit("ARGTWO"))
    tagB = F.when(first_is_1, F.lit("ARGTWO")).otherwise(F.lit("ARGONE"))
    rewritten = F.concat(
        sent.substr(F.lit(1), sA),
        tagA,
        sent.substr(eA + 1, sB - eA),
        tagB,
        sent.substr(eB + 1, F.length(sent) - eB),
    )
    return out.select(
        "doc_id", "sent_id", "id1", "id2", "s1", "e1", "s2", "e2",
        "sentence", rewritten.alias("rewritten"),
    )


def relation_join(
    pairs: DataFrame, triples: DataFrame, direction_style: str = "ignore"
) -> DataFrame:
    """Attach GT relations. ``GroundTruth.getRelations`` returns the
    pair's relations prefixed '>' for forward (id1->id2) and '<' for
    backward (GroundTruth.java:335-355), and the pipeline's DEFAULT
    ``DirectionStyle.ignore`` (RelexConfig.java:106) immediately strips
    the prefix into a SET (CreateTsvDataset.java:278-292) — so a
    relation held in BOTH directions collapses to one name, and
    per-relation stats count such a mention once, not twice.
    ``direction_style='ignore'`` (default) reproduces that;
    ``'raw'`` keeps the prefixed encoding ('>'+rel / '<'+rel) for
    callers implementing the other DirectionStyles.
    triples: (arg1, rel, arg2) — small, broadcast the probe.

    Relations are AGGREGATED per entity pair before the join — a pair
    holding several triples (e.g. after taxonomy_expand adds
    super-relations) must stay ONE mention row with 'r1,r2' rather than
    fanning out into one row per relation, which would inflate every
    downstream mention/group count."""
    fwd = triples.select(
        F.col("arg1").alias("id1"), F.col("arg2").alias("id2"), F.col("rel")
    )
    rev = triples.select(
        F.col("arg2").alias("id1"), F.col("arg1").alias("id2"), F.col("rel")
    )
    if direction_style == "ignore":
        both = fwd.unionByName(rev)
    elif direction_style == "raw":
        both = fwd.withColumn("rel", F.concat(F.lit(">"), F.col("rel"))).unionByName(
            rev.withColumn("rel", F.concat(F.lit("<"), F.col("rel")))
        )
    else:
        raise ValueError(f"unknown direction_style: {direction_style!r}")
    rels = both.groupBy("id1", "id2").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("rel"))).alias("relations")
    )
    j = (
        pairs.join(F.broadcast(rels), ["id1", "id2"], "left")
        .withColumn("relations", F.coalesce(F.col("relations"), F.lit("")))
        .withColumn("is_positive", F.col("relations") != "")
    )
    return j


def downsample_negatives(
    labeled: DataFrame, retain_prob: float, inclusive: bool = True
) -> DataFrame:
    """P2: keep positives, and negatives whose D3 draw passes retain_prob
    (deterministic content-keyed filter, GroundTruth.java:213-241). The
    reference's two phases use DIFFERENT boundary semantics: phase 1
    SKIPS when ``priority > fraction`` (CreateTsvDataset.java:198-204),
    i.e. keeps on ``<=`` (``inclusive=True``, the default); the Spark
    rescale phase keeps on strict ``priority < retainNegativeProb``
    (RelexTsvDataset.java:138-146, ``inclusive=False``)."""
    draw = _neg_udf()(F.col("id1"), F.col("id2"))
    keep = draw <= F.lit(retain_prob) if inclusive else draw < F.lit(retain_prob)
    return labeled.filter(F.col("is_positive") | keep)


def downsample_negatives_to_ratio(
    labeled: DataFrame,
    sample_fraction: float,
    target_ratio: float,
    tolerance: float = 1.05,
) -> tuple[DataFrame, float]:
    """P2/A10 two-phase ratio-targeted negative downsample
    (RelexTsvDataset.java:120-157): phase 1 keeps negatives whose D3 draw
    passes ``sample_fraction`` on the INCLUSIVE ``<=`` boundary
    (CreateTsvDataset.java:198-204 skips on ``>``); ONE aggregation
    barrier computes the
    group-level neg:pos ratio (per (id1,id2) group, positive if any
    mention positive — the reference's mentionCount aggregate); if the
    ratio exceeds ``tolerance * target_ratio`` the retain probability is
    rescaled to ``sample_fraction * target_ratio / current`` and
    re-applied on the SAME deterministic draw — phase 2 is a strict
    subset of phase 1, one extra narrow filter, no second shuffle.
    Returns (filtered mentions, effective retain prob). The reference
    spends two count actions on the barrier; here both counts come from
    one agg job, and the D3 draw is materialized as ONE column so the
    stacked phase-1 + phase-2 filters evaluate the Arrow kernel once
    per row, not once per phase."""
    d3 = F.col("__d3")
    with_draw = labeled.withColumn("__d3", _neg_udf()(F.col("id1"), F.col("id2")))
    p1 = with_draw.filter(F.col("is_positive") | (d3 <= F.lit(sample_fraction)))
    row = (
        p1.groupBy("id1", "id2")
        .agg(F.max(F.col("is_positive").cast("int")).alias("pos"))
        .agg(F.count("*").alias("total"), F.sum("pos").alias("npos"))
        .first()
    )
    total, npos = row["total"], row["npos"] or 0
    if total == 0:
        # reference: 0/0 = NaN, NaN > threshold is false -> no rescale
        return p1.drop("__d3"), sample_fraction
    if npos <= 0:
        # reference: (total-0)/0 = Infinity triggers the rescale branch
        # with retain = fraction * (target/Infinity) = 0.0, dropping
        # EVERY negative (RelexTsvDataset.java:134-146) — with zero
        # positives the dataset comes out EMPTY, not untouched
        return p1.filter(F.col("is_positive") | (d3 < F.lit(0.0))).drop("__d3"), 0.0
    current = (total - npos) / npos
    if current > tolerance * target_ratio:
        retain = sample_fraction * (target_ratio / current)
        # phase 2 keeps on STRICT draw < retain (RelexTsvDataset.java:146)
        # and filters the PHASE-1 OUTPUT (the reference rescales the set
        # it already sampled) — re-filtering `labeled` would be
        # equivalent only while retain < sample_fraction, and a
        # tolerance below 1 can legally push retain above it, which
        # must NOT resurrect negatives phase 1 already dropped
        return p1.filter(F.col("is_positive") | (d3 < F.lit(retain))).drop("__d3"), retain
    return p1.drop("__d3"), sample_fraction


def mention_groups(labeled: DataFrame, min_mention_set: int = 2) -> DataFrame:
    """A3 + P3 + A4 + P5: per (id1,id2) group stats, drop small groups,
    collect the deduped mention set.

    ONE shuffle: the reference composes a count-filter anti-join (P3)
    with a dedup-then-regroup (A4+P5), but all of it keys on the same
    (id1, id2), so a single hash aggregation carries the pre-dedup
    count, the positive flag, and the uniqueness-string-deduped set
    (``collect_set`` on the RelexMention.java:172-218 uniqueness struct
    IS the dedup — two mentions collide iff span1+span2+sentence
    collide, and equal uniqueness strings imply equal rewritten, which
    is a pure function of (sentence, s1, e1, s2, e2)). P3's
    ``n_mentions >= min`` is implied by P5's ``set_size >= min`` (the
    deduped set can't exceed the raw count); both are kept explicit."""
    u = F.concat_ws(
        "|", F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2"), F.col("sentence")
    )
    grouped = (
        labeled.groupBy("id1", "id2")
        .agg(
            F.count("*").alias("n_mentions"),
            F.max(F.col("is_positive").cast("int")).cast("boolean").alias("positive"),
            F.collect_set(
                F.struct(u.alias("u"), F.col("rewritten").alias("rewritten"))
            ).alias("__uset"),
        )
        .withColumn("set_size", F.size("__uset"))
        .filter(
            (F.col("n_mentions") >= min_mention_set)
            & (F.col("set_size") >= min_mention_set)
        )
        .withColumn(
            "contexts",
            F.sort_array(F.transform("__uset", lambda x: x["rewritten"])),
        )
        .drop("__uset", "n_mentions")
    )
    return grouped.select("id1", "id2", "set_size", "positive", "contexts")


def sanitize_tsv(col):
    """M12 TSV sanitization (RelexMention.java:243-250): tabs/newlines/
    carriage returns -> spaces before rendering a TSV row."""
    return F.translate(col, "\t\n\r", "   ")


def attach_types(pairs: DataFrame, types: DataFrame) -> DataFrame:
    """J2 entity-id -> type broadcast lookup with 'unk' default and
    'multiType' on conflicting assignments (GroundTruth.getType,
    GroundTruth.java:296-311)."""
    resolved = (
        types.groupBy("id")
        .agg(F.collect_set("type").alias("ts"))
        .select(
            "id",
            F.when(F.size("ts") > 1, F.lit("multiType"))
            .otherwise(F.element_at("ts", 1))
            .alias("etype"),
        )
    )
    t1 = resolved.select(F.col("id").alias("id1"), F.col("etype").alias("type1"))
    t2 = resolved.select(F.col("id").alias("id2"), F.col("etype").alias("type2"))
    return (
        pairs.join(F.broadcast(t1), "id1", "left")
        .join(F.broadcast(t2), "id2", "left")
        .withColumn("type1", F.coalesce("type1", F.lit("unk")))
        .withColumn("type2", F.coalesce("type2", F.lit("unk")))
    )


def filter_by_type_pairs(pairs_typed: DataFrame, allowed: DataFrame) -> DataFrame:
    """P10 type-pair filter (TypePairEntityPairFilter): keep pairs whose
    UNORDERED coarse type pair is in the allowed table (broadcast semi
    join). allowed: (type_a, type_b) with type_a <= type_b."""
    lo = F.least("type1", "type2").alias("type_a")
    hi = F.greatest("type1", "type2").alias("type_b")
    keyed = pairs_typed.withColumn("type_a", lo).withColumn("type_b", hi)
    return keyed.join(F.broadcast(allowed), ["type_a", "type_b"], "left_semi").drop(
        "type_a", "type_b"
    )


def filter_triples_by_counts(triples: DataFrame, id_counts: DataFrame, min_count: int) -> DataFrame:
    """J6 corpus-count triple filter (BuildGroundTruth.java:45-55): keep a
    triple only when BOTH arguments have corpus count >= min_count."""
    ok = id_counts.filter(F.col("cnt") >= min_count).select("id")
    return (
        triples.join(F.broadcast(ok.withColumnRenamed("id", "arg1")), "arg1", "left_semi")
        .join(F.broadcast(ok.withColumnRenamed("id", "arg2")), "arg2", "left_semi")
        .select("arg1", "rel", "arg2")
    )


def relex_stats(labeled: DataFrame) -> DataFrame:
    """A9 dataset stats rollup (GatherRelexStats.java:47-66 /
    RelexStats.java:97-131): totals + per-relation mention counts in one
    pass. Returns one row per relation plus an '__all__' totals row."""
    per_rel = (
        labeled.filter(F.col("relations") != "")
        .select(F.explode(F.split("relations", ",")).alias("relation"))
        .groupBy("relation")
        .agg(F.count("*").alias("n_mentions"))
    )
    # the positive total is recoverable as sum over per-relation rows /
    # relations != '' — keep the rollup schema at (relation, n_mentions)
    totals = labeled.agg(F.count("*").alias("n_mentions")).select(
        F.lit("__all__").alias("relation"),
        "n_mentions",
    )
    return per_rel.unionByName(totals)


def tensor_chunks(groups: DataFrame, max_mention_set: int) -> DataFrame:
    """F6: split each mention set into ceil(n/max) chunks ROUND-ROBIN
    (element i -> chunk i mod nchunks, the reference's
    CollectionUtil.partition:31-51), one output row per chunk."""
    n = F.size("contexts")
    nchunks = F.ceil(n / F.lit(max_mention_set)).cast("int")
    chunk_ids = F.sequence(F.lit(0), F.greatest(nchunks - 1, F.lit(0)))
    idx = F.sequence(F.lit(0), n - 1)

    # build each chunk's member list inside the row, then explode only
    # the chunks: the round-robin picks partition the contexts array,
    # so per-group memory stays O(n) — exploding chunk ids first would
    # copy the whole array onto every chunk row (O(chunks x n))
    def chunk_struct(c):
        members = F.filter(idx, lambda i: i % nchunks == c)
        picked = F.transform(members, lambda i: F.element_at("contexts", i + 1))
        return F.struct(c.alias("chunk"), picked.alias("contexts"))

    exploded = groups.select(
        "id1", "id2", "positive",
        F.explode(F.transform(chunk_ids, chunk_struct)).alias("cc"),
    )
    return exploded.select(
        "id1", "id2", "positive",
        F.col("cc")["chunk"].alias("chunk"),
        F.col("cc")["contexts"].alias("contexts"),
    ).filter(F.size("contexts") > 0)


def encode_tensor_lines(chunks: DataFrame) -> DataFrame:
    """M14/S12 shape: serialize each chunk to a base64 line (unit-sep
    joined contexts; the reference writes base64(tensor bytes) lines that
    a driver gather later decodes, Base64ToBinary.java:67-124). Fully
    native: encode + base64 column expressions."""
    payload = F.base64(
        F.encode(F.concat_ws(chr(31), F.col("contexts")), "UTF-8")
    )
    return chunks.select(
        "id1", "id2", "chunk", payload.alias("b64"),
    )


def tensor_chunk_rows(
    labeled: DataFrame, min_mention_set: int = 2, max_mention_set: int = 5
) -> DataFrame:
    """Row-based P3+A4+F6: deduped mention rows -> (id1, id2, positive,
    chunk, sent_ndx, ctx) WITHOUT ever collecting a group's contexts
    into one array. mention_groups' collect_list builds a single row of
    every context of a group — a multi-MB (at web scale multi-GB) row
    for hot entity pairs that OOMs wide executors; here group stats,
    round-robin chunk assignment (element i -> chunk i mod n_chunks,
    CollectionUtil.partition semantics) and in-chunk order all come
    from windows over plain rows, so memory per task is O(1) rows."""
    uniq = labeled.withColumn(
        "__u",
        F.concat_ws(
            "|",
            F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2"), F.col("sentence"),
        ),
    ).dropDuplicates(["id1", "id2", "__u"])
    # pre-dedupe group sizes gate min_mention_set (P3 contract)
    pre = labeled.groupBy("id1", "id2").agg(F.count("*").alias("n_pre"))
    uniq = uniq.join(pre.filter(F.col("n_pre") >= min_mention_set), ["id1", "id2"], "left_semi")
    g = Window.partitionBy("id1", "id2")
    ordered = (
        uniq.withColumn("__pos", F.row_number().over(
            g.orderBy("rewritten", "s1", "e1", "s2", "e2")) - 1)
        .withColumn("__cnt", F.count("*").over(g))
        .withColumn("positive", F.max(F.col("is_positive").cast("int")).over(g).cast("boolean"))
        .filter(F.col("__cnt") >= min_mention_set)
    )
    nchunks = F.ceil(F.col("__cnt") / F.lit(max_mention_set)).cast("int")
    rows = ordered.withColumn("chunk", F.pmod("__pos", nchunks).cast("int"))
    wc = Window.partitionBy("id1", "id2", "chunk").orderBy("__pos")
    return rows.select(
        "id1", "id2", "positive", "chunk",
        (F.row_number().over(wc) - 1).alias("sent_ndx"),
        F.col("rewritten").alias("ctx"),
    )


def encode_tensor_instances(
    chunks: DataFrame, vocab: DataFrame, max_pos: int = 64
) -> DataFrame:
    """M14 (real tensor encode): per mention-set chunk, the reference's
    instance tensors (``RelexTensors.java:112-190`` semantics):

    * ``words``      — vocab index per token over ALL sentences of the
      chunk concatenated (-1 = OOV), tokens whitespace-split from the
      ARGONE/ARGTWO-rewritten context with the placeholders forced to
      standalone tokens (punctuation the rule tokenizer matched through
      splits off as its own OOV token, as the reference's re-tokenize
      would do).
    * ``pos1/pos2``  — position-embedding index per token relative to
      the arg span: ``clamp(max_pos/2 - |wi - arg|, 0, max_pos-1)``
      (``toPositionEmbeddingNdx``: 0 inside the span, negative offsets
      clamp at 0; single-token args make before/after symmetric).
    * ``pool_starts/pool_ends`` — per sentence, the arg-covering span
      clamped to [1, n_tokens-1] — the reference's EXACT pool piece
      (``RelexTensors.java:149-151``: max(1, span.start),
      min(tokens.size()-1, span.end)), including its boundary behavior
      (a 2-token sentence yields the reference's own empty [1,1)
      piece).
    * ``sent_starts`` — cumulative token offset per sentence.
    * ``positive``   — the chunk's ground-truth flag (stand-in for the
      one-hot gtRels row; the groups pipeline carries a boolean label).
    * ``b64``        — base64(UTF-8(JSON record of the above)): the
      deterministic serialized line the S12 gather sink consumes. (The
      reference serializes TensorFileWriter byte records; a JSON tensor
      record keeps the same information round-trippable and lets the
      DuckDB oracle decode it.)

    Sentences whose rewrite lost an arg token are skipped, as the
    reference skips mentions with no token span. Fully native columns;
    the vocab lookup is an (auto-broadcast) equi-join, never a map
    literal — vocabularies at corpus scale are tables, not expressions.
    vocab: (word, widx) with widx the (count desc, word asc) dense rank.
    """
    return encode_tensor_rows(
        chunks.select(
            "id1", "id2", "positive", "chunk",
            F.posexplode("contexts").alias("sent_ndx", "ctx"),
        ),
        vocab,
        max_pos,
    )


def encode_tensor_rows(
    sent_rows: DataFrame, vocab: DataFrame, max_pos: int = 64
) -> DataFrame:
    """Row-form M14 (see :func:`encode_tensor_instances`): input is
    (id1, id2, positive, chunk, sent_ndx, ctx) rows — pair with
    :func:`tensor_chunk_rows` so no stage ever holds a whole mention
    set in one row.

    KNOWN DIVERGENCE (documented, not fixed): the arg positions are
    anchored via the FIRST occurrence of the standalone ``ARGONE`` /
    ``ARGTWO`` token, while the reference carries the rewritten spans
    numerically through the pipeline (RelexMention.java:66-69 updates
    span1/span2 during convertToPlaceholders; RelexTensors resolves them
    via toSegmentSpan). A document whose LITERAL text contains a
    standalone ``ARGONE`` token before the placeholder would mis-anchor
    pos1/pos2/pool here (substring occurrences like 'ARGONEXT' are safe —
    the boundary-guarded padding below never splits them). Real corpora
    do not contain the placeholder as a standalone token; carrying spans
    numerically would force the rewritten span columns through every
    chunk/sort stage for a case that cannot occur. The DuckDB oracle
    mirrors the first-occurrence lookup, so the gate stays consistent."""
    half = max_pos // 2
    # force the placeholders to stand alone as whitespace tokens before
    # splitting: the rule tokenizer matches entities ADJACENT to
    # punctuation, so the char-splice rewrite can produce 'ARGONE,' —
    # the reference's annotator re-tokenizes the sentence and still
    # resolves the arg span (RelexTensors.java:134-142), and this
    # padding is the whitespace-substrate equivalent (the peeled
    # punctuation becomes its own token, OOV like any unseen word).
    # Without it every punctuation-adjacent mention silently fell into
    # the skipped-mention filter below.
    #
    # Boundary-guarded two-pass (no lookaround: DuckDB's RE2 oracle must
    # apply the identical regex): pad a side only when that side is a
    # non-alphanumeric/start/end boundary, so LITERAL document text
    # containing the placeholder as a substring ('ARGONEXT') stays one
    # token and can never mis-anchor the first-occurrence lookup —
    # exactly how the reference's re-tokenizer treats it
    # (one token != ARGONE -> the mention is skipped, not mis-anchored).
    # Applied LAZILY per whitespace token, not to the whole sentence:
    # whitespace already separates tokens, so padding a placeholder
    # inside one whitespace-delimited token and re-splitting that token
    # yields exactly the token sequence the whole-string regex produced
    # (any extra inserted spaces collapse under the same \s+ split) —
    # but the regex pair now scans only the ~2 placeholder-bearing
    # tokens per sentence instead of every character of every sentence
    # (a cheap `contains` gates it), which matters because the
    # optimizer's inferred explode-input filter re-evaluates this very
    # expression below the exchange (InferFiltersFromGenerate inlines
    # the alias) — the chain must be cheap, not just single-eval.
    def _pad_token(t):
        two_pass = F.regexp_replace(
            F.regexp_replace(t, r"(^|[^A-Za-z0-9])(ARGONE|ARGTWO)", "$1 $2"),
            r"(ARGONE|ARGTWO)($|[^A-Za-z0-9])",
            "$1 $2",
        )
        return F.when(
            t.contains("ARGONE") | t.contains("ARGTWO"),
            F.split(F.trim(two_pass), r"\s+"),
        ).otherwise(F.array(t))

    sent = sent_rows.withColumn(
        "toks",
        F.flatten(F.transform(F.split(F.trim("ctx"), r"\s+"), _pad_token)),
    )
    # The pad+split chain must be evaluated EXACTLY ONCE per sentence:
    # the earlier shape (array_position anchors + size() + a pre-explode
    # filter, with the token explode downstream) re-evaluated the regex
    # chain in every consuming operator — filter predicate, scalar
    # projection, and the generator each recomputed it (no
    # cross-operator subexpression elimination; GenerateExec alone
    # measured ~3x the chain's single-eval cost at sf0.1). Shuffling the
    # SENTENCE rows by the per-sentence group key here (a) materializes
    # `toks` in the shuffle write, pinning the regex chain to one
    # map-side evaluation, and (b) pre-clusters the data so the explode,
    # the broadcast vocab joins, and the per-sentence aggregation below
    # all run in the reduce stage with NO further exchange — the old
    # plan shuffled the exploded TOKEN rows instead (same payload plus
    # the group key repeated per token: strictly more bytes).
    sent = sent.repartition("id1", "id2", "chunk", "sent_ndx")
    # Per-sentence scalars are derived IN the aggregation: a1/a2 = min
    # token index whose RAW token equals the placeholder (identical to
    # array_position's first-occurrence, 0-based), n_toks = max index
    # + 1, and the missing-placeholder filter moves after the groupBy (a
    # group with no ARGONE/ARGTWO aggregates to NULL and is dropped —
    # the same sentences the old pre-explode filter removed). Only
    # `positive` rides the explode.
    tok = sent.select(
        "id1", "id2", "positive", "chunk", "sent_ndx",
        F.posexplode("toks").alias("wi", "w"),
    )
    tok = (
        tok.withColumn("is_a1", F.col("w") == "ARGONE")
        .withColumn("is_a2", F.col("w") == "ARGTWO")
        .withColumn("w", F.lower("w"))  # RelexVocab.normalized analogue
    )
    # post-min-count vocab is bounded (the same bound the reference's
    # broadcast RelexVocab map relies on) -> broadcast hash joins
    tok = tok.join(
        F.broadcast(vocab.select(F.col("word").alias("w"), "widx")), "w", "left"
    )
    # OOV integer fallback (RelexTensors.java:170-175): a token missing
    # from the vocab that Integer.parseInt accepts resolves to its
    # '#'-digit-sequence twin of the same string length
    # (RelexVocab.toDigitSequence pads to d.length(), sign included)
    # before the final -1. The parseInt test is the shared
    # parity.is_parseint_col definition (divergence notes there); the
    # vocab carries the '#' rows because RelexVocab.add double-counts
    # every integer token. Only '#'-run vocab rows can ever match dkey,
    # so the fallback side broadcasts just those (one per twinned
    # length), not the whole vocab a second time.
    tok = tok.withColumn(
        "dkey",
        F.when(
            F.col("widx").isNull() & parity.is_parseint_col(F.col("w")),
            F.expr("repeat('#', length(w))"),
        ),
    ).join(
        F.broadcast(
            vocab.filter(F.col("word").rlike(r"^#+$")).select(
                F.col("word").alias("dkey"), F.col("widx").alias("dwidx")
            )
        ),
        "dkey",
        "left",
    ).withColumn("widx", F.coalesce("widx", "dwidx")).drop("dkey", "dwidx")
    per_sent = tok.groupBy("id1", "id2", "chunk", "sent_ndx").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("wi", "widx"))),
            lambda s: F.coalesce(s["widx"], F.lit(-1)).cast("int"),
        ).alias("words"),
        F.first("positive").alias("positive"),
        F.min(F.when(F.col("is_a1"), F.col("wi"))).alias("a1"),
        F.min(F.when(F.col("is_a2"), F.col("wi"))).alias("a2"),
        (F.max("wi") + 1).alias("n_toks"),
    ).filter(F.col("a1").isNotNull() & F.col("a2").isNotNull())
    idx = F.sequence(F.lit(0), F.col("n_toks") - 1)

    def pos_row(arg):
        return F.transform(
            idx,
            lambda i: F.greatest(F.lit(0), F.lit(half) - F.abs(i - F.col(arg))).cast("int"),
        )

    per_sent = (
        per_sent.withColumn("pos1", pos_row("a1"))
        .withColumn("pos2", pos_row("a2"))
        .withColumn("pool_start", F.greatest(F.lit(1), F.least("a1", "a2")))
        .withColumn("pool_end", F.least(F.col("n_toks") - 1, F.greatest("a1", "a2") + 1))
    )
    per_chunk = per_sent.groupBy("id1", "id2", "chunk").agg(
        F.array_sort(
            F.collect_list(
                F.struct("sent_ndx", "words", "pos1", "pos2", "pool_start", "pool_end")
            )
        ).alias("sents"),
        F.first("positive").alias("positive"),
    )
    sizes = F.transform("sents", lambda s: F.size(s["words"]))
    tensors = per_chunk.select(
        "id1", "id2", "chunk", "positive",
        F.flatten(F.transform("sents", lambda s: s["words"])).alias("words"),
        F.flatten(F.transform("sents", lambda s: s["pos1"])).alias("pos1"),
        F.flatten(F.transform("sents", lambda s: s["pos2"])).alias("pos2"),
        F.transform("sents", lambda s: s["pool_start"]).alias("pool_starts"),
        F.transform("sents", lambda s: s["pool_end"]).alias("pool_ends"),
        F.transform(
            F.sequence(F.lit(0), F.size("sents") - 1),
            lambda i: F.aggregate(
                F.slice(sizes, F.lit(1), i), F.lit(0), lambda a, b: a + b
            ),
        ).alias("sent_starts"),
    )
    payload = F.base64(
        F.encode(
            F.to_json(
                F.struct(
                    "words", "pos1", "pos2",
                    "pool_starts", "pool_ends", "sent_starts", "positive",
                )
            ),
            "UTF-8",
        )
    )
    return tensors.withColumn("b64", payload)


def with_binary_record(tensors: DataFrame) -> DataFrame:
    """Adds ``bin64``: the reference's TensorFileWriter byte layout,
    base64-encoded one record per row (RelexTensorDataset.java:81;
    layout in :mod:`cc_dbp_spark.sources.tensorio`, JVM-golden-anchored).
    gtRels carries the single positive indicator (the query pipeline
    tracks is_positive, not per-relation indices — documented
    divergence)."""
    import base64

    from pyspark.sql.types import StringType

    from cc_dbp_spark.sources import tensorio

    @F.pandas_udf(StringType())
    def enc(
        id1: pd.Series, id2: pd.Series, words: pd.Series, pos1: pd.Series,
        pos2: pd.Series, pool_starts: pd.Series, pool_ends: pd.Series,
        sent_starts: pd.Series, positive: pd.Series,
    ) -> pd.Series:
        out = []
        for i in range(len(id1)):
            rec = tensorio.relex_record_bytes(
                f"{id1.iloc[i]}\t{id2.iloc[i]}",
                words.iloc[i], pos1.iloc[i], pos2.iloc[i],
                pool_starts.iloc[i], pool_ends.iloc[i], sent_starts.iloc[i],
                [1 if positive.iloc[i] else 0],
            )
            out.append(base64.b64encode(rec).decode("ascii"))
        return pd.Series(out)

    return tensors.withColumn(
        "bin64",
        enc(
            "id1", "id2", "words", "pos1", "pos2",
            "pool_starts", "pool_ends", "sent_starts", "positive",
        ),
    )


def assign_split(groups: DataFrame, cdf=(0.8, 0.9, 1.0)) -> DataFrame:
    """D4: train/val/test by the deterministic SPLIT draw over the
    ordered pair + CDF bucket (GroundTruth.java:184-205)."""
    draw = _split_udf()(F.col("id1"), F.col("id2"))
    buckets = F.when(draw < cdf[0], "train").when(draw < cdf[1], "val").otherwise("test")
    return groups.withColumn("split", buckets)
