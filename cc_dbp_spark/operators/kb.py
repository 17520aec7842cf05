"""Knowledge-base assembly operators (reference `kb` module shapes):

* literal cleaning (M10, ``kb/.../conversion/ConvertDBpedia.java:286-311``)
* URI -> human label (M11, ``ConvertDBpedia.java:446-452``)
* label-collision merge to the most popular node (J7,
  ``kb/.../conversion/MergeNodesDBpedia.java:57-90``)
* top-N frequent types (T4, ``kb/.../SelectTypes.java``)
* triples x relation-taxonomy expansion (J8,
  ``kb/.../BuildGroundTruth.java:45-47`` + ``kb/.../RelationTaxonomy.java``)
* OPIC-style cash propagation over the link graph — the reference's
  ``NodePopularity`` two-pass score spreading
  (``kb/.../NodePopularity.java:33-58``) generalized to the iterative
  cash/history scheme that feeds frontier priority.

Everything is native DataFrame ops; the iterative OPIC loop checkpoints
per round (same lineage-truncation discipline as the crawl driver).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cc_dbp_spark.functions import parity


def clean_literal(col, max_len: int = 40):
    """M10-shaped literal normalization: drop a trailing parenthetical,
    collapse whitespace to ``_``, lowercase, strip leading/trailing
    punctuation; NULL when longer than `max_len` or empty."""
    c = F.regexp_replace(col, r"\s*\([^)]*\)\s*$", "")
    c = F.lower(F.trim(c))
    c = F.regexp_replace(c, r"^[\s\p{Punct}]+|[\s\p{Punct}]+$", "")
    c = F.regexp_replace(c, r"\s+", "_")
    return F.when((c != "") & (F.length(c) <= max_len), c)


def uri_to_label(col):
    """M11: last path segment, url-decoded, ``_`` -> space, trailing
    parenthetical stripped."""
    seg = F.substring_index(col, "/", -1)
    dec = F.regexp_replace(F.url_decode(seg), "_", " ")
    return F.regexp_replace(dec, r"\s*\([^)]*\)\s*$", "")


def merge_label_collisions(nodes: DataFrame) -> DataFrame:
    """J7: nodes (id, label, popularity) sharing a lowercased label merge
    into the most popular id (ties -> smallest id). Returns the remap
    (id, canonical_id) covering every input id."""
    from pyspark.sql import Window

    low = F.lower(F.col("label"))
    labeled = nodes.withColumn("lab", low)
    w = Window.partitionBy("lab").orderBy(F.col("popularity").desc(), F.col("id").asc())
    canon = (
        labeled.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("lab", F.col("id").alias("canonical_id"))
    )
    return labeled.join(canon, "lab").select("id", "canonical_id")


def select_types(types_df: DataFrame, max_types: int, min_size: int) -> DataFrame:
    """T4: keep at most `max_types` types with >= `min_size` members,
    most frequent first (ties -> type name ascending)."""
    return (
        types_df.groupBy("type")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") >= min_size)
        .orderBy(F.col("n_members").desc(), F.col("type").asc())
        .limit(max_types)
    )


def taxonomy_expand(triples: DataFrame, closure: DataFrame) -> DataFrame:
    """J8: emit one triple per (rel itself + every super-relation in the
    transitive closure). closure: (rel, super_rel)."""
    supers = triples.join(F.broadcast(closure), "rel").select(
        "arg1", F.col("super_rel").alias("rel"), "arg2"
    )
    return triples.select("arg1", "rel", "arg2").unionByName(supers).distinct()


def filter_gazetteer_labels(
    labels: DataFrame,
    id_counts: DataFrame | None,
    min_count: int = 1,
    max_count: int = 50_000,
    id_col: str = "id",
    label_col: str = "label",
    count_col: str = "cnt",
) -> DataFrame:
    """BuildGazetteer corpus-count label filter
    (``kb/.../BuildGazetteer.java:92-107``): the KB-finalize step that
    prunes stop-word-like labels before the gazetteer ships.

    Per (id, label) row, with count = the entity's corpus mention count
    (0 when absent from idCounts), keep the label iff

    * ``count >= min_count``  (entity is attested at all), AND
    * the label tokenizes non-empty, AND
    * multi-word OR integer-token OR ``count <= max_count``

    i.e. a SINGLE-word, NON-numeric label of a super-hot entity is
    dropped (it behaves like a stopword in matching: "state", "one"),
    while multi-word surface forms and numbers survive any count.
    Defaults from ``configSmall.properties:23-24`` (minNodeCorpusCount=1,
    maxNodeCorpusCount=50000). ``id_counts=None`` is the reference's
    no-idCounts mode (``countFiltered=false``): every entity passes the
    min gate with count=min_count.

    Whitespace tokens stand in for the reference's ClearNLP tokens (the
    same stand-in the rest of the mention pipeline uses); the integer
    test mirrors ``Lang.isInteger`` (``Integer.parseInt``) EXACTLY —
    optional sign + digits with the numeric value inside int32 — as a
    pure-string check (sign/zero strip + digit count + lexical compare
    against 2147483647/2147483648) so no engine-specific string->int
    cast semantics are involved and the DuckDB oracle applies the
    identical expression.

    Scale shape: id_counts is the per-entity corpus count table — KB
    cardinality, not corpus cardinality — joined on the entity id; at
    10^7 KB entities AQE picks a broadcast. Everything else is a
    row-local predicate (codegen, no extra shuffle).

    Returns the surviving (id, label, count, tokens) rows.
    """
    toks = F.split(F.trim(F.col(label_col)), r"\s+")
    if id_counts is None:
        cnt = F.lit(min_count).cast("bigint")
        joined = labels
    else:
        cnt = F.coalesce(F.col("__gcnt"), F.lit(0)).cast("bigint")
        joined = labels.join(
            id_counts.select(F.col(id_col), F.col(count_col).alias("__gcnt")),
            id_col,
            "left",
        )
    first_tok = F.element_at(toks, 1)
    # exact Integer.parseInt acceptance: the shared parity-critical
    # definition (semantics + documented divergences live there)
    is_int = parity.is_parseint_col(first_tok)
    # F.split never yields an empty array, so "tokenizes non-empty"
    # reduces to the first token being non-blank
    keep = (
        (cnt >= min_count)
        & (first_tok != "")
        & ((F.size(toks) > 1) | is_int | (cnt <= max_count))
    )
    return joined.select(
        F.col(id_col),
        F.col(label_col),
        cnt.alias("count"),
        toks.alias("tokens"),
    ).filter(keep)


def opic_scores(edges: DataFrame, n_rounds: int = 2, damping: float = 0.85) -> DataFrame:
    """OPIC-style cash propagation over (src, dst) edges.

    Each round every node distributes its cash across its out-edges
    (NodePopularity's score spreading); `history` accumulates distributed
    cash and is the popularity/priority signal. Dangling mass and the
    (1-damping) share recirculate uniformly. Returns (node, history).
    """
    # Iterative reuse: every round re-reads edges (outdeg + transfer join),
    # so materialize once. This also keeps downstream joins' inferred
    # IsNotNull constraints above the cached relation instead of letting
    # Catalyst substitute the full upstream expression chain (e.g. URL
    # canonicalization) into a Filter that overflows codegen.
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    try:
        n = nodes.count()
        state = nodes.withColumn("cash", F.lit(1.0 / n))
        outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
        history = nodes.withColumn("history", F.lit(0.0))
        for _ in range(n_rounds):
            flow = (
                state.join(outdeg, state["node"] == outdeg["src"], "left")
                .select(
                    "node", "cash",
                    F.coalesce(F.col("outdeg"), F.lit(0)).alias("outdeg"),
                )
            )
            transfers = (
                flow.filter(F.col("outdeg") > 0)
                .join(edges, flow["node"] == edges["src"])
                .select(
                    F.col("dst").alias("node"),
                    (F.col("cash") * damping / F.col("outdeg")).alias("inflow"),
                )
                .groupBy("node")
                .agg(F.sum("inflow").alias("inflow"))
            )
            # one driver barrier per round, not two: total cash + dangling
            # mass in a single job.
            total, dangling = flow.agg(
                F.sum("cash"),
                F.sum(F.when(F.col("outdeg") == 0, F.col("cash")).otherwise(F.lit(0.0))),
            ).collect()[0]
            total, dangling = total or 0.0, dangling or 0.0
            uniform = ((1.0 - damping) * total + damping * dangling) / n
            history = (
                history.join(state.select("node", "cash"), "node")
                .select("node", (F.col("history") + F.col("cash")).alias("history"))
                .localCheckpoint(eager=True)
            )
            state = (
                nodes.join(transfers, "node", "left")
                .select(
                    "node",
                    (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(uniform)).alias("cash"),
                )
                .localCheckpoint(eager=True)
            )
        return history.join(state, "node").select(
            "node", (F.col("history") + F.col("cash")).alias("history")
        )
    finally:
        # scores are localCheckpointed per round, so lineage no longer
        # references edges; repeated calls must not accumulate cached
        # relations in executor storage.
        edges.unpersist()
