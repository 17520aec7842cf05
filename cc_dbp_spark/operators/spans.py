"""Span-array operators over the interleaved documents table
``(doc_id, spans array<struct<kind,text,media_ref,offset>>)`` — all
native array expressions (no Python in the plan).

Reference semantics:
* sorted-span invariant (T2): annotations kept sorted by offset,
  ``nlp/.../Document.java:343-376``;
* annotation-type projection (M6): keep only configured kinds,
  ``corpus/.../crawl/SaveCommonCrawlBase.java:77-87,147``;
* doc -> sub-documents with re-offset annotations (F7),
  ``nlp/.../Document.java:418-441``;
* w2v sentence rendering (F5): texty spans sorted, lowercased,
  whitespace -> ``_``, ``spark/.../CreateW2VFile.java:53-80``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TEXTY_KINDS = ("text", "title", "paragraph", "section_header")


def sort_spans(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Enforce the writer invariant: spans sorted by (offset, kind)."""
    return docs.withColumn(
        spans_col,
        F.expr(
            f"array_sort({spans_col}, (a, b) -> CASE"
            " WHEN a.offset < b.offset THEN -1 WHEN a.offset > b.offset THEN 1"
            " WHEN a.kind < b.kind THEN -1 WHEN a.kind > b.kind THEN 1 ELSE 0 END)"
        ),
    )


def spans_sorted_ok(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """(doc_id, ok): true iff offsets are non-decreasing — the
    span-sequence equality precondition checked after every operator.
    NULL offsets make the order unverifiable and flag NOT ok (without
    the coalesce a three-valued NULL comparison would make ``ok`` NULL,
    which count/min audits silently skip)."""
    n = F.size(F.col(spans_col))
    idx = F.sequence(F.lit(0), n - 2)
    bad = F.exists(
        idx,
        lambda i: F.element_at(F.col(spans_col), i + 1)["offset"]
        > F.element_at(F.col(spans_col), i + 2)["offset"],
    )
    ok = F.when(n <= 1, F.lit(True)).otherwise(F.coalesce(~bad, F.lit(False)))
    return docs.select("doc_id", ok.alias("ok"))


def filter_kinds(docs: DataFrame, kinds, spans_col: str = "spans") -> DataFrame:
    """M6 annotation-type projection: keep only spans of the given kinds
    (order within the array is preserved)."""
    kind_arr = F.array(*[F.lit(k) for k in kinds])
    return docs.withColumn(
        spans_col,
        F.filter(F.col(spans_col), lambda s: F.array_contains(kind_arr, s["kind"])),
    )


def split_documents(docs: DataFrame, chunk: int, spans_col: str = "spans") -> DataFrame:
    """F7 doc -> sub-documents: split the span array into chunks of
    `chunk` spans; each sub-doc's spans re-offset so its first span
    starts at 0 (Document.java:418-441 re-offset contract).

    Output: (doc_id, part, spans) with doc_id suffixed ``#part``.
    The ``#`` separator is collision-free for this engine's ids by
    construction: crawl doc_ids are CANONICAL urls, and canonicalization
    strips fragments, so ``#`` cannot occur in an input id. Callers with
    arbitrary external ids that may contain ``#`` (or re-splitting
    already-split output) should rename ids first.
    """
    n = F.size(F.col(spans_col))
    nparts = F.ceil(n / F.lit(chunk)).cast("int")
    parts = F.sequence(F.lit(0), F.greatest(nparts - 1, F.lit(0)))

    # build the re-offset pieces INSIDE the row, then explode only the
    # pieces: the slices partition the span array, so per-doc memory
    # stays O(spans) — exploding part indices first and slicing after
    # would copy the whole array onto every part row (O(parts x spans))
    def piece(p):
        sl = F.slice(F.col(spans_col), p * chunk + 1, chunk)
        base = F.element_at(sl, 1)["offset"]
        return F.struct(
            p.alias("part"),
            F.transform(
                sl,
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    (s["offset"] - base).cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )

    exploded = docs.select(
        "doc_id", F.explode(F.transform(parts, piece)).alias("pp")
    )
    return exploded.select(
        F.concat_ws("#", "doc_id", F.col("pp")["part"]).alias("doc_id"),
        F.col("pp")["part"].alias("part"),
        F.col("pp")["spans"].alias("spans"),
    ).filter(F.size("spans") > 0)


def w2v_sentences(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """F5: one training line per doc — the CreateW2VFile.java:53-80
    rendering over the interleaved-spans data model.

    Reference semantics kept exactly: terms sorted start-ascending with
    LONGER span first on equal starts (Span.compareTo), then the
    stateful overlap drop — a term starting before the end of the last
    KEPT term is skipped (``prevEnd`` scan, CreateW2VFile.java:66-73; a
    running-max/window formulation over-drops after a discarded long
    span) — and each kept term Java-``trim()``-ed (chars <= U+0020),
    lowercased, intra-span whitespace joined with ``_``. Runs as one
    native ``aggregate`` lambda per doc: no explode, no shuffle beyond
    the scan, no Python.

    Documented variants vs the reference: one line per document (the
    spans model carries no sentence annotations), empty-text spans are
    dropped rather than rendered as bare separators, and no trailing
    space. The fixture corpus has no overlapping texty spans, so the
    DuckDB oracle needs no stateful scan — the overlap-drop semantics
    are pinned by the pure-Python reference-loop differential test
    (test_w2v_overlap_drop)."""
    texty = F.filter(
        F.col(spans_col),
        lambda s: F.array_contains(F.array(*[F.lit(k) for k in TEXTY_KINDS]), s["kind"])
        & (s["text"] != ""),
    )
    # annotation order: start asc, longer first (negated end asc). The
    # reference sort is STABLE (Collections.sort), so equal (start, end)
    # spans keep array order — the original index breaks ties BEFORE the
    # struct comparison ever reaches txt (which would otherwise pick the
    # lexically-smaller text, diverging from Span.compareTo stability).
    ordered = F.array_sort(
        F.transform(
            texty,
            lambda s, i: F.struct(
                s["offset"].alias("o"),
                (-(s["offset"] + F.length(s["text"]))).alias("ne"),
                i.alias("ix"),
                s["text"].alias("txt"),
            ),
        )
    )
    word = lambda t: F.regexp_replace(  # noqa: E731
        F.lower(F.regexp_replace(t, r"^[\x00-\x20]+|[\x00-\x20]+$", "")),
        r"\s+",
        "_",
    )
    scan = F.aggregate(
        ordered,
        F.struct(
            F.lit(0).alias("pe"),
            F.array().cast("array<string>").alias("parts"),
        ),
        lambda acc, s: F.when(s["o"] < acc["pe"], acc).otherwise(
            F.struct(
                (s["o"] + F.length(s["txt"])).alias("pe"),
                F.concat(acc["parts"], F.array(word(s["txt"]))).alias("parts"),
            )
        ),
        lambda acc: acc["parts"],
    )
    return docs.select("doc_id", F.concat_ws(" ", scan).alias("line")).filter(
        F.col("line") != ""
    )


def outlink_edges(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """(src doc_id, dst media_ref) edge list from link spans — the
    LinkAnnotation.target surface that feeds the frontier."""
    return (
        docs.select("doc_id", F.explode(spans_col).alias("s"))
        .filter((F.col("s.kind") == "link") & F.col("s.media_ref").isNotNull())
        .select(F.col("doc_id").alias("src"), F.col("s.media_ref").alias("dst"))
    )
