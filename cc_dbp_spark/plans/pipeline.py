"""End-to-end dataset build — the reference's flagship workflow
(``RelexBuildDataset.sparkRun``, traced in SURVEY.md §3.2) over the
engine's operators:

    crawl-emitted span docs -> text corpus -> sentences -> gazetteer
    mentions -> entity pairs + GT relations -> negative downsample ->
    mention groups (skew-deduped) -> split assignment -> tensor lines
    -> split-partitioned dataset + vocab + stats artifacts

Stage outputs are parquet under ``out_dir``; a stage whose output exists
is SKIPPED — the reference's output-exists resume
(``spark/.../RelexBuildDataset.java:72-93``). Every stage is a pure
DataFrame job; re-running after a crash resumes at the first missing
artifact.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_dbp_spark.functions import textstats as ts
from cc_dbp_spark.operators import mentions as M
from cc_dbp_spark.operators import spans as SP

STAGES = ("corpus", "pairs", "groups", "tensors", "vocab", "stats")


def docs_to_corpus(docs_spans: DataFrame) -> DataFrame:
    """Interleaved span docs -> (doc_id, text): texty spans joined in
    offset order (the crawl layer's Document.text reconstruction)."""
    texty = F.filter(
        F.col("spans"),
        lambda s: F.array_contains(
            F.array(*[F.lit(k) for k in SP.TEXTY_KINDS]), s["kind"]
        )
        & (s["text"] != ""),
    )
    text = F.array_join(F.transform(texty, lambda s: s["text"]), " ")
    return docs_spans.select(
        F.xxhash64("doc_id").alias("doc_id"),
        F.col("doc_id").alias("doc_url"),
        text.alias("text"),
    ).filter(F.col("text") != "")


class DatasetBuilder:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str | pathlib.Path,
        gaz_entries,
        triples: DataFrame,
        retain_negative_prob: float = 0.5,
        min_mention_set: int = 2,
        max_mention_set: int = 50,
        vocab_limit: int = 50_000,
    ):
        self.spark = spark
        self.out = pathlib.Path(out_dir)
        self.gaz_entries = gaz_entries
        self.triples = triples
        self.retain = retain_negative_prob
        self.min_set = min_mention_set
        self.max_set = max_mention_set
        self.vocab_limit = vocab_limit

    def _path(self, stage: str) -> pathlib.Path:
        return self.out / stage

    def _done(self, stage: str) -> bool:
        return (self._path(stage) / "_SUCCESS").exists()

    def _write(self, stage: str, df: DataFrame, partition_by: str | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(str(self._path(stage)))

    def _read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(str(self._path(stage)))

    def run(self, docs_spans: DataFrame) -> dict[str, DataFrame]:
        """Run (or resume) every stage; returns the stage DataFrames."""
        skipped = []
        if self._done("corpus"):
            skipped.append("corpus")
        else:
            self._write("corpus", docs_to_corpus(docs_spans))
        corpus = self._read("corpus")

        if self._done("pairs"):
            skipped.append("pairs")
        else:
            sents = M.sentences(corpus)
            pairs = M.mention_pairs(sents, self.gaz_entries)
            labeled = M.relation_join(pairs, self.triples)
            # retain_negative_prob mirrors RelexTsvDataset's
            # retainNegativeProb, which keeps on STRICT draw < prob
            # (RelexTsvDataset.java:146) — not phase 1's <= boundary
            kept = M.downsample_negatives(labeled, self.retain, inclusive=False)
            self._write("pairs", kept)
        pairs = self._read("pairs")

        if self._done("groups"):
            skipped.append("groups")
        else:
            groups = M.assign_split(M.mention_groups(pairs, self.min_set))
            self._write("groups", groups, partition_by="split")
        groups = self._read("groups")

        if self._done("tensors"):
            skipped.append("tensors")
        else:
            chunks = M.tensor_chunks(groups, self.max_set)
            lines = M.encode_tensor_lines(chunks).join(
                groups.select("id1", "id2", "split"), ["id1", "id2"]
            )
            self._write("tensors", lines, partition_by="split")
        tensors = self._read("tensors")

        if self._done("vocab"):
            skipped.append("vocab")
        else:
            # RelexVocab.add counting incl. the '#'-digit-sequence twins
            # (the tensor encoder's OOV-integer fallback can only resolve
            # against a vocab that carries the twin rows)
            counts = (
                ts.vocab_tokens(corpus)
                .groupBy("word")
                .agg(F.count("*").alias("cnt"))
            )
            mc, kept_vocab = ts.choose_vocab_min_count(counts, self.vocab_limit)
            self._write("vocab", kept_vocab.withColumn("min_count", F.lit(mc)))
        vocab = self._read("vocab")

        if self._done("stats"):
            skipped.append("stats")
        else:
            self._write("stats", M.relex_stats(pairs))
        stats = self._read("stats")

        return {
            "corpus": corpus,
            "pairs": pairs,
            "groups": groups,
            "tensors": tensors,
            "vocab": vocab,
            "stats": stats,
            "skipped": skipped,
        }
