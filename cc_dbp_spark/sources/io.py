"""Sources & sinks (SURVEY §2.1) — thin, mode-checked wrappers around
Spark's parquet/text readers so every job shares one IO contract.

Reference semantics:
* fail-if-output-exists (S2): ``spark/.../SimpleSparkJob.java:49-58``
  refuses to overwrite a finished stage's output — the resume primitive;
* rotating part files (S11): new part every N records,
  ``kbp/.../GazetteerEDL.java:95-122`` -> ``maxRecordsPerFile``;
* split-partitioned dataset (S12): train/val/test directories from the
  deterministic CDF draw, ``spark/.../Base64ToBinary.java:67-124`` ->
  ``partitionBy("split")``;
* line-file scan (S1) / NTriples scan (S8) / simple TSV (S9).
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class OutputExistsError(RuntimeError):
    pass


def _check_fresh(path: str) -> None:
    if pathlib.Path(path).exists():
        raise OutputExistsError(
            f"output {path} already exists (SimpleSparkJob fail-if-exists contract)"
        )


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """S1/S10: parquet table scan."""
    return spark.read.parquet(path)


def write_table(df: DataFrame, path: str, overwrite: bool = False) -> None:
    """S2: refuse to overwrite unless explicitly asked."""
    if not overwrite:
        _check_fresh(path)
    df.write.mode("overwrite" if overwrite else "error").parquet(path)


def write_rotating(df: DataFrame, path: str, max_records_per_file: int) -> None:
    """S11: rotate part files every N records."""
    _check_fresh(path)
    df.write.option("maxRecordsPerFile", max_records_per_file).parquet(path)


def write_split_dataset(df: DataFrame, path: str, split_col: str = "split") -> None:
    """S12: one directory per train/val/test split."""
    _check_fresh(path)
    df.write.partitionBy(split_col).parquet(path)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """S8 NTriples scan: ``<arg1> <rel> <arg2> .`` lines -> 3 columns
    (``util/.../formats/NTriples.java:35-52``; comment/blank lines
    dropped, object may be an IRI or a quoted literal)."""
    lines = spark.read.text(path).filter(
        (F.col("value") != "") & ~F.col("value").startswith("#")
    )
    pat = r"^\s*<([^>]*)>\s+<([^>]*)>\s+(.*?)\s*\.\s*$"
    parsed = lines.select(
        F.regexp_extract("value", pat, 1).alias("arg1"),
        F.regexp_extract("value", pat, 2).alias("rel"),
        F.regexp_extract("value", pat, 3).alias("arg2_raw"),
    ).filter(F.col("arg1") != "")
    arg2 = F.when(
        F.col("arg2_raw").startswith("<"),
        F.regexp_extract("arg2_raw", r"^<([^>]*)>", 1),
    ).otherwise(F.regexp_extract("arg2_raw", r'^"((?:[^"\\]|\\.)*)"', 1))
    return parsed.select("arg1", "rel", arg2.alias("arg2"))


def read_simple_tsv(spark: SparkSession, path: str, columns: list[str]) -> DataFrame:
    """S9 simple-TSV scan: tab-split, no quoting/escapes
    (``util/.../formats/SimpleTsvIterable.java:27-50``).

    text + split, not the CSV reader: the reference does a plain tab
    split with NO quoting and yields EMPTY STRINGS for empty fields,
    while Spark's CSV source reads empty fields as null (and applies
    quote handling). A line with fewer fields than ``columns`` yields
    null for the missing tail — the per-line analogue of the
    reference's variable-length parts arrays (callers check length)."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    # F.get: NULL beyond the last field even under ANSI (getItem throws)
    return lines.select(
        *[F.get(parts, i).alias(name) for i, name in enumerate(columns)]
    )
