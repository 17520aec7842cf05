"""spark-submit entry for the end-to-end dataset build (the reference's
RelexBuildDataset workflow): crawl-emitted span docs -> mention-group
tensor dataset with resume. Submit via tools/submit.sh pattern:

    spark-submit --py-files cc_dbp_spark.zip tools/run_dataset.py \
        --docs .../documents_spans.parquet --triples .../triples.parquet \
        --out .../dataset
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from cc_dbp_spark.plans.pipeline import DatasetBuilder

DEFAULT_GAZ_WORDS = [
    "data", "spark", "crawl", "frontier", "host", "link", "queue", "index",
    "page", "fetch", "media", "text",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="interleaved span docs parquet")
    ap.add_argument("--triples", help="GT triples parquet (arg1, rel, arg2)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--retain-neg", type=float, default=0.5)
    ap.add_argument("--min-set", type=int, default=2)
    ap.add_argument("--max-set", type=int, default=50)
    ap.add_argument("--vocab-limit", type=int, default=50_000)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("cc-dbp-spark-dataset")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    gaz = [(f"ent:{w}", (w,), False) for w in DEFAULT_GAZ_WORDS]
    if args.triples:
        triples = spark.read.parquet(args.triples)
    else:
        triples = spark.createDataFrame(
            [(f"ent:{a}", "rel:adj", f"ent:{b}")
             for a, b in zip(DEFAULT_GAZ_WORDS, DEFAULT_GAZ_WORDS[1:])],
            "arg1 string, rel string, arg2 string",
        )
    b = DatasetBuilder(
        spark, args.out, gaz, triples,
        retain_negative_prob=args.retain_neg,
        min_mention_set=args.min_set,
        max_mention_set=args.max_set,
        vocab_limit=args.vocab_limit,
    )
    res = b.run(spark.read.parquet(args.docs))
    print(
        f"dataset built: groups={res['groups'].count()} "
        f"tensor_lines={res['tensors'].count()} "
        f"skipped={res['skipped']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
