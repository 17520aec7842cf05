"""The fetch stage (S3-S7): scheduled URLs -> page payloads, as an
Arrow-batched ``mapInPandas`` with the reference's retry/timeout/metrics
contract (``corpus/.../crawl/SaveCommonCrawlBase.java:90-202``: 5 s
timeouts, <=3 attempts with backoff, exception histograms).

The fetcher callable is pluggable:
* production: an HTTP client (requests/urllib) — NOT exercised in this
  sandbox (no network);
* tests/fixtures: a deterministic lookup into the documents table or a
  synthetic byte generator.

Outcome accounting rides on columns (status, attempts, error), so the
A12 exception histogram is one groupBy over the fetch output instead of
driver-side counters.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_SCHEMA = (
    "url string, status string, attempts int, error string, payload binary"
)

_FETCH_COLS = ["url", "status", "attempts", "error", "payload"]

MAX_ATTEMPTS = 3  # SaveCommonCrawlBase.java:103-111
RETRY_SLEEP_S = 2.0  # SaveCommonCrawlBase.java:108 (2 s between attempts)


def fetch_batch(
    batch: DataFrame,
    fetcher: Callable[[str], bytes],
    url_col: str = "url",
    max_attempts: int = MAX_ATTEMPTS,
    retry_sleep_s: float = RETRY_SLEEP_S,
) -> DataFrame:
    """Fetch every URL with bounded retries; one row per URL with
    status in {fetched, failed}, attempt count, and last error.

    ``retry_sleep_s`` is the reference's fixed 2 s inter-attempt sleep
    (an immediate tight-loop retry hammers the struggling host and
    defeats the retry's purpose); fixture fetchers pass 0. Connect/read
    TIMEOUTS are the fetcher callable's responsibility — it owns the
    socket (build the production fetcher with ``timeout=5`` per the
    reference contract); nothing in this stage can bound an arbitrary
    callable without a watchdog thread per row."""
    import time as _time

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                payload, err, attempts = None, None, 0
                for attempts in range(1, max_attempts + 1):
                    try:
                        payload = fetcher(url)
                        err = None
                        break
                    except Exception as e:  # noqa: BLE001 - histogram contract
                        err = f"{type(e).__name__}: {e}"[:200]
                        if attempts < max_attempts and retry_sleep_s > 0:
                            _time.sleep(retry_sleep_s)
                rows.append(
                    {
                        "url": url,
                        "status": "fetched" if payload is not None else "failed",
                        "attempts": attempts,
                        "error": err,
                        "payload": payload,
                    }
                )
            # explicit columns: an EMPTY batch otherwise yields a
            # zero-column frame that breaks the Arrow schema contract
            yield pd.DataFrame(rows, columns=_FETCH_COLS)

    return batch.select(url_col).mapInPandas(process, FETCH_SCHEMA)


def error_histogram(fetched: DataFrame) -> DataFrame:
    """A12 exception histogram (SaveCommonCrawlBase.java:150-196):
    error-type -> count, plus the success row keyed '__ok__'."""
    # a failed row whose error is NULL or unclassifiable must never read
    # as a success: '__ok__' is reserved for status == fetched.
    # regexp_extract is NULL on NULL input and '' on no-match; nullif
    # folds both into the '__unknown__' bucket with ONE evaluation.
    err_key = F.coalesce(
        F.nullif(F.regexp_extract("error", r"^(\w+):", 1), F.lit("")),
        F.lit("__unknown__"),
    )
    return (
        fetched.withColumn(
            "error_type",
            F.when(F.col("status") == "fetched", F.lit("__ok__")).otherwise(err_key),
        )
        .groupBy("error_type")
        .agg(F.count("*").alias("n"), F.sum("attempts").alias("total_attempts"))
    )


def make_fixture_fetcher(doc_map: dict[str, bytes]) -> Callable[[str], bytes]:
    """Deterministic fetcher over an in-memory url->payload map (ships to
    executors via closure/broadcast); unknown URLs raise KeyError like a
    404 path."""

    def fetcher(url: str) -> bytes:
        return doc_map[url]

    return fetcher
