"""Document line-serialization (M1/M2): one JSON document per line,
the reference's primary inter-stage wire format
(``nlp/.../DocumentSerialize.java:33-107``, layout
``nlp/.../DocumentJSONSerializer.java:58-116``). Gzip+base64 variants
are file-level transport in the reference; Spark's codecs replace them.

Round-trip contract (the TestJSON pattern, ``TestJSON.java:91-145``):
deserialize(serialize(doc)) preserves doc_id and the exact span sequence
(kind, text, media_ref, offset, order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_STRUCT)),
    ]
)


def docs_to_json_lines(docs: DataFrame) -> DataFrame:
    """(value string): one JSON object per document line."""
    return docs.select(
        F.to_json(F.struct("doc_id", "spans")).alias("value")
    )


def docs_from_json_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse one-doc-per-line JSON back into (doc_id, spans); malformed
    lines become NULL doc_id rows (caller filters / audits them — the
    reference's sniffing deserializer raises instead,
    DocumentSerialize.java:82-107)."""
    parsed = lines.select(F.from_json(F.col(col), DOC_SCHEMA).alias("d"))
    return parsed.select(F.col("d.doc_id").alias("doc_id"), F.col("d.spans").alias("spans"))
