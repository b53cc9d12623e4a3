"""Text-corpus ingest/egress beyond parquet: JSONL and CSV readers,
and a partitioned parquet corpus writer.

LLM training corpora arrive overwhelmingly as JSON-Lines shards (one
doc per line) and occasionally CSV; the cleaned corpus leaves as
hive-partitioned parquet. These wrappers pin the three decisions that
matter at 100 TB:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over the data to infer one — at corpus
  scale that doubles ingest cost and can mis-type sparse columns.
  The documents schema is declared once (`DOCUMENTS_SCHEMA`).
- **PERMISSIVE with a corrupt-record column.** Web-scale shards always
  contain some malformed lines; failing the job (FAILFAST) or silently
  dropping (DROPMALFORMED) are both wrong for an auditable pipeline.
  Bad lines land in ``_corrupt_record`` so a downstream filter can
  count and quarantine them.
- **Splittable inputs.** Plain-text JSONL/CSV is line-splittable, so
  Spark parallelizes within files; the writer emits snappy parquet
  partitioned by low-cardinality columns only (a high-cardinality
  partitionBy explodes the file count — the small-files problem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# Reader-visible schema: the declared columns plus the quarantine
# column malformed lines are routed into.
_READ_SCHEMA = T.StructType(
    list(DOCUMENTS_SCHEMA.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSON-Lines documents shard (one JSON object per line)
    with the explicit corpus schema; malformed lines are preserved in
    ``_corrupt_record`` instead of failing or vanishing."""
    return (
        spark.read.schema(_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a CSV documents shard (header row, quoted text fields)
    with the explicit corpus schema and PERMISSIVE corrupt-record
    quarantine."""
    return (
        spark.read.schema(_READ_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", "false")
        .option("escape", '"')
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split an ingest frame into (clean, quarantined) — clean rows
    drop the corrupt column; quarantined rows keep the raw line for
    audit.

    The parsed frame is cached first: Spark disallows queries whose
    referenced file columns are ONLY the internal corrupt-record
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    its documented workaround is materializing the parse once. That
    one cached pass is also what you want operationally — ingest is
    read-once anyway, and both halves then come from the same parse
    instead of two file scans.
    """
    df = df.cache()
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


def write_corpus(df: DataFrame, path: str, partition_cols: tuple[str, ...] = ("lang",)) -> None:
    """Write a cleaned corpus as hive-partitioned snappy parquet.

    ``partition_cols`` must be low-cardinality (lang, source, split —
    never doc_id): each distinct combination becomes a directory, and
    partition pruning then serves per-language / per-split reads
    without touching the rest of the corpus.
    """
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .option("compression", "snappy")
        .parquet(path)
    )
