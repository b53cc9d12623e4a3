"""Streaming corpus ingest: quality filtering on a documents stream.

The filter-on-ingest shape of a training-data pipeline — documents
arrive as files (crawl shards), and the SAME Catalyst expressions the
batch Gopher/C4 filters use run unchanged on the stream: map-only
transformations are trigger-agnostic, so stream==batch equivalence is
exact (no state, no watermark required). Per-source accounting uses a
streaming aggregation (complete mode) as the audit feed.

At scale: a file-source stream over crawl shards with
``maxFilesPerTrigger`` is the standard backfill/ingest pattern; the
filter stage adds zero shuffles, and the accounting aggregate keeps
only O(sources) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from spark_ij_spark.operators.pipeline import c4_pass_spark, gopher_pass_spark
from spark_ij_spark.operators.text import (
    BIGRAMS_SPARK,
    SHINGLES_SPARK,
    TOKENS_SPARK,
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over documents parquet (crawl-shard replay)."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA).option(
        "pathGlobFilter", glob
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(sf_dir)


def quality_flags(docs: DataFrame) -> DataFrame:
    """Per-doc Gopher repetition + C4 rule verdicts — one map-only
    projection, valid on a stream or a batch frame unchanged (the
    stream==batch test relies on that). The pass expressions are the
    pipeline module's OWN fragments (gopher_pass_spark/c4_pass_spark),
    so the ingest filter can never silently diverge from the batch
    filters it mirrors."""
    return (
        docs.withColumn("toks", F.expr(TOKENS_SPARK))
        .withColumn("bgs", F.expr(BIGRAMS_SPARK))
        .withColumn("tgs", F.expr(SHINGLES_SPARK))
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.expr(gopher_pass_spark()).alias("pass_gopher"),
            F.expr(c4_pass_spark()).alias("pass_c4"),
        )
    )


def clean_stream(docs: DataFrame) -> DataFrame:
    """Documents passing BOTH filter families — the ingest-side keep
    set. Map-only: append-mode safe, no watermark needed."""
    flagged = quality_flags(docs)
    return flagged.filter(
        (F.col("pass_gopher") == 1) & (F.col("pass_c4") == 1)
    ).select("doc_id", "lang", "source", "n_chars")


def source_audit(docs: DataFrame) -> DataFrame:
    """Per-source running keep/drop accounting (complete-mode streaming
    aggregate, O(sources) state) — the audit feed a 100 TB ingest tails
    to see filter health per crawl source."""
    return quality_flags(docs).groupBy("source").agg(
        F.count("*").alias("n_seen"),
        F.sum("pass_gopher").alias("n_pass_gopher"),
        F.sum("pass_c4").alias("n_pass_c4"),
        F.sum(
            F.expr("CASE WHEN pass_gopher = 1 AND pass_c4 = 1 THEN 1 ELSE 0 END")
        ).alias("n_kept"),
    )


def q_documents_ingest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming ``source_audit`` — the SAME
    ``quality_flags`` + aggregate expressions over the batch documents
    frame (map-only stages are trigger-agnostic, so this IS the
    streaming computation, just on a bounded frame). Exists so the
    streaming ingest path carries driver-graded hash evidence, not
    only the stream==batch pytest."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return source_audit(docs)


def _ingest_audit_sql() -> str:
    from spark_ij_spark.operators.pipeline import c4_pass_duck, gopher_pass_duck
    from spark_ij_spark.operators.text import (
        BIGRAMS_DUCK,
        SHINGLES_DUCK,
        TOKENS_DUCK,
    )

    return f"""
WITH t AS (
  SELECT source, {TOKENS_DUCK} AS toks FROM documents),
b AS (
  SELECT source, toks, {BIGRAMS_DUCK} AS bgs, {SHINGLES_DUCK} AS tgs FROM t),
m AS (
  SELECT source,
         {gopher_pass_duck()} AS pass_gopher,
         {c4_pass_duck()} AS pass_c4
  FROM b)
SELECT source, COUNT(*) AS n_seen,
       CAST(SUM(pass_gopher) AS BIGINT) AS n_pass_gopher,
       CAST(SUM(pass_c4) AS BIGINT) AS n_pass_c4,
       CAST(SUM(CASE WHEN pass_gopher = 1 AND pass_c4 = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM m GROUP BY source
"""


QUERIES = {"documents_ingest_audit": q_documents_ingest_audit}
ORACLES = {"documents_ingest_audit": _ingest_audit_sql()}
