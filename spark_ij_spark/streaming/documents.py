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

from spark_ij_spark.operators.pipeline import (
    C4_MIN_STOPWORDS,
    C4_MIN_TOKENS,
    C4_MAX_TOKENS,
    C4_MIN_TTR,
    GOPHER_DUP_BIGRAM_FRAC_MAX,
    GOPHER_DUP_TRIGRAM_FRAC_MAX,
    GOPHER_TOP_TOKEN_FRAC_MAX,
)
from spark_ij_spark.operators.text import (
    BIGRAMS_SPARK,
    EN_STOPWORDS,
    SHINGLES_SPARK,
    TOKENS_SPARK,
    _in_list,
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
    stream==batch test relies on that). Mirrors the thresholds and
    expression fragments of the batch ops exactly."""
    stop = _in_list(EN_STOPWORDS)
    return (
        docs.withColumn("toks", F.expr(TOKENS_SPARK))
        .withColumn("bgs", F.expr(BIGRAMS_SPARK))
        .withColumn("tgs", F.expr(SHINGLES_SPARK))
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.expr(
                "CASE WHEN round(CAST(array_max(transform(array_distinct(toks),"
                " w -> size(filter(toks, x -> x = w)))) AS DOUBLE)"
                f" / size(toks), 6) <= {GOPHER_TOP_TOKEN_FRAC_MAX}"
                " AND round(CASE WHEN size(bgs) = 0 THEN 0.0 ELSE"
                " 1.0 - CAST(size(array_distinct(bgs)) AS DOUBLE) / size(bgs)"
                f" END, 6) <= {GOPHER_DUP_BIGRAM_FRAC_MAX}"
                " AND round(CASE WHEN size(tgs) = 0 THEN 0.0 ELSE"
                " 1.0 - CAST(size(array_distinct(tgs)) AS DOUBLE) / size(tgs)"
                f" END, 6) <= {GOPHER_DUP_TRIGRAM_FRAC_MAX}"
                " THEN 1 ELSE 0 END"
            ).alias("pass_gopher"),
            F.expr(
                f"CASE WHEN size(toks) BETWEEN {C4_MIN_TOKENS} AND {C4_MAX_TOKENS}"
                " AND CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks)"
                f" >= {C4_MIN_TTR}"
                f" AND size(filter(toks, t -> t IN ({stop}))) >= {C4_MIN_STOPWORDS}"
                " THEN 1 ELSE 0 END"
            ).alias("pass_c4"),
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
    from spark_ij_spark.operators.text import (
        BIGRAMS_DUCK,
        SHINGLES_DUCK,
        TOKENS_DUCK,
    )

    stop = _in_list(EN_STOPWORDS)
    return f"""
WITH t AS (
  SELECT source, {TOKENS_DUCK} AS toks FROM documents),
b AS (
  SELECT source, toks, {BIGRAMS_DUCK} AS bgs, {SHINGLES_DUCK} AS tgs FROM t),
m AS (
  SELECT source,
         CASE WHEN
             round(CAST(list_max(list_transform(list_distinct(toks),
                     w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
                   / len(toks), 6) <= {GOPHER_TOP_TOKEN_FRAC_MAX}
         AND round(CASE WHEN len(bgs) = 0 THEN 0.0 ELSE
               1.0 - CAST(len(list_distinct(bgs)) AS DOUBLE) / len(bgs) END, 6)
             <= {GOPHER_DUP_BIGRAM_FRAC_MAX}
         AND round(CASE WHEN len(tgs) = 0 THEN 0.0 ELSE
               1.0 - CAST(len(list_distinct(tgs)) AS DOUBLE) / len(tgs) END, 6)
             <= {GOPHER_DUP_TRIGRAM_FRAC_MAX}
         THEN 1 ELSE 0 END AS pass_gopher,
         CASE WHEN len(toks) BETWEEN {C4_MIN_TOKENS} AND {C4_MAX_TOKENS}
          AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= {C4_MIN_TTR}
          AND len(list_filter(toks, t -> t IN ({stop}))) >= {C4_MIN_STOPWORDS}
         THEN 1 ELSE 0 END AS pass_c4
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
