"""JSONL/CSV corpus ingest and partitioned-parquet egress."""

from __future__ import annotations

import csv
import json
import os

from pyspark.sql import functions as F

from spark_ij_spark.sources import documents as doc_src

from .conftest import SF_DIR


def _load_docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_jsonl_roundtrip_matches_parquet(spark, tmp_path):
    docs = _load_docs(spark).orderBy("doc_id")
    rows = [r.asDict() for r in docs.collect()]
    shard = tmp_path / "docs.jsonl"
    with open(shard, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    back = doc_src.read_documents_jsonl(spark, str(shard))
    clean, bad = doc_src.split_corrupt(back)
    assert bad.count() == 0
    got = sorted(
        (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in clean.collect()
    )
    want = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]) for r in rows
    )
    assert got == want


def test_jsonl_malformed_lines_quarantined_not_dropped(spark, tmp_path):
    shard = tmp_path / "docs.jsonl"
    with open(shard, "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": "ok", "lang": "en",
                             "source": "web", "n_chars": 2}) + "\n")
        fh.write("{not json at all\n")
        fh.write(json.dumps({"doc_id": 2, "text": "fine", "lang": "en",
                             "source": "web", "n_chars": 4}) + "\n")
    clean, bad = doc_src.split_corrupt(doc_src.read_documents_jsonl(spark, str(shard)))
    assert clean.count() == 2
    quarantined = [r[0] for r in bad.collect()]
    assert quarantined == ["{not json at all"]


def test_csv_roundtrip_matches_parquet(spark, tmp_path):
    docs = _load_docs(spark)
    rows = [r.asDict() for r in docs.collect()]
    shard = tmp_path / "docs.csv"
    with open(shard, "w", newline="") as fh:
        wr = csv.writer(fh, quoting=csv.QUOTE_ALL)
        wr.writerow(["doc_id", "text", "lang", "source", "n_chars"])
        for r in rows:
            wr.writerow([r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]])
    clean, bad = doc_src.split_corrupt(doc_src.read_documents_csv(spark, str(shard)))
    assert bad.count() == 0
    got = sorted(
        (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in clean.collect()
    )
    want = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]) for r in rows
    )
    assert got == want


def test_write_corpus_partition_layout_and_pruning(spark, tmp_path):
    docs = _load_docs(spark)
    out = str(tmp_path / "corpus")
    doc_src.write_corpus(docs, out, partition_cols=("lang",))
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert dirs == {f"lang={lang}" for lang in langs}
    # partition pruning: a per-language read lists only that directory
    back = spark.read.parquet(out)
    one = sorted(langs)[0]
    pruned = back.where(F.col("lang") == one)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert pruned.count() == docs.where(F.col("lang") == one).count()
    # full roundtrip preserves the corpus
    assert back.count() == docs.count()
