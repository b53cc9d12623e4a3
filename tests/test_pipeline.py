"""Training-pipeline ops (hash split, sequence packing, contamination):
oracle matches plus semantic invariants."""

from __future__ import annotations

import math

import pytest

from spark_ij_spark.operators import pipeline

from .conftest import assert_oracle_match


@pytest.mark.parametrize("name", sorted(pipeline.QUERIES))
def test_pipeline_query_matches_oracle(spark, duck, name):
    assert_oracle_match(
        spark, duck, pipeline.QUERIES[name], pipeline.ORACLES[name]
    )


def test_hash_split_is_deterministic_and_near_80_10_10(spark, sf_dir):
    rows = {r.split: r for r in pipeline.q_pipeline_hash_split(spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    total = sum(r.n_docs for r in rows.values())
    # hash split targets 80/10/10; allow sampling noise at small SF
    assert rows["train"].n_docs / total == pytest.approx(0.8, abs=0.08)
    # determinism: re-running yields the identical per-split counts
    again = {r.split: r.n_docs for r in pipeline.q_pipeline_hash_split(spark, sf_dir).collect()}
    assert again == {k: v.n_docs for k, v in rows.items()}


def test_pack_sequences_bins_respect_budget_shape(spark, sf_dir):
    """Contiguous fill: every bin except a stream's last starts because
    the previous bin crossed the budget, so each (lang, shard) stream's
    bin ids are dense 0..max with no gaps."""
    rows = pipeline.q_pipeline_pack_sequences(spark, sf_dir).collect()
    assert rows
    by_stream: dict[tuple, list] = {}
    for r in rows:
        by_stream.setdefault((r.lang, r.shard), []).append(r)
    for key, rs in by_stream.items():
        bins = sorted(r.seq_bin for r in rs)
        assert bins == list(range(len(bins))), f"{key}: bins not dense {bins[:5]}"
        assert all(r.n_docs > 0 for r in rs)


def test_source_mix_rates_are_applied(spark, sf_dir):
    """Per-source kept fraction tracks the configured rate (hash
    sampling noise bounded at small N), and 100%-rate sources keep
    everything."""
    rows = {r.source: r for r in pipeline.q_pipeline_source_mix(spark, sf_dir).collect()}
    for src, r in rows.items():
        pct = pipeline.SOURCE_MIX_PCT.get(src, pipeline.SOURCE_MIX_DEFAULT_PCT)
        assert 0 <= r.n_kept <= r.n_total
        if pct == 100:
            assert r.n_kept == r.n_total
        else:
            assert abs(r.n_kept / r.n_total - pct / 100.0) < 0.35
    # determinism
    again = {r.source: r.n_kept for r in pipeline.q_pipeline_source_mix(spark, sf_dir).collect()}
    assert again == {s: r.n_kept for s, r in rows.items()}


def test_clean_corpus_strictly_filters(spark, duck, sf_dir):
    """The composition filter keeps a non-trivial, strictly smaller
    corpus, and the per-language counts never exceed the raw counts."""
    kept = {r.lang: r.n_docs for r in pipeline.q_pipeline_clean_corpus(spark, sf_dir).collect()}
    raw = dict(duck.execute("SELECT lang, COUNT(*) FROM documents GROUP BY lang").fetchall())
    assert kept and all(n > 0 for n in kept.values())
    assert sum(kept.values()) < sum(raw.values())
    for lang, n in kept.items():
        assert n <= raw[lang]


def test_contamination_flags_only_cross_set_pairs(spark, sf_dir):
    rows = pipeline.q_pipeline_contamination(spark, sf_dir).collect()
    assert rows, "synthetic near-dup corpus should contaminate"
    for r in rows:
        assert r.eval_doc % pipeline.CONTAM_EVAL_MOD == 0
        assert r.train_doc % pipeline.CONTAM_EVAL_MOD != 0
        assert r.n_shared >= 1


def test_gopher_filter_is_nonvacuous(spark, sf_dir):
    """The repetition rules must actually split the corpus (drop some,
    keep some) and report fractions in [0, 1]."""
    rows = pipeline.q_pipeline_gopher_quality(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    kept = sum(r.n_kept for r in rows)
    assert 0 < kept < total
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        assert 0.0 <= r.avg_top_frac <= 1.0
        assert 0.0 <= r.avg_dup_bigram <= 1.0


def test_c4_filter_rule_attribution_is_consistent(spark, sf_dir):
    """Per-rule failure counts bound the kept count: a doc survives only
    when it fails zero rules."""
    rows = pipeline.q_pipeline_c4_filter(spark, sf_dir).collect()
    total = sum(r.n_total for r in rows)
    kept = sum(r.n_kept for r in rows)
    assert 0 < kept < total
    for r in rows:
        worst = max(r.n_fail_len, r.n_fail_ttr, r.n_fail_stop)
        sum_fails = r.n_fail_len + r.n_fail_ttr + r.n_fail_stop
        assert r.n_kept <= r.n_total - worst
        assert r.n_kept >= r.n_total - sum_fails


def test_stratified_sample_shape_and_determinism(spark, sf_dir, duck):
    """Exactly K docs per language (when the stratum is big enough),
    dense ranks, and the identical sample on re-run."""
    rows = pipeline.q_pipeline_stratified_sample(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    sizes = dict(
        duck.execute(
            "SELECT lang, COUNT(*) FROM documents GROUP BY lang"
        ).fetchall()
    )
    for lang, rs in by_lang.items():
        want = min(pipeline.SAMPLE_PER_STRATUM, sizes[lang])
        assert len(rs) == want
        assert sorted(r.rk for r in rs) == list(range(1, want + 1))
    again = {(r.lang, r.rk, r.doc_id) for r in
             pipeline.q_pipeline_stratified_sample(spark, sf_dir).collect()}
    assert again == {(r.lang, r.rk, r.doc_id) for r in rows}


def test_token_budget_subset_is_budget_bound(spark, sf_dir, duck):
    """Each language's kept set exhausts the budget in hash order: the
    tokens BEFORE every kept doc are under budget, and the kept set
    actually reaches the budget whenever the stratum can fill it
    (else it must be the whole stratum)."""
    rows = pipeline.q_pipeline_token_budget(spark, sf_dir).collect()
    assert rows
    # independent per-language totals: can each stratum fill the budget?
    stratum = {
        lang: (int(tok), int(n))
        for lang, tok, n in duck.execute(
            "SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT),"
            " COUNT(*) FROM documents GROUP BY lang"
        ).fetchall()
    }
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == set(stratum)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.cum_tokens)
        # exclusive cumsum under budget for every kept doc
        assert all(
            r.cum_tokens - r.n_tok < pipeline.TOKEN_BUDGET_PER_LANG for r in rs
        )
        total = rs[-1].cum_tokens
        full_tokens, full_docs = stratum[lang]
        if full_tokens >= pipeline.TOKEN_BUDGET_PER_LANG:
            # enough material: the kept set must actually hit the budget
            assert total >= pipeline.TOKEN_BUDGET_PER_LANG, (lang, total)
        else:
            # not enough material: keep everything
            assert len(rs) == full_docs and total == full_tokens
        # cum_tokens is a proper running sum of the kept prefix
        run = 0
        for r in rs:
            run += r.n_tok
            assert r.cum_tokens == run


def test_redact_terms_audit_consistency(spark, sf_dir):
    """Redaction audit: chars balance exactly (original chars − masked
    chars + mask token chars = redacted corpus chars) and docs_affected
    never exceeds n_docs."""
    rows = pipeline.q_pipeline_redact_terms(spark, sf_dir).collect()
    assert rows, "audit must cover every source"
    from spark_ij_spark.operators.text import _docs

    orig = {
        r.source: r.chars
        for r in _docs(spark, sf_dir)
        .groupBy("source")
        .agg(__import__("pyspark").sql.functions.expr(
            "CAST(SUM(length(text)) AS BIGINT)").alias("chars"))
        .collect()
    }
    mask_len = len(pipeline.REDACT_MASK)
    for r in rows:
        assert 0 <= r.docs_affected <= r.n_docs
        assert r.redacted_corpus_chars == (
            orig[r.source] - r.chars_redacted + r.terms_redacted * mask_len
        )


def test_curriculum_mix_rates_monotone(spark, sf_dir):
    """Higher-quality buckets keep a (weakly) larger fraction, the top
    bucket keeps everything, and bucket bounds respect the edges."""
    rows = sorted(
        pipeline.q_pipeline_curriculum_mix(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    fracs = [r.n_kept / r.n_docs for r in rows]
    top = rows[-1]
    assert top.n_kept == top.n_docs  # 100% keep rate
    # sampling noise at small strata: check ordering loosely via rates
    for i, r in enumerate(rows):
        assert r.n_kept <= r.n_docs
        lo = pipeline.CURRICULUM_EDGES[i - 1] if i > 0 else 0.0
        hi = (
            pipeline.CURRICULUM_EDGES[i]
            if i < len(pipeline.CURRICULUM_EDGES)
            else 1.0
        )
        assert lo <= r.min_q <= r.max_q <= hi + 1e-9
    assert fracs[-1] >= fracs[0]


def test_shard_order_is_a_permutation(spark, sf_dir):
    """Every doc appears exactly once; positions are 1..len(shard) per
    shard; assignment is deterministic across runs."""
    rows = pipeline.q_pipeline_shard_order(spark, sf_dir).collect()
    docs = [r.doc_id for r in rows]
    assert len(docs) == len(set(docs))
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(pipeline.ORDER_SHARDS))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    again = {
        (r.doc_id): (r.shard, r.pos)
        for r in pipeline.q_pipeline_shard_order(spark, sf_dir).collect()
    }
    assert again == {r.doc_id: (r.shard, r.pos) for r in rows}


def test_padding_waste_monotone_tradeoff(spark):
    """Dyadic granularities nest, so padded totals are nondecreasing
    and shape counts nonincreasing as granularity coarsens; waste_ppm
    must be the integer-division of its own fields."""
    from spark_ij_spark.operators.pipeline import (
        PAD_GRANULARITIES,
        q_pipeline_padding_waste,
    )

    from .conftest import SF_DIR

    rows = {
        r.granularity: r
        for r in q_pipeline_padding_waste(spark, SF_DIR).collect()
    }
    assert sorted(rows) == sorted(PAD_GRANULARITIES)
    prev = None
    for g in sorted(rows):
        r = rows[g]
        assert r.padded_tokens >= r.sum_tokens
        # Same one-multiply-one-divide IEEE order as both engines (the
        # BIGINT-numerator form would overflow at 100 TB token counts).
        assert r.waste_ppm == math.floor(
            1e6 * (r.padded_tokens - r.sum_tokens) / r.padded_tokens
        )
        if prev is not None:
            assert r.padded_tokens >= prev.padded_tokens
            assert r.n_shapes <= prev.n_shapes
        prev = r


def test_dsir_select_structure_and_determinism(spark, sf_dir):
    """DSIR selection: never emits target-domain docs, scores stay in
    the clipped [0, W_CAP] range, the slice is top-K-bounded, and the
    two-phase (calibrate → literal-weight apply) pipeline is
    deterministic across invocations (fresh weight collect each call)."""
    rows = pipeline.q_pipeline_dsir_select(spark, sf_dir).collect()
    assert 0 < len(rows) <= pipeline.DSIR_TOP_K
    for r in rows:
        assert r.source != pipeline.DSIR_TARGET_SOURCE
        assert 0 <= r.imp_ppm <= pipeline.DSIR_W_CAP
        assert r.n_toks >= 1
    again = pipeline.q_pipeline_dsir_select(spark, sf_dir).collect()
    assert {(r.doc_id, r.imp_ppm) for r in rows} == {
        (r.doc_id, r.imp_ppm) for r in again
    }


def test_salted_stratum_windows_fire_and_match_oracle(spark, duck, tmp_path):
    """The r11 salted two-stage stratum windows (stratified_sample /
    weighted_sample top-k, token_budget budget walk — see PIPE_SALTS)
    are DORMANT at the driver's correctness SF: sf0.01 holds ~4 docs
    per (lang, salt) bucket, under every K and budget, so a drift
    between the two-stage form and the unchanged single-window DuckDB
    oracles would grade green and only diverge at sf0.1+. Inject a
    corpus dense enough that EVERY stage-1 prune fires — including
    token_budget's dropped-doc interplay (docs whose bucket prefix
    exceeds the budget mid-walk, the subtle branch of the exactness
    proof) — and assert full driver-style cross-engine identity."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 6000
    doc_ids, texts, langs, sources, ntoks = [], [], [], [], []
    for i in range(n):
        # 2 strata x 32 salt buckets ~ 94 docs/bucket: > SAMPLE_PER_
        # STRATUM (20), > WS_K (10), and bucket token prefixes blow
        # through TOKEN_BUDGET_PER_LANG (1000) mid-walk. Every 97th
        # doc is a 1200-token giant so stage-1 budget drops interleave
        # with survivors (the proof's hard case).
        ntok = 1200 if i % 97 == 0 else 5 + (i * 13) % 60
        ntoks.append(ntok)
        doc_ids.append(i)
        texts.append(" ".join(f"w{j % 11}" for j in range(ntok)))
        langs.append("en" if i % 2 == 0 else "de")
        sources.append(f"src{i % 8}")
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    # the prunes actually fire: every (lang, salt) bucket holds more
    # rows than the largest K and more tokens than the budget
    from collections import Counter

    bucket_rows: Counter = Counter()
    bucket_toks: Counter = Counter()
    for i, nt in zip(doc_ids, ntoks):
        key = (langs[i], i % pipeline.PIPE_SALTS)
        bucket_rows[key] += 1
        bucket_toks[key] += nt
    assert min(bucket_rows.values()) > pipeline.SAMPLE_PER_STRATUM
    assert pipeline.SAMPLE_PER_STRATUM > pipeline.WS_K
    assert min(bucket_toks.values()) > pipeline.TOKEN_BUDGET_PER_LANG
    # calibrated_mix's r11 order-aligned bucket decomposition (see
    # MIX_RANGE_BITS): replay the bucket walk in plain Python and
    # assert every interesting branch is LIVE on this corpus — whole
    # buckets pruned (off > budget), buckets holding >= 2 docs (the
    # local_cum + offset composition), and a boundary bucket where the
    # walk keeps some docs and drops others mid-bucket.
    import hashlib
    from collections import defaultdict

    bt_tok: Counter = Counter()
    bucket_docs = defaultdict(list)
    avail_t: Counter = Counter()
    for i, nt in zip(doc_ids, ntoks):
        t = int(sources[i][3:]) % 4
        h = int(hashlib.md5(f"mix:{i}".encode()).hexdigest()[:15], 16)
        b = h >> (60 - pipeline.MIX_RANGE_BITS)
        bt_tok[(t, b)] += nt
        bucket_docs[(t, b)].append((h, i, nt))
        avail_t[t] += nt
    k = min(
        avail_t[t] * d // nn for t, (nn, d) in pipeline.MIX_TIER_SHARES.items()
    )
    budget_t = {
        t: k * nn // d for t, (nn, d) in pipeline.MIX_TIER_SHARES.items()
    }
    pruned = multi = midbucket_drop = 0
    for t in pipeline.MIX_TIER_SHARES:
        off = 0
        for b in sorted(b for (tt, b) in bt_tok if tt == t):
            if off > budget_t[t]:
                pruned += 1
            elif off <= budget_t[t] < off + bt_tok[(t, b)]:
                cum, kept, drop = off, 0, 0
                for h, i, nt in sorted(bucket_docs[(t, b)]):
                    cum += nt
                    kept, drop = kept + (cum <= budget_t[t]), drop + (
                        cum > budget_t[t]
                    )
                if kept and drop:
                    midbucket_drop += 1
            off += bt_tok[(t, b)]
        multi += sum(
            1
            for (tt, b), ds in bucket_docs.items()
            if tt == t and len(ds) >= 2
        )
    assert pruned > 0 and multi > 0 and midbucket_drop > 0
    for name in (
        "pipeline_stratified_sample",
        "pipeline_weighted_sample",
        "pipeline_token_budget",
        "pipeline_calibrated_mix",
    ):
        assert_oracle_match(
            spark,
            duck,
            pipeline.QUERIES[name],
            pipeline.ORACLES[name],
            sf_dir=str(tmp_path),
        )
