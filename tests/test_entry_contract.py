"""Driver-contract invariants for ``__spark_entry__`` — pure Python,
no Spark session. These lock in the grading-window mechanics that
starved the TPC-H tail for six rounds (VERDICT r6 "What's wrong" #2):
the contract is only as good as its bookkeeping, and every failure
mode here is silent at runtime (a forgotten QUERY_AGE entry just
sorts newest; a dropped oracle just downgrades to rows-only)."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.abspath(entry.__file__))

# The single source of truth for rows-only-by-design queries is
# entry.SKETCH_QUERIES (sketch name -> exact hash-graded twin, or None
# for the zlib query whose exact twin is a pytest). Growing that set
# must be a deliberate act: every other query MUST carry an exact
# DuckDB oracle.


def test_every_query_has_an_oracle_or_is_documented_rows_only():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) - set(osql) == set(entry.SKETCH_QUERIES)
    # No orphan oracles: an oracle whose query was renamed/dropped is
    # dead weight the driver never runs.
    assert set(osql) <= set(qs)


def test_sketch_queries_have_adjacent_hash_graded_twins():
    """The 4-sketch convention, verifiable from one place (VERDICT r10
    #5): each sketch query's exact twin exists, IS hash-graded (has an
    oracle), and sits immediately after the sketch in queries() order —
    so a scheduled 'no_oracle' artifact row always has its twin's
    hash-green row in the same driver window."""
    qs, osql = entry.queries(), entry.oracle_sql()
    names = list(qs)
    for sketch, twin in entry.SKETCH_QUERIES.items():
        assert sketch in qs and sketch not in osql
        if twin is None:
            continue  # exact pytest twin (zlib recompute, test_north_star)
        assert twin in osql, f"{sketch}: twin {twin} must be hash-graded"
        assert names.index(twin) == names.index(sketch) + 1, (
            f"{sketch}: twin {twin} not adjacent in queries() order"
        )


def test_every_query_has_a_query_age_entry():
    """A missing QUERY_AGE entry silently sorts the query NEWEST among
    never-graded — exactly the starvation `_grading_order` exists to
    prevent. Fail loudly instead."""
    with open(os.path.join(REPO, "QUERY_AGE.json")) as fh:
        ages = json.load(fh)
    names = set(entry.queries())
    assert names - set(ages) == set(), "new query missing QUERY_AGE entry"
    assert set(ages) - names == set(), "QUERY_AGE has stale entries"
    assert all(isinstance(v, int) and v >= 1 for v in ages.values())


def test_grading_order_is_a_permutation_with_stalest_first():
    qs = entry.queries()
    names = list(qs)
    # Permutation: rotation must never drop or duplicate a query.
    assert sorted(names) == sorted(set(names))
    # Recompute last-graded from the same artifacts the function reads
    # (errored grades are NOT evidence) and assert the dict order is
    # non-decreasing in it — never-graded (-1) strictly first.
    last: dict[str, int] = {}
    import glob

    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as fh:
            for q, rec in json.load(fh).items():
                err = rec.get("err") if isinstance(rec, dict) else None
                if err not in (None, "no_oracle"):
                    continue
                last[q] = max(last.get(q, 0), rnd)
    # A revision newer than the last green grade voids the evidence
    # (QUERY_REVISED.json) — mirror of the production rule.
    try:
        with open(os.path.join(REPO, "QUERY_REVISED.json")) as fh:
            for q, rev in json.load(fh).items():
                if last.get(q, 0) < rev:
                    last.pop(q, None)
    except FileNotFoundError:
        pass
    # sketch twins are deliberately moved adjacent to their sketch
    # (out of staleness order) — exempt them from the monotonic check
    twins = {t for t in entry.SKETCH_QUERIES.values() if t}
    seq = [last.get(n, -1) for n in names if n not in twins]
    assert seq == sorted(seq), "queries() not ordered stalest-first"


def test_grading_order_breaks_never_graded_ties_by_declared_round():
    """Among never-graded queries, older declarations grade first —
    the r6 fix that finally let the r1 TPC-H block into the window."""
    import glob

    graded: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            for q, rec in json.load(fh).items():
                err = rec.get("err") if isinstance(rec, dict) else None
                if err in (None, "no_oracle"):
                    graded.add(q)
    with open(os.path.join(REPO, "QUERY_AGE.json")) as fh:
        ages = json.load(fh)
    twins = {t for t in entry.SKETCH_QUERIES.values() if t}
    never = [n for n in entry.queries() if n not in graded and n not in twins]
    seq = [ages.get(n, 10**6) for n in never]
    assert seq == sorted(seq), "never-graded tie-break not oldest-first"


def test_bench_and_tools_compile():
    """bench.py crashing means BENCH_r{N}.json records rc!=0 and the
    round loses its perf evidence (it happened twice: r6 line overflow,
    r7 import crash). Full-run coverage needs Spark; what CAN be locked
    in for free is that every driver-facing script byte-compiles and
    bench.py's main() guards exist."""
    import py_compile

    for rel in ("bench.py", "__spark_entry__.py", "tools/check_queries.py"):
        py_compile.compile(os.path.join(REPO, rel), doraise=True)
    src = open(os.path.join(REPO, "bench.py")).read()
    assert "BENCH_FULL.json" in src, "full per-query map sidecar missing"
    assert "json.dumps" in src


def test_no_duplicate_query_names_across_modules():
    """queries() and oracle_sql() merge module dicts with identical
    precedence; a name declared in TWO modules would let the grader
    hash-check one module's implementation against another's oracle.
    Guard: the merged size equals the sum of the parts."""
    from spark_ij_spark.operators import (
        clustering,
        dedup,
        entity,
        event_windows,
        image_queries,
        layout,
        multimodal,
        pipeline,
        profile,
        relational,
        similarity,
        text,
        timeseries,
    )
    from spark_ij_spark.streaming import documents as streaming_documents

    modules = [
        timeseries, pipeline, streaming_documents, clustering, entity,
        profile, layout, multimodal, event_windows, similarity, dedup,
        text, image_queries, relational,
    ]
    total = sum(len(m.QUERIES) for m in modules)
    merged: dict = {}
    for m in modules:
        merged.update(m.QUERIES)
    assert len(merged) == total, "duplicate query name across modules"
    ototal = sum(len(m.ORACLES) for m in modules)
    omerged: dict = {}
    for m in modules:
        omerged.update(m.ORACLES)
    assert len(omerged) == ototal, "duplicate oracle name across modules"


def test_null_semantics_rules_are_in_place():
    """The round-8 null-sweep rules are one-line-refactor fragile —
    each is a tiny coalesce/filter a cleanup could drop without any
    null-free test noticing (the driver testdata has ZERO nulls, so
    every one of these branches is dormant there; see SCALING.md
    "Null/empty-injection sweep"). Pin the canonical rule sites:

    - NULL text tokenizes as '' (single tokenizer boundary),
    - dsum/dsum_sql coalesce an all-NULL group to the 0.0 identity,
    - the embeddings scan integrity-filters null/wrong-dim vectors and
      its DuckDB mirror keeps the list_transform materialization
      barrier (DuckDB list_inner_product reads the raw child buffer of
      filtered dictionary vectors).
    """
    from spark_ij_spark.operators import dedup, relational, text, timeseries

    assert "coalesce(text, '')" in text.TOKENS_SPARK
    assert "coalesce(text, '')" in text.TOKENS_DUCK
    assert "COALESCE" in relational.dsum_sql("x")
    assert "embedding IS NOT NULL" in dedup.EMB_CLEAN_DUCK
    assert f"len(embedding) = {dedup.EMB_DIM}" in dedup.EMB_CLEAN_DUCK
    assert "list_transform(embedding, x -> x)" in dedup.EMB_CLEAN_DUCK
    # NaN ≡ missing at the measurement boundary: a plain decimal/BIGINT
    # cast of NaN crashes DuckDB (and ANSI Spark for BIGINT) while
    # Spark's decimal cast silently NULLs — TRY_CAST is the one form
    # with identical semantics on both engines.
    assert "TRY_CAST" in relational.dsum_sql("x")
    assert timeseries._VALUE_C.startswith("TRY_CAST")
    # partially-corrupt vectors (NULL/NaN/Inf ELEMENTS) must fail the
    # integrity scan too — they pass the length check but poison
    # quantization casts and cosine (and DuckDB's plain CAST errors
    # on Infinity where Spark's TRY_CAST silently NULLs — the
    # one-engine-crash class).
    assert "isnan(x)" in dedup.EMB_CLEAN_DUCK
    assert "Infinity" in dedup.EMB_CLEAN_DUCK
    # invalid readings (NULL/NaN/Inf) are filtered AT THE SCAN in the
    # TWA/EWMA/OHLC family — an all-invalid user/bucket must DROP, not
    # emit NULL sums that pandas renders NaN on one engine only.
    assert "isnan(value)" in timeseries._VALID_READING
    assert "Infinity" in timeseries._VALID_READING


def test_no_case_folding_in_graded_oracle_sql():
    """SQL lower()/upper() are banned in graded queries: the engines
    disagree on Unicode case folding (measured round 8: Spark lowers
    U+0130 'İ' to 'i'+combining-dot per Unicode, DuckDB to plain 'i'),
    so a case-folded column would hash-drift on real multilingual
    text. Allowed ONLY over provably-ASCII columns, where folding is
    engine-stable — growing the allowlist must be a deliberate act
    with that proof. Oracles mirror the Spark text, so enforcing here
    covers both sides."""
    import re

    import __spark_entry__ as m

    ascii_only = {
        # upper(p_name): TPC-H part names are ASCII by spec; the query
        # exists to exercise the scalar-function surface
        "q_scalar_funcs",
    }
    for name, sql in m.oracle_sql().items():
        if name in ascii_only:
            continue
        assert not re.search(r"\b(lower|upper)\s*\(", sql, re.I), (
            f"{name}: case folding in graded SQL over possibly-unicode text"
        )


def test_bench_two_tier_plan_order():
    """The headline tier (heaviest-by-prior-run) must run FIRST and be
    exactly HEADLINE_N known queries; never-benched queries precede the
    tail so new work always gets a warm timing (round-10 protocol —
    r9's flat protocol cold-degraded a nondeterministic subset and
    poisoned cross-round per-query comparison)."""
    import bench

    full = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
    prior, cold = full["queries"], set(full.get("degraded_names", []))
    names = list(prior) + ["zz_new_query"]
    order, head, warm_set = bench._plan_order(names, REPO)
    assert sorted(order) == sorted(names) and len(set(order)) == len(order)
    assert len(head) == bench.HEADLINE_N
    assert set(order[: bench.HEADLINE_N]) == head
    assert "zz_new_query" not in head
    # ranking ignores cold (degraded) prior timings — a cold-inflated
    # 5x number must not evict a genuinely heavy warm query (r10
    # review), and cold-timed queries re-enter as never-benched
    assert not (head & cold), "cold-timed queries leaked into headline"
    fresh_seg = order[bench.HEADLINE_N : bench.HEADLINE_N + 1 + len(cold)]
    assert "zz_new_query" in fresh_seg
    assert set(fresh_seg) <= cold | {"zz_new_query"}
    # headline = the N heaviest by the prior artifact's WARM timings
    warm = {n: t for n, t in prior.items() if n not in cold}
    heaviest = sorted(warm, key=lambda n: -warm[n])[: bench.HEADLINE_N]
    assert head == set(heaviest)
    # warm set = headline + never-benched + this round's cohort
    assert head <= warm_set and "zz_new_query" in warm_set
    assert cold <= warm_set, "cold-timed last round must re-enter warm"


def test_bench_cohort_cadence_is_deterministic():
    """Round-11 protocol: every tail query gets a warm timing every
    WARM_EVERY_K_ROUNDS rounds BY CONSTRUCTION (VERDICT r10 #3 — the
    rotation protocol left 109/174 cold in r10, so a tail regression
    could hide 4-5 rounds). The cohort slot is a stable hash of the
    NAME, so membership churn around a query never shifts its slot;
    over K consecutive round indices each tail query is warm exactly
    once. Simulated with a synthetic prior artifact in tmp."""
    import bench

    full = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
    names = list(full["queries"])
    k = bench.WARM_EVERY_K_ROUNDS
    slots = {n: bench._cohort_slot(n) for n in names}
    assert set(slots.values()) <= set(range(k))
    # slot depends only on the name — recomputing is identical
    assert slots == {n: bench._cohort_slot(n) for n in names}
    # cohorts partition the names: each name in exactly one slot, and
    # no slot is pathologically empty/overfull for the real query set
    sizes = [sum(1 for s in slots.values() if s == i) for i in range(k)]
    assert sum(sizes) == len(names)
    assert min(sizes) > 0
