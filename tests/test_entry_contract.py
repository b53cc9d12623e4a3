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
        si, ti = names.index(sketch), names.index(twin)
        assert ti == si + 1, (
            f"{sketch}: twin {twin} not adjacent in queries() order"
        )
        # window-safety on the ACTUAL ordering (second r11 review: the
        # synthetic tests alone let a multi-pair interaction straddle
        # the real order silently): the pair is fully inside or fully
        # outside the driver's graded window, never split by it
        w = entry.GRADED_WINDOW
        assert ti < w or si >= w, (
            f"{sketch}/{twin} straddle the {w}-entry graded window "
            f"at ({si}, {ti})"
        )


def test_sketch_pair_never_straddles_graded_window():
    """The pair placement is window-safe (r11 review): a sketch whose
    staleness lands it at exactly index GRADED_WINDOW-1 would put its
    twin at GRADED_WINDOW — graded no_oracle row, ungraded twin, the
    exact artifact shape the adjacency exists to prevent. The pure
    placement function must nudge the pair fully inside; a voided twin
    at the FRONT must pull its sketch forward, not be dragged back."""
    w = entry.GRADED_WINDOW
    sketch, twin = "events_hll_rollup", "events_hll_exact"
    # sketch sorted at the window's last slot, twin far behind
    ordered = [f"q{i:03d}" for i in range(200)]
    ordered[w - 1] = sketch
    ordered[150] = twin
    placed = entry._place_sketch_pairs(ordered)
    si, ti = placed.index(sketch), placed.index(twin)
    assert ti == si + 1
    assert ti < w or si >= w, "pair straddles the graded window"
    # voided twin at the very front: sketch must come TO it
    ordered2 = [f"q{i:03d}" for i in range(200)]
    ordered2[0] = twin
    ordered2[150] = sketch
    placed2 = entry._place_sketch_pairs(ordered2)
    assert placed2.index(sketch) == 0 and placed2.index(twin) == 1
    # permutation preserved in both scenarios
    assert sorted(placed) == sorted(ordered)
    assert sorted(placed2) == sorted(ordered2)


def test_sketch_pair_placement_multi_pair_interference():
    """Second r11 review (confirmed by execution on the old
    implementation): placing pair B could shift already-placed pair A
    across the window edge, or split its adjacency. With pairs seeded
    so A sits right at the edge and B's placement perturbs indices
    around it, EVERY pair must still end adjacent and window-safe."""
    w = entry.GRADED_WINDOW
    pairs = [(s, t) for s, t in entry.SKETCH_QUERIES.items() if t]
    assert len(pairs) >= 2
    (s_a, t_a), (s_b, t_b) = pairs[0], pairs[1]
    ordered = [f"q{i:03d}" for i in range(200)]
    # A adjacent right before the edge; B's members bracket it so B's
    # placement (at index 20) shifts everything after by +1
    ordered[w - 2], ordered[w - 1] = s_a, t_a
    ordered[20], ordered[60] = t_b, s_b
    placed = entry._place_sketch_pairs(ordered)
    assert sorted(placed) == sorted(ordered)
    for s, t in ((s_a, t_a), (s_b, t_b)):
        si, ti = placed.index(s), placed.index(t)
        assert ti == si + 1, f"{s}/{t} adjacency broken"
        assert ti < w or si >= w, f"{s}/{t} straddle at ({si}, {ti})"
    # stacked pairs at the edge: both must resolve inside
    ordered2 = [f"q{i:03d}" for i in range(200)]
    ordered2[w - 3], ordered2[w - 2] = s_b, t_b
    ordered2[w - 1], ordered2[150] = s_a, t_a
    placed2 = entry._place_sketch_pairs(ordered2)
    for s, t in ((s_a, t_a), (s_b, t_b)):
        si, ti = placed2.index(s), placed2.index(t)
        assert ti == si + 1 and (ti < w or si >= w), (s, t, si, ti)


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
    # sketch/twin pairs are deliberately co-located at the stalest of
    # their two positions (either member may move) — exempt both from
    # the monotonic check
    pairs = set(entry.SKETCH_QUERIES) | {
        t for t in entry.SKETCH_QUERIES.values() if t
    }
    seq = [last.get(n, -1) for n in names if n not in pairs]
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
    pairs = set(entry.SKETCH_QUERIES) | {
        t for t in entry.SKETCH_QUERIES.values() if t
    }
    never = [n for n in entry.queries() if n not in graded and n not in pairs]
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
    """The headline tier (heaviest-by-carried-warm-timing) must run
    FIRST and be exactly HEADLINE_N known queries; never-warm-benched
    queries follow immediately so new work always gets a warm timing.
    Ranking uses the warm_queries carry-forward map — this-run COLD
    timings never rank (r10 review: a cold-inflated 5x number must not
    evict a genuine heavy query), and scheduled colds do NOT re-enter
    the fresh tier (r11 review: without the carry-forward, tier sizes
    oscillated and the cohort cadence was moot)."""
    import bench

    full = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
    prior = bench._prior_warm(REPO)
    names = list(full["queries"]) + ["zz_new_query"]
    order, head, warm_set, sent = bench._plan_order(names, REPO)
    assert sorted(order) == sorted(names) and len(set(order)) == len(order)
    # sentinels present in the query set run FIRST and are always warm
    assert sent == set(bench.SENTINELS) & set(names)
    n_sent = len(sent)
    assert order[:n_sent] == [n for n in bench.SENTINELS if n in names]
    assert sent <= warm_set
    assert len(head) == bench.HEADLINE_N
    assert set(order[n_sent : n_sent + bench.HEADLINE_N]) == head
    assert "zz_new_query" not in head
    # headline = the N heaviest by carried WARM timings (sentinels
    # excluded — they already run warm unconditionally)
    known = [n for n in names if n in prior and n not in sent]
    heaviest = sorted(known, key=lambda n: -prior[n])[: bench.HEADLINE_N]
    assert head == set(heaviest)
    # fresh tier (no warm carry) comes right after headline, is warm,
    # and contains ONLY genuinely never-warm-benched names
    fresh = [n for n in names if n not in prior and n not in sent]
    assert "zz_new_query" in fresh
    base = n_sent + bench.HEADLINE_N
    assert set(order[base : base + len(fresh)]) == set(fresh)
    assert set(fresh) <= warm_set
    # a scheduled cold from last run stays ranked (not fresh) as long
    # as it has a carried warm timing
    carried_colds = [n for n in full.get("degraded_names", []) if n in prior]
    assert not (set(carried_colds) & set(fresh))


def test_bench_sentinels_are_declared_queries():
    """Every pinned sentinel must be a real declared query — a renamed
    or dropped sentinel would silently shrink the cross-round warm
    comparison surface the set exists to guarantee."""
    import bench

    qs = entry.queries()
    missing = [n for n in bench.SENTINELS if n not in qs]
    assert not missing, f"sentinels not in queries(): {missing}"
    assert len(set(bench.SENTINELS)) == len(bench.SENTINELS) >= 10


def test_bench_warm_carry_forward(tmp_path):
    """Scheduled colds keep their last WARM timing via the artifact's
    "warm_queries" map (r11 review): without the carry-forward, every
    cold-by-design tail query re-entered the FRESH warm tier the next
    round, tier sizes oscillated, and the K-round cohort cadence was
    moot. A query missing from warm_queries (genuinely new) is the
    only thing that should land in the fresh tier."""
    import bench

    art = {
        "queries": {"a": 5.0, "b": 1.0, "c": 0.5},  # c cold this run
        "degraded_names": ["c"],
        "warm_queries": {"a": 5.0, "b": 1.0, "c": 2.0},  # c's last warm
    }
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps(art))
    prior = bench._prior_warm(str(tmp_path))
    assert prior == {"a": 5.0, "b": 1.0, "c": 2.0}
    order, head, warm, sent = bench._plan_order(
        ["a", "b", "c", "new"], str(tmp_path)
    )
    # c ranks by its carried-forward warm timing, NOT as never-benched;
    # only the genuinely new query is fresh (warm regardless of cohort)
    assert "new" in warm
    assert not sent  # synthetic names: no sentinels present
    assert order[: len(prior)] == ["a", "c", "b"]  # headline by warm rank
    # legacy artifact (no warm_queries): cold names re-enter as fresh
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"queries": art["queries"], "degraded_names": ["c"]})
    )
    assert bench._prior_warm(str(tmp_path)) == {"a": 5.0, "b": 1.0}


def test_bench_stale_carry_dropped():
    """A carried warm timing contradicted by a >= STALE_CARRY_K x
    slower cold run this round is dropped (VERDICT r11 #4:
    bucketed_join_revenue carried 0.17 s against a 4.4 s cold reality
    and could never re-earn a warm slot); a cold run inside the band
    keeps the carry, and warm-timed queries always record this run."""
    import bench

    order = ["stale", "fine", "warm", "new_warm"]
    timings = {"stale": 4.4, "fine": 2.0, "warm": 1.5, "new_warm": 0.7}
    prior = {"stale": 0.17, "fine": 1.0, "warm": 9.9}
    out = bench._carry_warm(order, timings, {"warm", "new_warm"}, prior)
    assert "stale" not in out  # 4.4 > 3 * 0.17: carry dropped
    assert out["fine"] == 1.0  # 2.0 <= 3 * 1.0: carry kept
    assert out["warm"] == 1.5  # warm this run: always recorded
    assert out["new_warm"] == 0.7


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


def test_quadratic_baselines_are_real_hash_graded_queries():
    """__spark_entry__.QUADRATIC_BASELINES is the single source for
    the at-volume sweep exclusion (`oracle_sim --skip-quadratic`): a
    name that drifts out of queries() would silently shrink the
    exclusion set and re-stall the sweep on an all-pairs oracle (the
    first r11 at-volume attempt stalled 25+ min exactly this way, on
    a hand-typed list). Each baseline must exist, carry a DuckDB
    oracle (they are the exactness twins the approximate family is
    audited against), and not be a sketch query."""
    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    for name in m.QUADRATIC_BASELINES:
        assert name in qs, f"{name} not in queries()"
        assert name in osql, f"{name} has no oracle (not an exactness twin?)"
        assert name not in m.SKETCH_QUERIES
