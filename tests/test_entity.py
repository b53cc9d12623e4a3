"""Fuzzy entity-resolution links against the DuckDB oracle."""

from __future__ import annotations

from spark_ij_spark.operators import entity

from .conftest import SF_DIR, assert_oracle_match


def test_er_fuzzy_parts_matches_oracle(spark, duck):
    assert_oracle_match(
        spark,
        duck,
        entity.QUERIES["er_fuzzy_parts"],
        entity.ORACLES["er_fuzzy_parts"],
    )


def test_er_blocking_has_full_recall_here(spark, duck):
    """The noun block must lose NO links at test SF: the blocked link
    set equals the unblocked (all-pairs) link set computed in DuckDB.
    If the generator's name vocabulary ever changes so that a
    levenshtein<=2 pair straddles nouns, this trips and the blocking
    key needs a second pass."""
    blocked = {
        (r.name_a, r.name_b)
        for r in entity.q_er_fuzzy_parts(spark, SF_DIR).collect()
    }
    unblocked = set(
        duck.execute(
            f"""
            WITH d AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name, b.p_name FROM d a JOIN d b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= {entity.ER_MAX_DIST}
            """
        ).fetchall()
    )
    assert blocked == unblocked and blocked


def test_er_links_are_sound(spark, duck):
    """Every link: distinct names, dist in [1, ER_MAX_DIST], canonical
    keys are real min-partkeys, record counts sum to the table size
    when grouped by name."""
    rows = entity.q_er_fuzzy_parts(spark, SF_DIR).collect()
    assert rows
    canon = dict(
        duck.execute(
            "SELECT p_name, MIN(p_partkey) FROM part GROUP BY p_name"
        ).fetchall()
    )
    counts = dict(
        duck.execute(
            "SELECT p_name, COUNT(*) FROM part GROUP BY p_name"
        ).fetchall()
    )
    for r in rows:
        assert r.name_a != r.name_b
        assert 1 <= r.dist <= entity.ER_MAX_DIST
        assert r.key_a == canon[r.name_a] and r.key_b == canon[r.name_b]
        assert r.records_a == counts[r.name_a]
        assert r.records_b == counts[r.name_b]
