"""Fuzzy (edit-distance) join via symmetric deletion neighborhoods —
exactness against brute-force levenshtein, neighborhood structure,
and the no-cartesian candidate plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from exosql_spark.operators.fuzzy import (
    deletion_neighborhood,
    fuzzy_join,
    fuzzy_self_pairs,
)


@pytest.fixture(scope="module")
def names(spark):
    rows = [
        (1, "martha"),
        (2, "marhta"),   # transposition = 2 substitutions away
        (3, "marta"),    # 1 deletion from martha
        (4, "martha"),   # exact duplicate
        (5, "bertha"),
        (6, "m"),
        (7, ""),
        (8, "martho"),   # 1 substitution
    ]
    return rows


def _spark_df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def _brute(rows, k):
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    return {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if lev(a, b) <= k
    }


class TestFuzzyJoin:
    @pytest.mark.parametrize("k", [0, 1, 2])
    def test_self_pairs_exact_vs_bruteforce(self, spark, names, k):
        df = _spark_df(spark, names)
        got = {
            (r.id_a, r.id_b)
            for r in fuzzy_self_pairs(df, "name", "id", max_dist=k).collect()
        }
        assert got == _brute(names, k), f"k={k}"

    def test_neighborhood_contains_self_and_handles_empty(self, spark):
        df = spark.createDataFrame([("ab",), ("",)], "s string")
        rows = df.select(
            deletion_neighborhood(F.col("s"), 1).alias("n")
        ).collect()
        assert sorted(rows[0].n) == ["a", "ab", "b"]
        assert rows[1].n == [""]

    def test_two_table_join_and_distances(self, spark):
        left = spark.createDataFrame([(1, "color")], "l_id long, a string")
        right = spark.createDataFrame(
            [(10, "colour"), (11, "colors"), (12, "colr"), (13, "dolor")],
            "r_id long, b string",
        )
        got = {
            (r.l_id, r.r_id): r.edit_dist
            for r in fuzzy_join(
                left, right, "a", "b", max_dist=1, left_id="l_id", right_id="r_id"
            ).collect()
        }
        assert got == {(1, 10): 1, (1, 11): 1, (1, 12): 1, (1, 13): 1}

    def test_no_cartesian_in_plan(self, spark, names):
        df = _spark_df(spark, names)
        plan = (
            fuzzy_self_pairs(df, "name", "id", max_dist=1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_max_dist_bounds(self, spark, names):
        df = _spark_df(spark, names)
        with pytest.raises(ValueError, match="max_dist"):
            fuzzy_self_pairs(df, "name", "id", max_dist=3).collect()

    def test_colliding_column_names_get_suffixes(self, spark):
        # Both sides joined on 'name' with id column 'id': without
        # disambiguation the output would carry duplicate column names
        # and break select-by-name downstream (round-7 ADVICE).
        left = spark.createDataFrame([(1, "color")], "id long, name string")
        right = spark.createDataFrame([(10, "colour")], "id long, name string")
        out = fuzzy_join(
            left, right, "name", "name", max_dist=1, left_id="id", right_id="id"
        )
        assert out.columns == ["id_l", "id_r", "name_l", "name_r", "edit_dist"]
        row = out.collect()[0]
        assert (row.id_l, row.id_r, row.name_l, row.name_r, row.edit_dist) == (
            1, 10, "color", "colour", 1,
        )

    def test_cross_collision_and_unresolvable_collision(self, spark):
        # cross collision: left_id shares its name with right_on
        left = spark.createDataFrame([(1, "color")], "alias long, name string")
        right = spark.createDataFrame([(10, "colour")], "nick long, alias string")
        out = fuzzy_join(
            left, right, "name", "alias", max_dist=1,
            left_id="alias", right_id="nick",
        )
        assert out.columns == ["alias_l", "nick", "name", "alias_r", "edit_dist"]
        # same-side collision can't be fixed by suffixing: must raise
        import pytest

        with pytest.raises(ValueError, match="collide"):
            fuzzy_join(
                left, left, "name", "name", max_dist=1,
                left_id="name", right_id="alias",
            )


class TestQgramFuzzyJoin:
    """Q-gram count-filter path (k ≥ 3 — beyond the deletion
    neighborhood's O(|s|^k) reach): exact vs brute force, including
    the short-string residue the bound cannot filter."""

    @pytest.mark.parametrize("k", [1, 2, 3, 4])
    def test_exact_vs_bruteforce(self, spark, k):
        from exosql_spark.operators.fuzzy import fuzzy_self_pairs_qgram

        rows = [
            (1, "small copper ring"),
            (2, "small copper wing"),    # 1 sub
            (3, "smal copper rings"),    # del + ins
            (4, "large copper ring"),    # 3 subs
            (5, "small copper ring"),    # exact dup
            (6, "ab"),                   # short residue (len ≤ kq+q-1)
            (7, "abc"),                  # short, ed(6,7)=1
            (8, "xx"),                   # short, far from all
            (9, "small kopper rink"),    # 2 subs from 1
        ]
        df = spark.createDataFrame(rows, "id long, name string")
        got = {
            (r.id_a, r.id_b, r.edit_dist)
            for r in fuzzy_self_pairs_qgram(df, "name", "id", max_dist=k).collect()
        }
        want = {
            (i, j, _lev(a, b))
            for (i, a), (j, b) in __import__("itertools").combinations(rows, 2)
            if _lev(a, b) <= k
        }
        assert got == want, f"k={k}: extra={got-want} missing={want-got}"

    def test_composition_runs_exactly_one_job(self, spark):
        """The docstring's execution contract, pinned: COMPOSING the
        operator (no action on the result) runs exactly one Spark job
        — the short-side ``limit(1).count()`` gate — and nothing else.
        A regression that adds eager work (or silently drops the gate
        without restructuring the plan) moves this number."""
        from exosql_spark.operators.fuzzy import fuzzy_self_pairs_qgram

        df = spark.createDataFrame(
            [(1, "small copper ring"), (2, "small copper wing"), (3, "ab")],
            "id long, name string",
        )
        sc = spark.sparkContext
        F_ = __import__("pyspark.sql.functions", fromlist=["F"])

        def jobs_in(group, fn):
            sc.setJobGroup(group, group)
            try:
                fn()
            finally:
                sc.setLocalProperty("spark.jobGroup.id", None)
            return len(sc.statusTracker().getJobIdsForGroup(group))

        # the gate alone: limit(1).count() on the length filter (Spark
        # may map one count() action to >1 job — CollectLimit's
        # incremental partition scans — so measure, don't hardcode)
        gate = jobs_in(
            "qgram-gate-alone",
            lambda: df.filter(F_.length("name") <= 7).limit(1).count(),
        )
        composed = jobs_in(
            "qgram-compose-pin",
            lambda: fuzzy_self_pairs_qgram(df, "name", "id", max_dist=3),
        )
        assert gate >= 1
        assert composed == gate, (composed, gate)

    def test_no_short_strings_skips_nested_loop(self, spark):
        from exosql_spark.operators.fuzzy import fuzzy_self_pairs_qgram

        df = spark.createDataFrame(
            [(1, "small copper ring"), (2, "small copper wing")],
            "id long, name string",
        )
        out = fuzzy_self_pairs_qgram(df, "name", "id", max_dist=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2)}
