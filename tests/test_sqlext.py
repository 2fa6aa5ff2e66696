"""ASOF JOIN SQL-syntax adapter (streamz_postgres_spark.sqlext):
grammar acceptance, lowering equivalence with the library asof_join,
inner-vs-left semantics, key-rename alignment, and loud refusal of
everything outside the bounded grammar."""

from __future__ import annotations

import datetime as dt

import pytest

from streamz_postgres_spark import sqlext
from streamz_postgres_spark.operators.joins import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def views(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00"), "a"),
            (1, _ts("2024-01-01T12:00"), "b"),
            (2, _ts("2024-01-01T08:00"), "early"),
        ],
        "k int, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00"), 10.0),
            (1, _ts("2024-01-01T11:00"), 20.0),
            (2, _ts("2024-01-01T11:00"), 30.0),
        ],
        "rk int, rts timestamp_ntz, v double",
    )
    left.createOrReplaceTempView("sqlext_left")
    right.createOrReplaceTempView("sqlext_right")
    return left, right


def test_asof_left_join_matches_library(spark, views):
    left, right = views
    got = sqlext.sql(
        spark,
        """SELECT l.k, l.tag, r.rts AS asof_ts, r.v
           FROM sqlext_left l ASOF LEFT JOIN sqlext_right r
             ON l.k = r.rk AND l.ts >= r.rts""",
    )
    want = asof_join(
        left,
        right.withColumnRenamed("rk", "k"),
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_values=["v"],
        how="left",
    ).select("k", "tag", "asof_ts", "v")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # left semantics: the unmatched row (k=2, ts before any right row)
    # survives with nulls
    rows = {r.tag: r.v for r in got.collect()}
    assert rows["early"] is None and rows["a"] == 10.0 and rows["b"] == 20.0


def test_asof_forward_join_matches_library(spark, views):
    # the inequality's direction IS the as-of direction (DuckDB
    # convention, r10): l.ts <= r.rts attaches the NEXT right row
    left, right = views
    got = sqlext.sql(
        spark,
        """SELECT l.k, l.tag, r.rts AS asof_ts, r.v
           FROM sqlext_left l ASOF LEFT JOIN sqlext_right r
             ON l.k = r.rk AND l.ts <= r.rts""",
    )
    want = asof_join(
        left,
        right.withColumnRenamed("rk", "k"),
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_values=["v"],
        how="left",
        direction="forward",
    ).select("k", "tag", "asof_ts", "v")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    rows = {r.tag: r.v for r in got.collect()}
    # a@10:00 -> next right 11:00 (20.0); b@12:00 -> none;
    # early@08:00 -> 11:00 (30.0)
    assert rows["a"] == 20.0 and rows["b"] is None and rows["early"] == 30.0


def test_asof_inner_join_drops_unmatched(spark, views):
    got = sqlext.sql(
        spark,
        """SELECT l.tag, r.v
           FROM sqlext_left l ASOF JOIN sqlext_right r
             ON l.k = r.rk AND l.ts >= r.rts""",
    )
    assert {r.tag for r in got.collect()} == {"a", "b"}


def test_plain_sql_passes_through(spark, views):
    got = sqlext.sql(spark, "SELECT COUNT(*) AS n FROM sqlext_left")
    assert got.collect()[0].n == 3


def test_rejects_outside_grammar(spark, views):
    with pytest.raises(ValueError, match="grammar"):
        # missing alias on the right side
        sqlext.sql(
            spark,
            "SELECT 1 FROM sqlext_left l ASOF JOIN sqlext_right "
            "ON l.k = r.rk AND l.ts >= r.rts",
        )
    with pytest.raises(ValueError, match="backward"):
        # the bound must LEAD with the left alias; write
        # l.ts <= r.rts for the forward direction (r10 grammar)
        sqlext.sql(
            spark,
            """SELECT l.tag FROM sqlext_left l ASOF JOIN sqlext_right r
               ON l.k = r.rk AND r.rts >= l.ts""",
        )
    with pytest.raises(ValueError, match="one ASOF"):
        sqlext.sql(
            spark,
            """SELECT 1 FROM a x ASOF JOIN b y ON x.k = y.k AND x.t >= y.t
               JOIN (SELECT 1) z
               WHERE EXISTS (SELECT 1 FROM c u ASOF JOIN d w
                             ON u.k = w.k AND u.t >= w.t)""",
        )
    with pytest.raises(ValueError, match="resolvable"):
        sqlext.sql(
            spark,
            """SELECT l.tag FROM no_such_view l ASOF JOIN sqlext_right r
               ON l.k = r.rk AND l.ts >= r.rts""",
        )


class TestSampleBy:
    def test_lowering_matches_native_group_by(self, spark):
        from streamz_postgres_spark import sqlext
        from streamz_postgres_spark.catalog import load_table
        from tests.conftest import SF_DIR

        load_table(spark, SF_DIR, "events").createOrReplaceTempView(
            "ev_sample"
        )
        got = sqlext.sql(
            spark,
            "SELECT event_type, count(*) AS n FROM ev_sample "
            "WHERE value >= 0 SAMPLE BY 2h",
        )
        assert got.columns == ["sample_ts", "event_type", "n"]
        want = spark.sql(
            """SELECT timestampadd(SECOND,
                 CAST(timestampdiff(SECOND,
                   TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) DIV 7200
                 AS BIGINT) * 7200,
                 TIMESTAMP_NTZ '1970-01-01 00:00:00') AS sample_ts,
               event_type, count(*) AS n
               FROM ev_sample WHERE value >= 0 GROUP BY 1, 2"""
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        spark.catalog.dropTempView("ev_sample")

    def test_custom_ts_column_and_units(self, spark):
        from streamz_postgres_spark import sqlext

        spark.sql(
            "SELECT TIMESTAMP_NTZ '2024-01-01 00:02:30' AS t, 1 AS v "
            "UNION ALL SELECT TIMESTAMP_NTZ '2024-01-01 00:03:10', 2"
        ).createOrReplaceTempView("tiny_sample")
        got = sqlext.sql(
            spark, "SELECT count(*) AS n FROM tiny_sample SAMPLE BY 60s ON t"
        )
        rows = {str(r.sample_ts): r.n for r in got.collect()}
        assert rows == {
            "2024-01-01 00:02:00": 1,
            "2024-01-01 00:03:00": 1,
        }
        spark.catalog.dropTempView("tiny_sample")

    def test_refuses_out_of_grammar(self, spark):
        import pytest as _pytest

        from streamz_postgres_spark import sqlext

        with _pytest.raises(ValueError, match="SAMPLE BY"):
            sqlext.sql(
                spark,
                "SELECT * FROM a JOIN b ON a.x = b.x SAMPLE BY 1h",
            )


class TestDistinctOn:
    def test_matches_window_form(self, spark):
        from streamz_postgres_spark import sqlext
        from streamz_postgres_spark.catalog import load_table
        from tests.conftest import SF_DIR

        load_table(spark, SF_DIR, "events").createOrReplaceTempView("ev_don")
        got = sqlext.sql(
            spark,
            "SELECT DISTINCT ON (user_id) user_id, event_id, value "
            "FROM ev_don ORDER BY user_id, event_id DESC",
        )
        want = spark.sql(
            """SELECT user_id, event_id, value FROM (
                 SELECT user_id, event_id, value,
                        row_number() OVER (PARTITION BY user_id
                                           ORDER BY event_id DESC) rn
                 FROM ev_don) WHERE rn = 1"""
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        spark.catalog.dropTempView("ev_don")

    def test_multi_key_and_where(self, spark):
        from streamz_postgres_spark import sqlext

        spark.sql(
            "SELECT * FROM VALUES (1, 'a', 10, 5.0), (1, 'a', 20, 6.0), "
            "(1, 'b', 5, 7.0), (2, 'a', 1, 8.0) AS t(k1, k2, ord, v)"
        ).createOrReplaceTempView("don_multi")
        got = sqlext.sql(
            spark,
            "SELECT DISTINCT ON (k1, k2) k1, k2, ord, v FROM don_multi "
            "WHERE v > 4.0 ORDER BY k1, k2, ord DESC",
        )
        assert sorted(map(tuple, got.collect())) == [
            (1, "a", 20, 6.0),
            (1, "b", 5, 7.0),
            (2, "a", 1, 8.0),
        ]
        spark.catalog.dropTempView("don_multi")

    def test_refuses_order_by_not_leading_with_keys(self, spark):
        import pytest as _pytest

        from streamz_postgres_spark import sqlext

        with _pytest.raises(ValueError, match="lead with the DISTINCT ON"):
            sqlext.sql(
                spark,
                "SELECT DISTINCT ON (a) a, b FROM t ORDER BY b",
            )


def test_sample_by_multiarg_functions_do_not_leak_into_group_by(spark):
    """Round-7 review find: a naive comma split leaked multi-arg
    function ARGUMENTS into GROUP BY (changing the grain, or blowing
    up on numeric ordinals). Only top-level bare columns may join
    the grouping key."""
    from streamz_postgres_spark import sqlext

    spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:10:00' AS ts, 'a' AS k, "
        "CAST(NULL AS STRING) AS alt, 1 AS v "
        "UNION ALL SELECT TIMESTAMP_NTZ '2024-01-01 00:20:00', 'a', 'b', 2"
    ).createOrReplaceTempView("sb_args")
    got = sqlext.sql(
        spark,
        "SELECT k, count(*) AS n, any_value(coalesce(k, alt, 'z')) AS kk, "
        "any_value(conv('10', 16, 10)) AS c FROM sb_args SAMPLE BY 1h",
    )
    rows = sorted(map(tuple, got.collect()))
    # one bucket, one group keyed by the bare column k alone: the
    # inner args (alt, 16, 10) must NOT have become grouping keys
    # (numeric ordinals would error or change the grain)
    assert len(rows) == 1 and rows[0][1:] == ("a", 2, "a", "16")
    spark.catalog.dropTempView("sb_args")


class TestQualify:
    def test_matches_subquery_rewrite(self, spark):
        from streamz_postgres_spark import sqlext

        spark.sql(
            "SELECT * FROM VALUES ('a', 1, 5.0), ('a', 2, 9.0), "
            "('a', 3, 7.0), ('b', 4, 1.0), ('b', 5, 2.0) "
            "AS t(grp, id, v)"
        ).createOrReplaceTempView("q_ev")
        got = sqlext.sql(
            spark,
            "SELECT grp, id, v FROM q_ev QUALIFY row_number() OVER "
            "(PARTITION BY grp ORDER BY v DESC, id) <= 2",
        )
        assert sorted(map(tuple, got.collect())) == [
            ("a", 2, 9.0),
            ("a", 3, 7.0),
            ("b", 4, 1.0),
            ("b", 5, 2.0),
        ]
        spark.catalog.dropTempView("q_ev")

    def test_star_projection_hides_rank_column(self, spark):
        from streamz_postgres_spark import sqlext

        spark.sql(
            "SELECT * FROM VALUES ('a', 1), ('a', 2) AS t(grp, id)"
        ).createOrReplaceTempView("q_star")
        got = sqlext.sql(
            spark,
            "SELECT * FROM q_star QUALIFY row_number() OVER "
            "(PARTITION BY grp ORDER BY id) = 1",
        )
        assert got.columns == ["grp", "id"]
        assert got.collect() == [("a", 1)]
        spark.catalog.dropTempView("q_star")

    def test_rank_and_where_compose(self, spark):
        from streamz_postgres_spark import sqlext

        spark.sql(
            "SELECT * FROM VALUES ('a', 1, 5.0), ('a', 2, 5.0), "
            "('a', 3, 1.0), ('b', 4, 0.5) AS t(grp, id, v)"
        ).createOrReplaceTempView("q_rank")
        got = sqlext.sql(
            spark,
            "SELECT grp, id FROM q_rank WHERE v >= 1.0 "
            "QUALIFY rank() OVER (PARTITION BY grp ORDER BY v DESC) = 1",
        )
        # rank keeps BOTH tied rows; the WHERE filtered grp b out
        assert sorted(map(tuple, got.collect())) == [("a", 1), ("a", 2)]
        spark.catalog.dropTempView("q_rank")

    def test_refuses_out_of_grammar(self, spark):
        import pytest as _pytest

        from streamz_postgres_spark import sqlext

        # window aggregate (sum) is outside the rank-family grammar
        with _pytest.raises(ValueError, match="QUALIFY present"):
            sqlext.sql(
                spark,
                "SELECT a FROM t QUALIFY sum(v) OVER "
                "(PARTITION BY a ORDER BY b) <= 3",
            )
        # no PARTITION BY
        with _pytest.raises(ValueError, match="QUALIFY present"):
            sqlext.sql(
                spark,
                "SELECT a FROM t QUALIFY row_number() OVER "
                "(ORDER BY b) <= 3",
            )
        # join on the left side is outside the one-table grammar
        with _pytest.raises(ValueError, match="QUALIFY present"):
            sqlext.sql(
                spark,
                "SELECT a FROM t JOIN u ON t.k = u.k QUALIFY "
                "row_number() OVER (PARTITION BY a ORDER BY b) <= 3",
            )


def test_qualify_source_with_reserved_looking_column(spark):
    """Review find: a fixed '__q' plumbing alias broke in-grammar
    queries over tables that already have that column; the alias is
    now collision-proof per call."""
    from streamz_postgres_spark import sqlext

    spark.sql(
        "SELECT * FROM VALUES ('a', 1, 9), ('a', 2, 8) AS t(grp, id, __q)"
    ).createOrReplaceTempView("q_coll")
    got = sqlext.sql(
        spark,
        "SELECT grp, id, __q FROM q_coll QUALIFY row_number() OVER "
        "(PARTITION BY grp ORDER BY id) = 1",
    )
    assert got.collect() == [("a", 1, 9)]
    spark.catalog.dropTempView("q_coll")


class TestColumns:
    def test_expands_matching_columns_in_table_order(self, spark):
        spark.sql(
            "SELECT * FROM VALUES (1, 2.0, 'x', 3) "
            "AS t(f_a, f_b, label, f_c)"
        ).createOrReplaceTempView("c_wide")
        got = sqlext.sql(spark, "SELECT COLUMNS('^f_') FROM c_wide")
        assert got.columns == ["f_a", "f_b", "f_c"]
        assert got.collect() == [(1, 2.0, 3)]
        spark.catalog.dropTempView("c_wide")

    def test_partial_match_mirrors_duckdb(self, spark):
        # DuckDB COLUMNS('l_') also matches xl_tax (partial match);
        # the adapter must not silently anchor
        spark.sql(
            "SELECT * FROM VALUES (1, 2, 3) AS t(l_qty, xl_tax, okey)"
        ).createOrReplaceTempView("c_part")
        got = sqlext.sql(spark, "SELECT COLUMNS('l_') FROM c_part")
        assert got.columns == ["l_qty", "xl_tax"]
        spark.catalog.dropTempView("c_part")

    def test_composes_with_where_and_order(self, spark):
        spark.sql(
            "SELECT * FROM VALUES (1, 10), (2, 20), (3, 30) AS t(a_id, a_v)"
        ).createOrReplaceTempView("c_pred")
        got = sqlext.sql(
            spark,
            "SELECT COLUMNS('^a_') FROM c_pred "
            "WHERE a_v > 10 ORDER BY a_id DESC",
        )
        assert [tuple(r) for r in got.collect()] == [(3, 30), (2, 20)]
        spark.catalog.dropTempView("c_pred")

    def test_refuses_out_of_grammar(self, spark):
        spark.sql("SELECT 1 AS x").createOrReplaceTempView("c_one")
        # zero matches is an error, as in DuckDB
        with pytest.raises(ValueError, match="matched no column"):
            sqlext.sql(spark, "SELECT COLUMNS('^zz') FROM c_one")
        # two COLUMNS items
        with pytest.raises(ValueError, match="exactly one COLUMNS"):
            sqlext.sql(
                spark,
                "SELECT COLUMNS('a'), COLUMNS('b') FROM c_one",
            )
        # joins are out of grammar
        with pytest.raises(ValueError, match="no JOIN"):
            sqlext.sql(
                spark,
                "SELECT COLUMNS('x') FROM c_one JOIN c_one ON 1=1",
            )
        # unresolvable source
        with pytest.raises(ValueError, match="resolvable"):
            sqlext.sql(spark, "SELECT COLUMNS('x') FROM no_such_view_42")
        # bad regex
        with pytest.raises(ValueError, match="does not compile"):
            sqlext.sql(spark, "SELECT COLUMNS('[') FROM c_one")
        spark.catalog.dropTempView("c_one")


class TestExclude:
    def test_drops_listed_columns_keeps_order(self, spark):
        spark.sql(
            "SELECT * FROM VALUES (1, 'blob', 2.0, 'x') "
            "AS t(id, payload, score, tag)"
        ).createOrReplaceTempView("e_wide")
        got = sqlext.sql(spark, "SELECT * EXCLUDE (payload) FROM e_wide")
        assert got.columns == ["id", "score", "tag"]
        assert got.collect() == [(1, 2.0, "x")]
        spark.catalog.dropTempView("e_wide")

    def test_multi_column_and_where(self, spark):
        spark.sql(
            "SELECT * FROM VALUES (1, 'a', 10), (2, 'b', 20) "
            "AS t(id, blob, v)"
        ).createOrReplaceTempView("e_two")
        got = sqlext.sql(
            spark,
            "SELECT * EXCLUDE (blob, v) FROM e_two WHERE v > 10",
        )
        assert got.columns == ["id"]
        assert got.collect() == [(2,)]
        spark.catalog.dropTempView("e_two")

    def test_refuses_out_of_grammar(self, spark):
        spark.sql(
            "SELECT * FROM VALUES (1, 2) AS t(a, b)"
        ).createOrReplaceTempView("e_ref")
        # unknown column must error (a typo'd name silently keeping
        # the payload column in the scan is the failure mode)
        with pytest.raises(ValueError, match="not a column"):
            sqlext.sql(spark, "SELECT * EXCLUDE (zz) FROM e_ref")
        # duplicate entry, as in DuckDB
        with pytest.raises(ValueError, match="duplicate column"):
            sqlext.sql(spark, "SELECT * EXCLUDE (a, a) FROM e_ref")
        # excluding every column leaves an empty projection
        with pytest.raises(ValueError, match="every column"):
            sqlext.sql(spark, "SELECT * EXCLUDE (a, b) FROM e_ref")
        # joins are out of grammar
        with pytest.raises(ValueError, match="no JOIN"):
            sqlext.sql(
                spark, "SELECT * EXCLUDE (a) FROM e_ref JOIN e_ref ON 1=1"
            )
        # unresolvable source
        with pytest.raises(ValueError, match="resolvable"):
            sqlext.sql(spark, "SELECT * EXCLUDE (a) FROM no_such_view_99")
        # empty list
        with pytest.raises(ValueError, match="does not match the supported"):
            sqlext.sql(spark, "SELECT * EXCLUDE () FROM e_ref")
        spark.catalog.dropTempView("e_ref")

    def test_readschema_drops_excluded_payload(self, spark, tmp_path):
        # the point of the grammar: the excluded payload column must
        # not appear in the parquet ReadSchema
        p = str(tmp_path / "wide.parquet")
        spark.sql(
            "SELECT id, repeat('x', 100) AS payload, id * 2 AS v "
            "FROM range(10) t(id)"
        ).write.parquet(p)
        spark.read.parquet(p).createOrReplaceTempView("e_scan")
        got = sqlext.sql(spark, "SELECT * EXCLUDE (payload) FROM e_scan")
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "payload" not in plan
        assert got.columns == ["id", "v"]
        spark.catalog.dropTempView("e_scan")


class TestReplace:
    def test_replaces_in_place_preserving_order(self, spark):
        spark.sql(
            "SELECT * FROM VALUES (1, 'ab', 2.0) AS t(id, code, score)"
        ).createOrReplaceTempView("r_wide")
        got = sqlext.sql(
            spark, "SELECT * REPLACE (upper(code) AS code) FROM r_wide"
        )
        assert got.columns == ["id", "code", "score"]
        assert got.collect() == [(1, "AB", 2.0)]
        spark.catalog.dropTempView("r_wide")

    def test_multi_item_with_function_commas_and_where(self, spark):
        spark.sql(
            "SELECT * FROM VALUES (1, 'x', 5), (2, 'y', 20) AS t(id, tag, v)"
        ).createOrReplaceTempView("r_two")
        got = sqlext.sql(
            spark,
            "SELECT * REPLACE (coalesce(tag, 'z', 'w') AS tag, v * 2 AS v) "
            "FROM r_two WHERE v > 10",
        )
        assert got.columns == ["id", "tag", "v"]
        assert got.collect() == [(2, "y", 40)]
        spark.catalog.dropTempView("r_two")

    def test_refuses_out_of_grammar(self, spark):
        spark.sql(
            "SELECT * FROM VALUES (1, 2) AS t(a, b)"
        ).createOrReplaceTempView("r_ref")
        # unknown target column, as in DuckDB
        with pytest.raises(ValueError, match="not a column"):
            sqlext.sql(spark, "SELECT * REPLACE (1 AS zz) FROM r_ref")
        # duplicate target
        with pytest.raises(ValueError, match="duplicate column"):
            sqlext.sql(
                spark, "SELECT * REPLACE (1 AS a, 2 AS a) FROM r_ref"
            )
        # item without AS
        with pytest.raises(ValueError, match="not <expr> AS <col>"):
            sqlext.sql(spark, "SELECT * REPLACE (a + 1) FROM r_ref")
        # joins are out of grammar
        with pytest.raises(ValueError, match="no JOIN"):
            sqlext.sql(
                spark,
                "SELECT * REPLACE (1 AS a) FROM r_ref JOIN r_ref ON 1=1",
            )
        # unresolvable source
        with pytest.raises(ValueError, match="resolvable"):
            sqlext.sql(
                spark, "SELECT * REPLACE (1 AS a) FROM no_such_view_7"
            )
        spark.catalog.dropTempView("r_ref")


class TestMatchRecognize:
    @pytest.fixture()
    def mr_view(self, spark):
        rows = [
            # user 1: view, click, click, purchase -> one V C* P run
            (1, 1, _ts("2024-01-01T10:00"), "view"),
            (1, 2, _ts("2024-01-01T10:01"), "click"),
            (1, 3, _ts("2024-01-01T10:02"), "click"),
            (1, 4, _ts("2024-01-01T10:03"), "purchase"),
            # user 2: view, ERROR, purchase -> the filler breaks the run
            (2, 5, _ts("2024-01-01T11:00"), "view"),
            (2, 6, _ts("2024-01-01T11:01"), "error"),
            (2, 7, _ts("2024-01-01T11:02"), "purchase"),
            # user 3: two back-to-back V P runs -> n_matches = 2
            (3, 8, _ts("2024-01-01T12:00"), "view"),
            (3, 9, _ts("2024-01-01T12:01"), "purchase"),
            (3, 10, _ts("2024-01-01T12:02"), "view"),
            (3, 11, _ts("2024-01-01T12:03"), "purchase"),
        ]
        df = spark.createDataFrame(
            rows, "user_id int, event_id int, ts timestamp_ntz, "
            "event_type string"
        )
        df.createOrReplaceTempView("mr_events")
        yield df
        spark.catalog.dropTempView("mr_events")

    MR = """SELECT user_id, seq_len, n_matches, matched
            FROM mr_events
            MATCH_RECOGNIZE (
              PARTITION BY user_id
              ORDER BY ts, event_id
              PATTERN (V C* P)
              DEFINE V AS event_type = 'view',
                     C AS event_type = 'click',
                     P AS event_type = 'purchase'
            ) ORDER BY user_id"""

    def test_contiguous_match_and_filler_break(self, spark, mr_view):
        got = sqlext.sql(spark, self.MR).collect()
        assert [tuple(r) for r in got] == [
            (1, 4, 1, 1),   # V C C P matches once
            (2, 3, 0, 0),   # V - P: the error row breaks contiguity
            (3, 4, 2, 1),   # VPVP: two non-overlapping matches
        ]

    def test_order_by_is_a_total_order_over_ties(self, spark, mr_view):
        # same instant, ordered by the event_id tiebreak: without it
        # the symbol string would be nondeterministic
        spark.createDataFrame(
            [
                (9, 2, _ts("2024-01-01T10:00"), "purchase"),
                (9, 1, _ts("2024-01-01T10:00"), "view"),
            ],
            "user_id int, event_id int, ts timestamp_ntz, "
            "event_type string",
        ).createOrReplaceTempView("mr_tie")
        got = sqlext.sql(
            spark,
            """SELECT user_id, n_matches FROM mr_tie
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 PATTERN (V P)
                 DEFINE V AS event_type = 'view',
                        P AS event_type = 'purchase'
               )""",
        ).collect()
        assert [tuple(r) for r in got] == [(9, 1)]
        spark.catalog.dropTempView("mr_tie")

    def test_alternation_and_plus(self, spark, mr_view):
        got = sqlext.sql(
            spark,
            """SELECT user_id, n_matches FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 PATTERN ((V | C)+ P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id""",
        ).collect()
        assert [tuple(r) for r in got] == [(1, 1), (2, 0), (3, 2)]

    def test_refuses_out_of_grammar(self, spark, mr_view):
        # pattern symbol without a DEFINE
        with pytest.raises(ValueError, match="without a DEFINE"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts
                   PATTERN (V X) DEFINE V AS event_type = 'view')""",
            )
        # duplicate DEFINE symbol
        with pytest.raises(ValueError, match="duplicate DEFINE"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts
                   PATTERN (V) DEFINE V AS event_type = 'view',
                   V AS event_type = 'click')""",
            )
        # multi-letter symbols are out of the lite grammar
        with pytest.raises(ValueError, match="single-letter"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts
                   PATTERN (V) DEFINE VW AS event_type = 'view')""",
            )
        # descending / expression ORDER BY is refused (the symbol
        # string needs a plain ascending total order)
        with pytest.raises(ValueError, match="plain ascending column"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts DESC
                   PATTERN (V) DEFINE V AS event_type = 'view')""",
            )
        # clause present but malformed (no PARTITION BY)
        with pytest.raises(ValueError, match="does not match the supported"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   ORDER BY ts PATTERN (V)
                   DEFINE V AS event_type = 'view')""",
            )

    def test_refuses_empty_matchable_pattern(self, spark, mr_view):
        # every term quantified with * / ? -> the regex matches the
        # empty string; zero-width match counting is engine-divergent
        with pytest.raises(ValueError, match="EMPTY row sequence"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   PATTERN (V* C?)
                   DEFINE V AS event_type = 'view',
                          C AS event_type = 'click')""",
            )
        # the bounded form of the same hole: {0,m} on every term
        with pytest.raises(ValueError, match="EMPTY row sequence"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   PATTERN (V{0,3})
                   DEFINE V AS event_type = 'view')""",
            )

    def test_bounded_quantifiers(self, spark, mr_view):
        # V C{2,3} P: only user 1's VCCP has 2-3 clicks between
        got = sqlext.sql(
            spark,
            """SELECT user_id, n_matches FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 PATTERN (V C{2,3} P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id""",
        ).collect()
        assert [tuple(r) for r in got] == [(1, 1), (2, 0), (3, 0)]

    def test_bounds_with_alternation_group(self, spark, mr_view):
        # (V|C){1,2} P over VCCP / V-P / VPVP: greedy backtracking
        # finds CCP for user 1, nothing for 2, both VPs for 3 —
        # identically on Java and RE2
        got = sqlext.sql(
            spark,
            """SELECT user_id, n_matches FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 AFTER MATCH SKIP PAST LAST ROW
                 PATTERN ((V | C){1,2} P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id""",
        ).collect()
        assert [tuple(r) for r in got] == [(1, 1), (2, 0), (3, 2)]

    def test_measures_one_row_per_match(self, spark, mr_view):
        got = sqlext.sql(
            spark,
            """SELECT user_id, match_no, n_rows, first_eid, last_eid
               FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(*) AS n_rows,
                          FIRST(event_id) AS first_eid,
                          LAST(event_id) AS last_eid
                 ONE ROW PER MATCH
                 PATTERN (V C* P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id, match_no""",
        ).collect()
        # user 1: one 4-row match spanning events 1..4; user 2: no
        # rows at all (ONE ROW PER MATCH); user 3: two 2-row matches
        assert [tuple(r) for r in got] == [
            (1, 1, 4, 1, 4),
            (3, 1, 2, 8, 9),
            (3, 2, 2, 10, 11),
        ]

    def test_measures_with_group_pattern(self, spark, mr_view):
        # capture groups in the pattern must not perturb the gaps
        # decomposition: Java's Pattern.split and RE2's
        # regexp_split_to_array both ignore capture groups (unlike
        # Python re.split) — positions stay correct
        got = sqlext.sql(
            spark,
            """SELECT user_id, match_no, n_rows, first_eid, last_eid
               FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(*) AS n_rows,
                          FIRST(event_id) AS first_eid,
                          LAST(event_id) AS last_eid
                 ONE ROW PER MATCH
                 PATTERN ((V | C){1,2} P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id, match_no""",
        ).collect()
        # user 1 'VCCP': greedy backtracks to CCP (events 2..4);
        # user 2 'V-P': none; user 3 'VPVP': two VP matches
        assert [tuple(r) for r in got] == [
            (1, 1, 3, 2, 4),
            (3, 1, 2, 8, 9),
            (3, 2, 2, 10, 11),
        ]

    def test_refuses_adjacent_quantifiers(self, spark, mr_view):
        # possessive 'V*+' runs possessively on Java but is a hard
        # error in RE2 — the r9 advisor's engine-divergence find
        with pytest.raises(ValueError, match="adjacent quantifiers"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   PATTERN (V*+ P)
                   DEFINE V AS event_type = 'view',
                          P AS event_type = 'purchase')""",
            )

    def test_refuses_bad_bounds(self, spark, mr_view):
        with pytest.raises(ValueError, match="max < min"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   PATTERN (V{4,2} P)
                   DEFINE V AS event_type = 'view',
                          P AS event_type = 'purchase')""",
            )
        with pytest.raises(ValueError, match="exceeds the cap"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   PATTERN (V{65} P)
                   DEFINE V AS event_type = 'view',
                          P AS event_type = 'purchase')""",
            )

    def test_refuses_one_row_per_match_without_measures(self, spark, mr_view):
        # without MEASURES the lowering is the aggregate
        # per-partition form — honoring the clause silently would
        # return the wrong row multiplicity (r10 review find)
        with pytest.raises(ValueError, match="requires a MEASURES"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ONE ROW PER MATCH
                   PATTERN (V P)
                   DEFINE V AS event_type = 'view',
                          P AS event_type = 'purchase')""",
            )

    def test_refuses_unsupported_skip_mode(self, spark, mr_view):
        # all four mainstream modes are in grammar since r12 (PAST
        # LAST ROW, TO NEXT ROW, TO FIRST/LAST <sym>, bare TO <sym>);
        # anything else still gets a refusal naming the menu
        with pytest.raises(ValueError, match="not supported"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   AFTER MATCH SKIP TO SECOND ROW
                   PATTERN (V P)
                   DEFINE V AS event_type = 'view',
                          P AS event_type = 'purchase')""",
            )

    def test_skip_to_next_row_counts_overlaps(self, spark, mr_view):
        # user 1 is V C C P: under (V|C)+ P the non-overlapping scan
        # finds 1 match, the overlapping scan one per starting row
        # (VCCP, CCP, CP) = 3 — the two skip modes must be
        # value-distinct on the same input
        base = """SELECT user_id, n_matches FROM mr_events
                  MATCH_RECOGNIZE (
                    PARTITION BY user_id ORDER BY ts, event_id
                    {skip}
                    PATTERN ((V|C)+ P)
                    DEFINE V AS event_type = 'view',
                           C AS event_type = 'click',
                           P AS event_type = 'purchase')
                  ORDER BY user_id"""
        non = {
            r["user_id"]: r["n_matches"]
            for r in sqlext.sql(
                spark, base.format(skip="AFTER MATCH SKIP PAST LAST ROW")
            ).collect()
        }
        ov = {
            r["user_id"]: r["n_matches"]
            for r in sqlext.sql(
                spark, base.format(skip="AFTER MATCH SKIP TO NEXT ROW")
            ).collect()
        }
        assert non[1] == 1 and ov[1] == 3
        # user 3's two disjoint V P runs: both modes agree
        assert non[3] == 2 and ov[3] == 2

    def test_skip_to_next_row_measures_positions(self, spark, mr_view):
        rows = sqlext.sql(
            spark,
            """SELECT user_id, match_no, n_rows, first_id, last_id
               FROM mr_events MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY ts, event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(*) AS n_rows,
                          FIRST(event_id) AS first_id,
                          LAST(event_id) AS last_id
                 ONE ROW PER MATCH
                 AFTER MATCH SKIP TO NEXT ROW
                 PATTERN ((V|C)+ P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase')
               ORDER BY user_id, match_no""",
        ).collect()
        u1 = [tuple(r)[1:] for r in rows if r["user_id"] == 1]
        # three overlapping matches, numbered by start position,
        # all ending at the purchase (event_id 4)
        assert u1 == [(1, 4, 1, 4), (2, 3, 2, 4), (3, 2, 3, 4)]

    @pytest.fixture()
    def chain_view(self, spark):
        # user 1: V C C V C V — (V C+ V) matches chain through the
        # shared boundary view under SKIP TO LAST V; user 2 has no
        # match at all
        rows = [
            (1, 1, "view"), (1, 2, "click"), (1, 3, "click"),
            (1, 4, "view"), (1, 5, "click"), (1, 6, "view"),
            (2, 7, "view"), (2, 8, "click"), (2, 9, "purchase"),
        ]
        spark.createDataFrame(
            rows, "user_id int, event_id int, event_type string"
        ).createOrReplaceTempView("mr_chain")
        yield
        spark.catalog.dropTempView("mr_chain")

    SKIP_TO = """SELECT user_id, match_no, n_rows, first_id, last_id
        FROM mr_chain
        MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY event_id
          MEASURES MATCH_NUMBER() AS match_no, COUNT(*) AS n_rows,
                   FIRST(event_id) AS first_id,
                   LAST(event_id) AS last_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP {skip}
          PATTERN (V C+ V)
          DEFINE V AS event_type = 'view',
                 C AS event_type = 'click'
        ) ORDER BY user_id, match_no"""

    def test_skip_to_last_chains_through_boundary_row(
        self, spark, chain_view
    ):
        # SKIP TO LAST V resumes AT the closing view, which then
        # OPENS the next match: VCCV (rows 1-4) chains into VCV
        # (rows 4-6). PAST LAST ROW finds only the first — the modes
        # must be value-distinct on the same input.
        got = sqlext.sql(
            spark, self.SKIP_TO.format(skip="TO LAST V")
        ).collect()
        assert [tuple(r) for r in got] == [
            (1, 1, 4, 1, 4), (1, 2, 3, 4, 6),
        ]
        non = sqlext.sql(
            spark, self.SKIP_TO.format(skip="PAST LAST ROW")
        ).collect()
        assert [tuple(r) for r in non] == [(1, 1, 4, 1, 4)]

    def test_skip_to_bare_symbol_means_last(self, spark, chain_view):
        # SQL:2016: AFTER MATCH SKIP TO <sym> == SKIP TO LAST <sym>
        bare = sqlext.sql(
            spark, self.SKIP_TO.format(skip="TO V")
        ).collect()
        last = sqlext.sql(
            spark, self.SKIP_TO.format(skip="TO LAST V")
        ).collect()
        assert [tuple(r) for r in bare] == [tuple(r) for r in last]

    def test_skip_to_first_interior_symbol(self, spark, chain_view):
        # SKIP TO FIRST C resumes at the first click INSIDE the
        # match (offset 2, legal): the scan re-enters at row 2 and
        # still finds the second chained match at rows 4-6
        got = sqlext.sql(
            spark, self.SKIP_TO.format(skip="TO FIRST C")
        ).collect()
        assert [tuple(r) for r in got] == [
            (1, 1, 4, 1, 4), (1, 2, 3, 4, 6),
        ]

    def test_skip_to_aggregate_form_and_all_rows(
        self, spark, chain_view
    ):
        # no-MEASURES aggregate form counts the chained matches
        agg = sqlext.sql(
            spark,
            """SELECT user_id, seq_len, n_matches, matched
               FROM mr_chain MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY event_id
                 AFTER MATCH SKIP TO LAST V
                 PATTERN (V C+ V)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click'
               ) ORDER BY user_id""",
        ).collect()
        assert [tuple(r) for r in agg] == [(1, 6, 2, 1), (2, 3, 0, 0)]
        # ALL ROWS PER MATCH composes: the boundary view (row 4) is
        # emitted TWICE — last row of match 1 AND first row of
        # match 2 — with running CLASSIFIER per emitted row
        ar = sqlext.sql(
            spark,
            """SELECT user_id, match_no, rn, cls
               FROM mr_chain MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(*) AS rn, CLASSIFIER() AS cls
                 ALL ROWS PER MATCH
                 AFTER MATCH SKIP TO LAST V
                 PATTERN (V C+ V)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click'
               ) ORDER BY user_id, match_no, rn""",
        ).collect()
        assert [tuple(r) for r in ar] == [
            (1, 1, 1, "V"), (1, 1, 2, "C"), (1, 1, 3, "C"),
            (1, 1, 4, "V"),
            (1, 2, 1, "V"), (1, 2, 2, "C"), (1, 2, 3, "V"),
        ]

    def test_skip_to_first_row_of_match_raises(self, spark, chain_view):
        # SQL:2016 runtime error: SKIP TO FIRST V where V opens the
        # match would resume AT the match start — infinite loop
        with pytest.raises(Exception, match="loop forever"):
            sqlext.sql(
                spark, self.SKIP_TO.format(skip="TO FIRST V")
            ).collect()

    def test_skip_to_absent_symbol_raises_at_runtime(self, spark):
        # SQL:2016 runtime error: the skip symbol is in PATTERN but
        # did not participate in THIS match (alternation branch)
        rows = [(3, 1, "purchase")]
        spark.createDataFrame(
            rows, "user_id int, event_id int, event_type string"
        ).createOrReplaceTempView("mr_absent")
        try:
            with pytest.raises(Exception, match="did not participate"):
                sqlext.sql(
                    spark,
                    """SELECT user_id, match_no FROM mr_absent
                       MATCH_RECOGNIZE (
                         PARTITION BY user_id ORDER BY event_id
                         MEASURES MATCH_NUMBER() AS match_no
                         ONE ROW PER MATCH
                         AFTER MATCH SKIP TO LAST C
                         PATTERN (V C+ V | P)
                         DEFINE V AS event_type = 'view',
                                C AS event_type = 'click',
                                P AS event_type = 'purchase'
                       )""",
                ).collect()
        finally:
            spark.catalog.dropTempView("mr_absent")

    def test_skip_to_symbol_not_in_pattern_refused_statically(
        self, spark, chain_view
    ):
        # a skip symbol absent from PATTERN can never be skipped to
        # — every match would error — so it is refused at parse time
        with pytest.raises(ValueError, match="does not appear in"):
            sqlext.sql(spark, self.SKIP_TO.format(skip="TO LAST Z"))

    @pytest.fixture()
    def subset_view(self, spark):
        rows = [
            (1, 1, "view", 10.0), (1, 2, "click", 1.0),
            (1, 3, "click", 2.0), (1, 4, "purchase", 50.0),
            (3, 8, "view", 5.0), (3, 9, "purchase", 30.0),
            (3, 10, "view", 6.0), (3, 11, "purchase", 40.0),
        ]
        spark.createDataFrame(
            rows,
            "user_id int, event_id int, event_type string, "
            "value double",
        ).createOrReplaceTempView("mr_subset")
        yield
        spark.catalog.dropTempView("mr_subset")

    def test_subset_union_measures(self, spark, subset_view):
        # SUBSET E = (V, C): every per-symbol form works over the
        # union — E's rows are the views AND clicks of each match
        got = sqlext.sql(
            spark,
            """SELECT user_id, match_no, n_eng, first_eng, last_eng,
                      s_eng, a_eng
               FROM mr_subset MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(E.*) AS n_eng,
                          FIRST(E.event_id) AS first_eng,
                          LAST(E.event_id) AS last_eng,
                          SUM(E.event_id) AS s_eng,
                          AVG(E.event_id) AS a_eng
                 ONE ROW PER MATCH
                 PATTERN (V C* P)
                 SUBSET E = (V, C)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id, match_no""",
        ).collect()
        assert [tuple(r) for r in got] == [
            (1, 1, 3, 1, 3, 6, 2.0),
            (3, 1, 1, 8, 8, 8, 8.0),
            (3, 2, 1, 10, 10, 10, 10.0),
        ]

    def test_subset_mixes_with_primary_symbol_measures(
        self, spark, subset_view
    ):
        # a union and one of its members in the same MEASURES list:
        # each binds its own position array, values stay per-scope
        got = sqlext.sql(
            spark,
            """SELECT user_id, n_eng, n_c FROM mr_subset
               MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY event_id
                 MEASURES COUNT(E.*) AS n_eng, COUNT(C.*) AS n_c
                 ONE ROW PER MATCH
                 PATTERN (V C* P)
                 SUBSET E = (V, C)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id""",
        ).filter("user_id = 1").collect()
        assert [tuple(r) for r in got] == [(1, 3, 2)]

    def test_subset_as_skip_target(self, spark, subset_view):
        # SKIP TO LAST E: the last engagement row of user 1's VCCP
        # is the click at row 3 — interior, legal; the scan resumes
        # there and finds nothing further
        got = sqlext.sql(
            spark,
            """SELECT user_id, match_no, n_rows FROM mr_subset
               MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(*) AS n_rows
                 ONE ROW PER MATCH
                 AFTER MATCH SKIP TO LAST E
                 PATTERN (V C+ P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
                 ) ORDER BY user_id, match_no""".replace(
                "PATTERN (V C+ P)",
                "PATTERN (V C+ P) SUBSET E = (V, C)",
            ),
        ).collect()
        assert [tuple(r) for r in got] == [(1, 1, 4)]
        # ...and a union target whose last row IS the match start
        # (user 3's VP: last E = the opening view) raises the
        # SQL:2016 infinite-loop error at execution
        with pytest.raises(Exception, match="loop forever"):
            sqlext.sql(
                spark,
                """SELECT user_id, match_no FROM mr_subset
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id ORDER BY event_id
                     MEASURES MATCH_NUMBER() AS match_no
                     ONE ROW PER MATCH
                     AFTER MATCH SKIP TO LAST E
                     PATTERN (V C* P)
                     SUBSET E = (V, C)
                     DEFINE V AS event_type = 'view',
                            C AS event_type = 'click',
                            P AS event_type = 'purchase'
                   )""",
            ).collect()

    def test_subset_refusals(self, spark, subset_view):
        base = """SELECT user_id, n_eng FROM mr_subset
            MATCH_RECOGNIZE (
              PARTITION BY user_id ORDER BY event_id
              MEASURES COUNT(E.*) AS n_eng
              ONE ROW PER MATCH
              PATTERN (V C* P)
              {subset}
              DEFINE V AS event_type = 'view',
                     C AS event_type = 'click',
                     P AS event_type = 'purchase')"""
        for subset, why in [
            ("SUBSET V = (C, P)", "collides"),
            ("SUBSET E = (V, V)", "twice"),
            ("SUBSET E = (V, Z)", "do not appear"),
            ("SUBSET E = (V), E = (C)", "duplicate SUBSET"),
            ("SUBSET EE = (V, C)", "not"),
        ]:
            with pytest.raises(ValueError, match=why):
                sqlext.sql(spark, base.format(subset=subset))
        # a union symbol referenced in MEASURES without a SUBSET
        # clause is still the plain undefined-symbol error
        with pytest.raises(ValueError, match="does not appear"):
            sqlext.sql(spark, base.format(subset=""))

    def test_refuses_repeating_a_nullable_group(self, spark, mr_view):
        # (r12, surfaced by the overlap property test): repeating a
        # group that can itself match EMPTY is where the engines
        # genuinely diverge — Java/Python stop a loop iteration that
        # matched empty, RE2/DuckDB continues into non-empty
        # branches of the same iteration ('^(C((E*)|(P))*)'
        # extracts 'CE' vs 'CEP'). Refused; '?' stays legal.
        for bad in ["(C*)*", "((C*)|(P))+", "(C?){2}", "(C*){0,3}"]:
            with pytest.raises(ValueError, match="repeats a group"):
                sqlext._parse_pattern(f"V {bad}")
        # non-repeating quantifiers on a nullable group stay legal
        assert sqlext._parse_pattern("V (C*)?") == "V(C*)?".replace(" ", "")
        assert sqlext._parse_pattern("V (C*){1}") == "V(C*){1}"
        # ...and repeating a NON-nullable group is untouched
        assert sqlext._parse_pattern("(V|C)+P") == "(V|C)+P"

    def test_partition_anchors(self, spark):
        # ^ pins the match to the partition's FIRST row, $ to its
        # LAST — zero-width, value-distinct from the unanchored scan
        rows = [
            (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
            (1, 4, "view"), (1, 5, "purchase"),
            (2, 6, "click"), (2, 7, "view"), (2, 8, "purchase"),
        ]
        spark.createDataFrame(
            rows, "user_id int, event_id int, event_type string"
        ).createOrReplaceTempView("mr_anchor")
        q = """SELECT user_id, seq_len, n_matches, matched
            FROM mr_anchor MATCH_RECOGNIZE (
              PARTITION BY user_id ORDER BY event_id
              PATTERN ({pat})
              DEFINE V AS event_type = 'view',
                     C AS event_type = 'click',
                     P AS event_type = 'purchase'
            ) ORDER BY user_id"""
        try:
            # history STARTS with the run: user 2 starts with a
            # click -> anchored miss where the plain scan matches
            start = sqlext.sql(
                spark, q.format(pat="^ V C* P")
            ).collect()
            assert [tuple(r) for r in start] == [
                (1, 5, 1, 1), (2, 3, 0, 0),
            ]
            # history ENDS with the run: both users end ...VP
            end = sqlext.sql(spark, q.format(pat="V C* P $")).collect()
            assert [tuple(r) for r in end] == [
                (1, 5, 1, 1), (2, 3, 1, 1),
            ]
            # both anchors: whole-history match only
            both = sqlext.sql(
                spark, q.format(pat="^ V C* P $")
            ).collect()
            assert [tuple(r) for r in both] == [
                (1, 5, 0, 0), (2, 3, 0, 0),
            ]
            # MEASURES read positions through the anchored
            # enumeration unchanged
            meas = sqlext.sql(
                spark,
                """SELECT user_id, n_rows, first_id
                   FROM mr_anchor MATCH_RECOGNIZE (
                     PARTITION BY user_id ORDER BY event_id
                     MEASURES COUNT(*) AS n_rows,
                              FIRST(event_id) AS first_id
                     ONE ROW PER MATCH
                     PATTERN (V C* P $)
                     DEFINE V AS event_type = 'view',
                            C AS event_type = 'click',
                            P AS event_type = 'purchase'
                   ) ORDER BY user_id""",
            ).collect()
            assert [tuple(r) for r in meas] == [(1, 2, 4), (2, 2, 7)]
            # anchors over a TOP-LEVEL alternation are REFUSED (r12
            # reviewer): SQL:2016 scopes '^V | P' to one branch, the
            # boundary grammar to the whole pattern — ambiguous, so
            # the user must group; the grouped form is whole-pattern
            # under both readings and the emission parenthesizes the
            # core ('|' binds looser than the anchors)
            for amb in ["^ V | P", "V | P $", "^ V | P $"]:
                with pytest.raises(ValueError, match="ambiguous"):
                    sqlext._parse_pattern(amb)
            assert sqlext._parse_pattern("^ (V | P)") == "^((V|P))"
            alt = sqlext.sql(
                spark,
                """SELECT user_id, n_matches
                   FROM mr_anchor MATCH_RECOGNIZE (
                     PARTITION BY user_id ORDER BY event_id
                     PATTERN (^ (C | P))
                     DEFINE C AS event_type = 'click',
                            P AS event_type = 'purchase'
                   ) ORDER BY user_id""",
            ).collect()
            # user 1 starts with a view: neither branch may match
            # at the partition start — and P must NOT match at its
            # interior purchases; user 2 starts with a click
            assert [tuple(r) for r in alt] == [(1, 0), (2, 1)]
            # refusals: interior anchor; anchors-only; anchored
            # pattern under an overlapping/skip-to scan
            with pytest.raises(ValueError, match="boundaries"):
                sqlext.sql(spark, q.format(pat="V ^ P"))
            with pytest.raises(ValueError, match="only anchors"):
                sqlext.sql(spark, q.format(pat="^ $"))
            with pytest.raises(ValueError, match="nothing to enumerate"):
                sqlext.sql(
                    spark,
                    q.format(pat="^ V C* P").replace(
                        "PATTERN", "AFTER MATCH SKIP TO NEXT ROW "
                        "PATTERN",
                    ),
                )
        finally:
            spark.catalog.dropTempView("mr_anchor")

    def test_explicit_running_final_under_all_rows(self, spark, mr_view):
        # explicit FINAL under ALL ROWS switches a measure to the
        # WHOLE-match scope while RUNNING siblings keep per-row
        # scope — mixed in one MEASURES list, each (symbol, scope)
        # binds its own array (user 1 is V C C P)
        got = sqlext.sql(
            spark,
            """SELECT user_id, rn, fn, r_last, f_last, r_cls, f_cls,
                      r_sc, f_sc
               FROM mr_events MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 MEASURES RUNNING COUNT(*) AS rn,
                          FINAL COUNT(*) AS fn,
                          LAST(event_id) AS r_last,
                          FINAL LAST(event_id) AS f_last,
                          RUNNING CLASSIFIER() AS r_cls,
                          FINAL CLASSIFIER() AS f_cls,
                          SUM(C.event_id) AS r_sc,
                          FINAL SUM(C.event_id) AS f_sc
                 ALL ROWS PER MATCH
                 PATTERN (V C* P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id, rn""",
        ).filter("user_id = 1").collect()
        assert [tuple(r) for r in got] == [
            (1, 1, 4, 1, 4, "V", "P", None, 5),
            (1, 2, 4, 2, 4, "C", "P", 2, 5),
            (1, 3, 4, 3, 4, "C", "P", 5, 5),
            (1, 4, 4, 4, 4, "P", "P", 5, 5),
        ]

    def test_running_final_no_op_under_one_row(self, spark, mr_view):
        # under ONE ROW the evaluation row is the match's last row,
        # where the standard makes RUNNING and FINAL coincide — both
        # keywords accepted, values identical to the unqualified form
        q = """SELECT user_id, n, l FROM mr_events MATCH_RECOGNIZE (
               PARTITION BY user_id ORDER BY ts, event_id
               MEASURES {kw1}COUNT(*) AS n, {kw2}LAST(event_id) AS l
               ONE ROW PER MATCH
               PATTERN (V C* P)
               DEFINE V AS event_type = 'view',
                      C AS event_type = 'click',
                      P AS event_type = 'purchase'
             ) ORDER BY user_id"""
        plain = sqlext.sql(spark, q.format(kw1="", kw2="")).collect()
        fin = sqlext.sql(
            spark, q.format(kw1="FINAL ", kw2="RUNNING ")
        ).collect()
        assert [tuple(r) for r in plain] == [tuple(r) for r in fin]
        assert [tuple(r) for r in plain] == [(1, 4, 4), (3, 2, 9), (3, 2, 11)]

    def test_pattern_exclusion_region(self, spark, mr_view):
        # {- C+ -}: the clicks MATCH (extents, j-numbering and
        # measures all see them) but are omitted from the ALL ROWS
        # output — user 1's VCCP emits only its V and P rows, with
        # rn still carrying the full in-match positions 1 and 4
        got = sqlext.sql(
            spark,
            """SELECT user_id, match_no, rn, cls
               FROM mr_events MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY ts, event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(*) AS rn, CLASSIFIER() AS cls
                 ALL ROWS PER MATCH
                 PATTERN (V {- C* -} P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id, match_no, rn""",
        ).filter("user_id = 1").collect()
        assert [tuple(r) for r in got] == [
            (1, 1, 1, "V"), (1, 1, 4, "P"),
        ]
        # ONE ROW PER MATCH: exclusion is a no-op (the standard) —
        # COUNT(*) and per-symbol aggregates still see the clicks
        one = sqlext.sql(
            spark,
            """SELECT user_id, n_rows, s_c
               FROM mr_events MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY ts, event_id
                 MEASURES COUNT(*) AS n_rows, SUM(C.event_id) AS s_c
                 ONE ROW PER MATCH
                 PATTERN (V {- C* -} P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id""",
        ).filter("user_id = 1").collect()
        assert [tuple(r) for r in one] == [(1, 4, 5)]
        # refusals: a symbol both inside and outside a region needs
        # per-position attribution — refused; nesting, quantified
        # regions and unbalanced braces are parse errors
        with pytest.raises(ValueError, match="ONLY inside"):
            sqlext.sql(
                spark,
                """SELECT user_id, rn FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   MEASURES COUNT(*) AS rn
                   ALL ROWS PER MATCH
                   PATTERN (V {- C+ -} C P)
                   DEFINE V AS event_type = 'view',
                          C AS event_type = 'click',
                          P AS event_type = 'purchase')""",
            )
        for bad, why in [
            ("{- {- C -} -}", "nest"),
            ("V {- C+ -}* P", "cannot be quantified"),
            ("V {- C+ P", "missing its closing"),
        ]:
            with pytest.raises(ValueError, match=why):
                sqlext._parse_pattern(bad)

    def test_universal_aggregates_and_offset_navigation(self, spark):
        # bare SUM/MIN/MAX/AVG(<col>) range over ALL scope rows
        # (SQL:2016's universal variable), COUNT(<col>) counts
        # NON-NULL values, and FIRST/LAST take the logical offset
        # (out-of-range -> NULL)
        rows = [
            (1, 1, "view", 10.0), (1, 2, "click", None),
            (1, 3, "click", 2.0), (1, 4, "purchase", 50.0),
            (3, 8, "view", 5.0), (3, 9, "purchase", 30.0),
        ]
        spark.createDataFrame(
            rows,
            "user_id int, event_id int, event_type string, v double",
        ).createOrReplaceTempView("mr_uni")
        try:
            got = sqlext.sql(
                spark,
                """SELECT user_id, s_all, a_all, n_v, mn, mx,
                          second_id, penult_id, second_click, far
                   FROM mr_uni MATCH_RECOGNIZE (
                     PARTITION BY user_id ORDER BY event_id
                     MEASURES SUM(event_id) AS s_all,
                              AVG(event_id) AS a_all,
                              COUNT(v) AS n_v,
                              MIN(v) AS mn, MAX(v) AS mx,
                              FIRST(event_id, 1) AS second_id,
                              LAST(event_id, 1) AS penult_id,
                              FIRST(C.event_id, 1) AS second_click,
                              FIRST(event_id, 9) AS far
                     ONE ROW PER MATCH
                     PATTERN (V C* P)
                     DEFINE V AS event_type = 'view',
                            C AS event_type = 'click',
                            P AS event_type = 'purchase'
                   ) ORDER BY user_id""",
            ).collect()
            # user 1 VCCP: universal sum 1+2+3+4, COUNT(v) skips the
            # NULL click, second C is event 3, offset-9 overruns ->
            # NULL; user 3's 2-row VP has no second click
            assert [tuple(r) for r in got] == [
                (1, 10, 2.5, 3, 2.0, 50.0, 2, 3, 3, None),
                (3, 17, 8.5, 2, 5.0, 30.0, 9, 8, None, None),
            ]
            # RUNNING vs FINAL composition under ALL ROWS: the
            # universal sum climbs 1,3,6,10 while FINAL stays 10;
            # the running penultimate is NULL on a 1-row scope
            ar = sqlext.sql(
                spark,
                """SELECT user_id, rn, r_sum, f_sum, r_pen, f_pen
                   FROM mr_uni MATCH_RECOGNIZE (
                     PARTITION BY user_id ORDER BY event_id
                     MEASURES COUNT(*) AS rn,
                              SUM(event_id) AS r_sum,
                              FINAL SUM(event_id) AS f_sum,
                              LAST(event_id, 1) AS r_pen,
                              FINAL LAST(event_id, 1) AS f_pen
                     ALL ROWS PER MATCH
                     PATTERN (V C* P)
                     DEFINE V AS event_type = 'view',
                            C AS event_type = 'click',
                            P AS event_type = 'purchase'
                   ) ORDER BY user_id, rn""",
            ).filter("user_id = 1").collect()
            assert [tuple(r) for r in ar] == [
                (1, 1, 1, 10, None, 3),
                (1, 2, 3, 10, 1, 3),
                (1, 3, 6, 10, 2, 3),
                (1, 4, 10, 10, 3, 3),
            ]
        finally:
            spark.catalog.dropTempView("mr_uni")

    def test_refuses_running_final_match_number(self, spark, mr_view):
        with pytest.raises(ValueError, match="no row scope"):
            sqlext.sql(
                spark,
                """SELECT user_id, n FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   MEASURES FINAL MATCH_NUMBER() AS n
                   ONE ROW PER MATCH
                   PATTERN (V C* P)
                   DEFINE V AS event_type = 'view',
                          C AS event_type = 'click',
                          P AS event_type = 'purchase')""",
            )

    def test_all_rows_per_match_running_semantics(self, spark, mr_view):
        rows = sqlext.sql(
            spark,
            """SELECT user_id, match_no, rn, sym, row_id
               FROM mr_events MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY ts, event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(*) AS rn,
                          CLASSIFIER() AS sym,
                          LAST(event_id) AS row_id
                 ALL ROWS PER MATCH
                 PATTERN (V C* P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase')
               ORDER BY user_id, match_no, rn""",
        ).collect()
        u1 = [
            (r["rn"], r["sym"], r["row_id"])
            for r in rows
            if r["user_id"] == 1
        ]
        # one row per MATCHED INPUT ROW, RUNNING COUNT(*) = position,
        # CLASSIFIER = the row's symbol, LAST = the CURRENT row's col
        assert u1 == [(1, "V", 1), (2, "C", 2), (3, "C", 3), (4, "P", 4)]
        # user 2's filler-broken run contributes no rows at all
        assert not [r for r in rows if r["user_id"] == 2]
        # user 3: two matches of two rows each
        u3 = [(r["match_no"], r["rn"]) for r in rows if r["user_id"] == 3]
        assert u3 == [(1, 1), (1, 2), (2, 1), (2, 2)]

    def test_all_rows_requires_measures(self, spark, mr_view):
        with pytest.raises(ValueError, match="ALL ROWS.*requires a MEASURES"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ALL ROWS PER MATCH
                   PATTERN (V P)
                   DEFINE V AS event_type = 'view',
                          P AS event_type = 'purchase')""",
            )

    def test_overlap_composes_with_all_rows(self, spark, mr_view):
        # SKIP TO NEXT ROW x ALL ROWS PER MATCH: user 1 (V C C P)
        # under (V|C)+ P has overlapping matches starting at rows
        # 1, 2, 3, each fanned out per row — 4 + 3 + 2 = 9 rows
        rows = sqlext.sql(
            spark,
            """SELECT user_id, match_no, rn, sym FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY ts, event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(*) AS rn,
                          CLASSIFIER() AS sym
                 ALL ROWS PER MATCH
                 AFTER MATCH SKIP TO NEXT ROW
                 PATTERN ((V|C)+ P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase')
               ORDER BY user_id, match_no, rn""",
        ).collect()
        u1 = [(r["match_no"], r["rn"], r["sym"]) for r in rows
              if r["user_id"] == 1]
        assert u1 == [
            (1, 1, "V"), (1, 2, "C"), (1, 3, "C"), (1, 4, "P"),
            (2, 1, "C"), (2, 2, "C"), (2, 3, "P"),
            (3, 1, "C"), (3, 2, "P"),
        ]

    def test_classifier_one_row_reads_last_row(self, spark, mr_view):
        # SQL:2016: under ONE ROW PER MATCH, CLASSIFIER() is FINAL —
        # the last row's symbol (always P here)
        rows = sqlext.sql(
            spark,
            """SELECT user_id, sym FROM mr_events MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY ts, event_id
                 MEASURES CLASSIFIER() AS sym
                 ONE ROW PER MATCH
                 PATTERN (V C* P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase')""",
        ).collect()
        assert rows and all(r["sym"] == "P" for r in rows)

    def test_refuses_measure_outside_menu(self, spark, mr_view):
        # bare SUM(<col>) joined the menu in r12 (the universal
        # aggregate), so the outside-the-menu examples are now an
        # unsupported aggregate fn and an expression argument
        for item in ["STDDEV(event_id) AS s", "SUM(event_id * 2) AS s"]:
            with pytest.raises(ValueError, match="outside the supported"):
                sqlext.sql(
                    spark,
                    f"""SELECT user_id, s FROM mr_events MATCH_RECOGNIZE (
                       PARTITION BY user_id ORDER BY ts, event_id
                       MEASURES {item}
                       PATTERN (V P)
                       DEFINE V AS event_type = 'view',
                              P AS event_type = 'purchase')""",
                )
        # measure alias shadowing the partition key is refused up
        # front (Spark would error only when the dup is referenced)
        with pytest.raises(ValueError, match="collides with the PARTITION"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   MEASURES COUNT(*) AS user_id
                   PATTERN (V P)
                   DEFINE V AS event_type = 'view',
                          P AS event_type = 'purchase')""",
            )
        # unknown measure source column
        with pytest.raises(ValueError, match="not a column"):
            sqlext.sql(
                spark,
                """SELECT user_id, f FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   MEASURES FIRST(nope) AS f
                   PATTERN (V P)
                   DEFINE V AS event_type = 'view',
                          P AS event_type = 'purchase')""",
            )

    def test_order_by_ties_raise_at_execution(self, spark):
        # the documented 'supply a tiebreak' contract, enforced (r9
        # advisor): two rows at the same instant under ORDER BY ts
        # alone -> the symbol string is order-dependent -> refuse
        spark.createDataFrame(
            [
                (9, 1, _ts("2024-01-01T10:00"), "view"),
                (9, 2, _ts("2024-01-01T10:00"), "purchase"),
            ],
            "user_id int, event_id int, ts timestamp_ntz, "
            "event_type string",
        ).createOrReplaceTempView("mr_tied")
        try:
            df = sqlext.sql(
                spark,
                """SELECT user_id, n_matches FROM mr_tied
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id
                     ORDER BY ts
                     PATTERN (V P)
                     DEFINE V AS event_type = 'view',
                            P AS event_type = 'purchase')""",
            )
            with pytest.raises(Exception, match="tiebreak"):
                df.collect()
        finally:
            spark.catalog.dropTempView("mr_tied")

    def test_identical_row_ties_are_deterministic_and_allowed(self, spark):
        # v7 duplicate class: a tie between FULLY IDENTICAL rows is
        # deterministic (equal structs are interchangeable — the
        # sorted array value is unique), so the guard admits it and
        # both copies participate in matching
        spark.createDataFrame(
            [
                (9, 1, _ts("2024-01-01T10:00"), "view"),
                (9, 1, _ts("2024-01-01T10:00"), "view"),
                (9, 2, _ts("2024-01-01T10:01"), "purchase"),
            ],
            "user_id int, event_id int, ts timestamp_ntz, "
            "event_type string",
        ).createOrReplaceTempView("mr_dup")
        try:
            got = sqlext.sql(
                spark,
                """SELECT user_id, n_matches FROM mr_dup
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id
                     ORDER BY ts, event_id
                     PATTERN (V V P)
                     DEFINE V AS event_type = 'view',
                            P AS event_type = 'purchase')""",
            ).collect()
            assert [tuple(r) for r in got] == [(9, 1)]
        finally:
            spark.catalog.dropTempView("mr_dup")

    def test_nav_identical_input_ties_allowed_differing_raise(self, spark):
        # PREV path: the symbol char is position-DERIVED, so the
        # guard compares INPUTS (order cols + DEFINE refs + nav
        # sources + measure sources). Identical-input duplicates are
        # admitted; a tie differing in a DEFINE-referenced column
        # still raises.
        spark.createDataFrame(
            [
                (9, 1, _ts("2024-01-01T10:00"), 5.0),
                (9, 2, _ts("2024-01-01T10:01"), 4.0),
                (9, 2, _ts("2024-01-01T10:01"), 4.0),
                (9, 3, _ts("2024-01-01T10:02"), 3.0),
            ],
            "user_id int, event_id int, ts timestamp_ntz, value double",
        ).createOrReplaceTempView("mr_nav_dup")
        spark.createDataFrame(
            [
                (9, 1, _ts("2024-01-01T10:00"), 5.0),
                (9, 2, _ts("2024-01-01T10:01"), 4.0),
                (9, 2, _ts("2024-01-01T10:01"), 3.5),
            ],
            "user_id int, event_id int, ts timestamp_ntz, value double",
        ).createOrReplaceTempView("mr_nav_bad")
        stmt = """SELECT user_id, n_matches FROM {t}
                  MATCH_RECOGNIZE (
                    PARTITION BY user_id
                    ORDER BY ts, event_id
                    PATTERN (D D)
                    DEFINE D AS value < PREV(value))"""
        try:
            got = sqlext.sql(spark, stmt.format(t="mr_nav_dup")).collect()
            # chars: '-' (no PREV), then the duplicate pair's
            # multiset {D: 4<5, -: 4<4}, then D (3<4). The engine's
            # tie convention sorts the pair by char ('-' < 'D'), so
            # the string is '--DD' — one DD match, deterministically
            assert [tuple(r) for r in got] == [(9, 1)]
            bad = sqlext.sql(spark, stmt.format(t="mr_nav_bad"))
            with pytest.raises(Exception, match="tiebreak"):
                bad.collect()
        finally:
            spark.catalog.dropTempView("mr_nav_dup")
            spark.catalog.dropTempView("mr_nav_bad")

    # ---- round-11 late additions: PERMUTE + per-symbol MEASURES ----

    def test_permute_expands_lexicographically(self):
        # the SQL:2016-defined expansion: all permutations,
        # lexicographic in the order the elements were written
        assert (
            sqlext._parse_pattern("PERMUTE(A,B,C)")
            == "(ABC|ACB|BAC|BCA|CAB|CBA)"
        )
        # quantifies like any group, composes with plain terms
        assert sqlext._parse_pattern("V PERMUTE(C,P)? X") == "V(CP|PC)?X"
        # trivial single-element PERMUTE is legal (and pointless)
        assert sqlext._parse_pattern("PERMUTE(A)") == "(A)"

    def test_permute_refusals(self):
        for bad, why in [
            ("PERMUTE(A,A)", "twice"),
            ("PERMUTE(A,B,C,D,E)", "capped at 4"),
            ("PERMUTE((A),B)", "plain symbols"),
            ("PERMUTE(A,PERMUTE(B,C))", "plain symbols"),
            ("PERMUTE(AB)", "SINGLE-letter"),
            ("PERMUTE(A,B", "closing"),
        ]:
            with pytest.raises(ValueError, match=why):
                sqlext._parse_pattern(bad)

    def test_permute_keyword_is_contiguous_only(self, spark, mr_view):
        # the keyword is detected on the RAW text (r11 advisor):
        # 'PERMUTE (A, B)' — keyword then a separated paren — is the
        # construct, but seven whitespace-separated single-letter
        # symbols 'P E R M U T E (V)' are a symbol run and must NOT
        # collapse into the keyword after whitespace stripping
        assert sqlext._parse_pattern("PERMUTE (A, B)") == "(AB|BA)"
        assert sqlext._parse_pattern("PERMUTE\n(A,B)") == "(AB|BA)"
        # the separated form parses as symbols -> the undefined-
        # symbol refusal names them instead of silently matching
        with pytest.raises(ValueError, match="without a DEFINE"):
            sqlext.sql(
                spark,
                """SELECT user_id, n_matches FROM mr_events
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id
                     ORDER BY ts, event_id
                     PATTERN (P E R M U T E (V))
                     DEFINE V AS event_type = 'view',
                            P AS event_type = 'purchase'
                   )""",
            )
        # ...and with every letter DEFINEd it is a plain 8-symbol
        # sequence (never present in the fixture -> zero matches),
        # not a 1-symbol PERMUTE (which user 1/2/3 all would match)
        got = sqlext.sql(
            spark,
            """SELECT user_id, n_matches FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 PATTERN (P E R M U T E (V))
                 DEFINE P AS event_type = 'purchase',
                        E AS event_type = 'error',
                        R AS event_type = 'view',
                        M AS event_type = 'view',
                        U AS event_type = 'view',
                        T AS event_type = 'view',
                        V AS event_type = 'view'
               ) ORDER BY user_id""",
        ).collect()
        assert [tuple(r) for r in got] == [(1, 0), (2, 0), (3, 0)]

    def test_permute_matches_any_adjacent_order(self, spark, mr_view):
        # PERMUTE(V, P): user 1 'VCCP' has no ADJACENT view+purchase
        # pair in either order; user 3 'VPVP' has two
        got = sqlext.sql(
            spark,
            """SELECT user_id, n_matches FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 PATTERN (PERMUTE(V, P))
                 DEFINE V AS event_type = 'view',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id""",
        ).collect()
        assert [tuple(r) for r in got] == [(1, 0), (2, 0), (3, 2)]

    def test_per_symbol_measures_final_and_nulls(self, spark, mr_view):
        # ONE ROW PER MATCH (final): user 1's VCCP match has two C
        # rows (events 2, 3); user 3's two VP matches have none —
        # the SQL:2016 contract is COUNT(C.*)=0 and NULL FIRST/LAST
        got = sqlext.sql(
            spark,
            """SELECT user_id, match_no, n_c, first_c, last_c
               FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(C.*) AS n_c,
                          FIRST(C.event_id) AS first_c,
                          LAST(C.event_id) AS last_c
                 ONE ROW PER MATCH
                 PATTERN (V C* P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id, match_no""",
        ).collect()
        assert [tuple(r) for r in got] == [
            (1, 1, 2, 2, 3),
            (3, 1, 0, None, None),
            (3, 2, 0, None, None),
        ]

    def test_per_symbol_measures_running_under_all_rows(
        self, spark, mr_view
    ):
        # ALL ROWS PER MATCH (running): per-symbol forms see only
        # C-rows AT OR BEFORE the current row — NULL until the first
        # C arrives, then sticky
        got = sqlext.sql(
            spark,
            """SELECT user_id, rn, c_so_far, last_c
               FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 MEASURES COUNT(*) AS rn,
                          COUNT(C.*) AS c_so_far,
                          LAST(C.event_id) AS last_c
                 ALL ROWS PER MATCH
                 PATTERN (V C* P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id, rn""",
        ).filter("user_id = 1").collect()
        assert [tuple(r) for r in got] == [
            (1, 1, 0, None),
            (1, 2, 1, 2),
            (1, 3, 2, 3),
            (1, 4, 2, 3),
        ]

    def test_refuses_symbol_measure_not_in_pattern(self, spark, mr_view):
        with pytest.raises(ValueError, match="does not appear in PATTERN"):
            sqlext.sql(
                spark,
                """SELECT user_id, f FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   MEASURES FIRST(Z.ts) AS f
                   ONE ROW PER MATCH
                   PATTERN (V P)
                   DEFINE V AS event_type = 'view',
                          P AS event_type = 'purchase')""",
            )
        # per-symbol column still schema-validated
        with pytest.raises(ValueError, match="not a column"):
            sqlext.sql(
                spark,
                """SELECT user_id, f FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   MEASURES FIRST(V.nope) AS f
                   ONE ROW PER MATCH
                   PATTERN (V P)
                   DEFINE V AS event_type = 'view',
                          P AS event_type = 'purchase')""",
            )

    def test_per_symbol_composes_with_overlap_skip(self, spark, mr_view):
        # SKIP TO NEXT ROW x per-symbol: user 1 'VCCP' has three
        # overlapping (V|C){1,3}P matches (starting at V, C, C);
        # COUNT(C.*) counts the C rows inside each span
        got = sqlext.sql(
            spark,
            """SELECT user_id, match_no, n_c FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          COUNT(C.*) AS n_c
                 ONE ROW PER MATCH
                 AFTER MATCH SKIP TO NEXT ROW
                 PATTERN ((V | C){1,3} P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id, match_no""",
        ).filter("user_id = 1").collect()
        assert [tuple(r) for r in got] == [(1, 1, 2), (1, 2, 2), (1, 3, 1)]

    def test_prev_next_navigation_in_define(self, spark):
        # physical-row navigation: D/U classify against the PREVIOUS
        # row's value (first row NULL -> unclassified '-'), and an
        # E symbol reads the NEXT row (last row NULL -> '-')
        spark.createDataFrame(
            [
                (7, 1, _ts("2024-01-01T10:00"), "x", 10.0),
                (7, 2, _ts("2024-01-01T10:01"), "x", 8.0),
                (7, 3, _ts("2024-01-01T10:02"), "x", 5.0),
                (7, 4, _ts("2024-01-01T10:03"), "x", 6.0),
                (7, 5, _ts("2024-01-01T10:04"), "x", 9.0),
            ],
            "user_id int, event_id int, ts timestamp_ntz, "
            "event_type string, value double",
        ).createOrReplaceTempView("mr_vshape")
        try:
            got = sqlext.sql(
                spark,
                """SELECT user_id, match_no, n_down, trough
                   FROM mr_vshape
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id
                     ORDER BY ts, event_id
                     MEASURES MATCH_NUMBER() AS match_no,
                              COUNT(D.*) AS n_down,
                              LAST(D.value) AS trough
                     ONE ROW PER MATCH
                     PATTERN (D{2} U{2})
                     DEFINE D AS value < PREV(value),
                            U AS value > PREV(value)
                   )""",
            ).collect()
            # rows classify -DDUU (first row unclassified): one
            # match, trough = 5.0 (the last D row's value)
            assert [tuple(r) for r in got] == [(7, 1, 2, 5.0)]
            # NEXT: N = rows whose next value is higher; last row
            # unclassified -> string -NN fails, -DNN... recompute:
            # values 10,8,5,6,9 -> next-higher at rows 3,4 -> '--NN-'
            got2 = sqlext.sql(
                spark,
                """SELECT user_id, n_matches FROM mr_vshape
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id
                     ORDER BY ts, event_id
                     PATTERN (N{2})
                     DEFINE N AS value < NEXT(value)
                   )""",
            ).collect()
            assert [tuple(r) for r in got2] == [(7, 1)]
        finally:
            spark.catalog.dropTempView("mr_vshape")

    def test_prev_refusals_and_literal_safety(self, spark, mr_view):
        # navigation over an expression is refused, not mis-lowered
        with pytest.raises(ValueError, match="navigation over an exp"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   PATTERN (D P)
                   DEFINE D AS event_id < PREV(event_id + 1),
                          P AS event_type = 'purchase')""",
            )
        # unknown column inside PREV is schema-validated
        with pytest.raises(ValueError, match="not a column"):
            sqlext.sql(
                spark,
                """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   PATTERN (D P)
                   DEFINE D AS PREV(nope) = 1,
                          P AS event_type = 'purchase')""",
            )
        # 'PREV(...)' inside a string literal is data, not navigation
        got = sqlext.sql(
            spark,
            """SELECT user_id, n_matches FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id ORDER BY ts, event_id
                 PATTERN (Z P)
                 DEFINE Z AS event_type = 'PREV(view)',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id""",
        ).collect()
        assert all(r.n_matches == 0 for r in got)  # no such type

    def test_per_symbol_aggregates_final_and_null(self, spark, mr_view):
        # SUM/AVG/MIN/MAX over the symbol's rows: user 1's VCCP match
        # has C event_ids {2,3}; user 3's VP matches have none -> the
        # SQL no-rows contract is NULL for all four
        got = sqlext.sql(
            spark,
            """SELECT user_id, match_no, s_c, a_c, mn_c, mx_c
               FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 MEASURES MATCH_NUMBER() AS match_no,
                          SUM(C.event_id) AS s_c,
                          AVG(C.event_id) AS a_c,
                          MIN(C.event_id) AS mn_c,
                          MAX(C.event_id) AS mx_c
                 ONE ROW PER MATCH
                 PATTERN (V C* P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id, match_no""",
        ).collect()
        assert [tuple(r) for r in got] == [
            (1, 1, 5, 2.5, 2, 3),
            (3, 1, None, None, None, None),
            (3, 2, None, None, None, None),
        ]
        # type preservation: bigint-summed column stays integral
        assert got[0].s_c == 5 and isinstance(got[0].s_c, int)

    def test_per_symbol_aggregates_running_under_all_rows(
        self, spark, mr_view
    ):
        # RUNNING SUM(C.event_id) for user 1's VCCP rows:
        # NULL (no C yet), 2, 5, 5
        got = sqlext.sql(
            spark,
            """SELECT user_id, rn, s_c FROM mr_events
               MATCH_RECOGNIZE (
                 PARTITION BY user_id
                 ORDER BY ts, event_id
                 MEASURES COUNT(*) AS rn, SUM(C.event_id) AS s_c
                 ALL ROWS PER MATCH
                 PATTERN (V C* P)
                 DEFINE V AS event_type = 'view',
                        C AS event_type = 'click',
                        P AS event_type = 'purchase'
               ) ORDER BY user_id, rn""",
        ).filter("user_id = 1").collect()
        assert [tuple(r) for r in got] == [
            (1, 1, None),
            (1, 2, 2),
            (1, 3, 5),
            (1, 4, 5),
        ]

    def test_per_symbol_aggregates_skip_nulls(self, spark):
        # SQL aggregates skip NULL inputs (r11 advisor): one NULL in
        # the aggregated column must not poison SUM's left fold, AVG
        # divides by the NON-NULL count, and an all-NULL scope is
        # NULL like an empty one — while COUNT(C.*) still counts ROWS
        rows = [
            # user 1: V C(v=2) C(v=NULL) C(v=4) P
            (1, 1, "view", 10),
            (1, 2, "click", 2),
            (1, 3, "click", None),
            (1, 4, "click", 4),
            (1, 5, "purchase", 20),
            # user 2: V C(v=NULL) P — the symbol participates but
            # contributes no non-null values
            (2, 6, "view", 10),
            (2, 7, "click", None),
            (2, 8, "purchase", 20),
        ]
        df = spark.createDataFrame(
            rows, "user_id int, event_id int, event_type string, v int"
        )
        df.createOrReplaceTempView("mr_null_events")
        try:
            got = sqlext.sql(
                spark,
                """SELECT user_id, s_c, a_c, mn_c, mx_c, n_c
                   FROM mr_null_events
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id
                     ORDER BY event_id
                     MEASURES SUM(C.v) AS s_c, AVG(C.v) AS a_c,
                              MIN(C.v) AS mn_c, MAX(C.v) AS mx_c,
                              COUNT(C.*) AS n_c
                     ONE ROW PER MATCH
                     PATTERN (V C* P)
                     DEFINE V AS event_type = 'view',
                            C AS event_type = 'click',
                            P AS event_type = 'purchase'
                   ) ORDER BY user_id""",
            ).collect()
        finally:
            spark.catalog.dropTempView("mr_null_events")
        assert [tuple(r) for r in got] == [
            (1, 6, 3.0, 2, 4, 3),  # SUM/AVG over {2,4}; 3 C-ROWS
            (2, None, None, None, None, 1),  # all-NULL scope
        ]

    def test_refuses_aggregate_over_expression(self, spark, mr_view):
        with pytest.raises(ValueError, match="outside the supported"):
            sqlext.sql(
                spark,
                """SELECT user_id, s FROM mr_events MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY ts, event_id
                   MEASURES SUM(C.event_id * 2) AS s
                   ONE ROW PER MATCH
                   PATTERN (V C* P)
                   DEFINE V AS event_type = 'view',
                          C AS event_type = 'click',
                          P AS event_type = 'purchase')""",
            )

    def test_per_symbol_counts_partition_the_match(self, spark):
        # invariant: every matched row carries exactly one pattern
        # symbol, so COUNT(*) == sum of per-symbol COUNTs, per match
        # — checked over the full sf0.001 events fixture
        from streamz_postgres_spark.catalog import load_table
        from tests.conftest import SF_DIR

        load_table(spark, SF_DIR, "events").createOrReplaceTempView(
            "mr_inv_events"
        )
        try:
            rows = sqlext.sql(
                spark,
                """SELECT user_id, n_rows, n_v, n_c, n_p
                   FROM mr_inv_events
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id
                     ORDER BY ts, event_id
                     MEASURES COUNT(*) AS n_rows,
                              COUNT(V.*) AS n_v,
                              COUNT(C.*) AS n_c,
                              COUNT(P.*) AS n_p
                     ONE ROW PER MATCH
                     PATTERN (V C{0,2} P)
                     DEFINE V AS event_type = 'view',
                            C AS event_type = 'click',
                            P AS event_type = 'purchase'
                   )""",
            ).collect()
            assert rows  # non-vacuous
            for r in rows:
                assert r.n_rows == r.n_v + r.n_c + r.n_p
                assert r.n_v == 1 and r.n_p == 1  # unquantified symbols
                assert 0 <= r.n_c <= 2  # the {0,2} bound, attributed
        finally:
            spark.catalog.dropTempView("mr_inv_events")

    def test_round11_constructs_compose(self, spark):
        # kitchen sink: PERMUTE inside a quantified group, PREV in
        # DEFINE, per-symbol aggregate + positional measures, under
        # the overlapping skip mode — every round-11 construct in
        # one statement, value-pinned by hand
        spark.createDataFrame(
            [
                # values: 5, 3(D), 9(U), 2(D), 7(U)
                (1, 1, _ts("2024-01-01T10:00"), 5.0),
                (1, 2, _ts("2024-01-01T10:01"), 3.0),
                (1, 3, _ts("2024-01-01T10:02"), 9.0),
                (1, 4, _ts("2024-01-01T10:03"), 2.0),
                (1, 5, _ts("2024-01-01T10:04"), 7.0),
            ],
            "user_id int, event_id int, ts timestamp_ntz, value double",
        ).createOrReplaceTempView("mr_sink")
        try:
            got = sqlext.sql(
                spark,
                """SELECT user_id, match_no, n_rows, n_d, mx_u
                   FROM mr_sink
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id
                     ORDER BY ts, event_id
                     MEASURES MATCH_NUMBER() AS match_no,
                              COUNT(*) AS n_rows,
                              COUNT(D.*) AS n_d,
                              MAX(U.value) AS mx_u
                     ONE ROW PER MATCH
                     AFTER MATCH SKIP TO NEXT ROW
                     PATTERN ((PERMUTE(D, U)){1,2})
                     DEFINE D AS value < PREV(value),
                            U AS value > PREV(value)
                   ) ORDER BY user_id, match_no""",
            ).collect()
            # symbol string: -DUDU. Overlapping (DU|UD){1,2} greedy:
            # start 2: DUDU (4 rows, 2 D, max U value 9.0? U rows are
            # 9 and 7 -> 9.0); start 3: UD (U=9, D=2 -> mx 9.0);
            # start 4: DU (D=2, U=7 -> 7.0); start 5: U alone no.
            assert [tuple(r) for r in got] == [
                (1, 1, 4, 2, 9.0),
                (1, 2, 2, 1, 9.0),
                (1, 3, 2, 1, 7.0),
            ]
        finally:
            spark.catalog.dropTempView("mr_sink")

    def test_prev_with_explicit_offset(self, spark):
        # PREV(col, 2): rows classify against the value TWO rows
        # back; first two rows of the partition are unclassified
        spark.createDataFrame(
            [
                # values: 1, 9, 5(T: 5>1), 2, 8(T: 8>5), 1, 9(T: 9>8)
                (3, 1, _ts("2024-01-01T10:00"), 1.0),
                (3, 2, _ts("2024-01-01T10:01"), 9.0),
                (3, 3, _ts("2024-01-01T10:02"), 5.0),
                (3, 4, _ts("2024-01-01T10:03"), 2.0),
                (3, 5, _ts("2024-01-01T10:04"), 8.0),
                (3, 6, _ts("2024-01-01T10:05"), 1.0),
                (3, 7, _ts("2024-01-01T10:06"), 9.0),
            ],
            "user_id int, event_id int, ts timestamp_ntz, value double",
        ).createOrReplaceTempView("mr_off2")
        try:
            got = sqlext.sql(
                spark,
                """SELECT user_id, seq_len, n_matches FROM mr_off2
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id
                     ORDER BY ts, event_id
                     PATTERN (T)
                     DEFINE T AS value > PREV(value, 2)
                   )""",
            ).collect()
            # string --T-T-T (rows 3,5,7 exceed value two back),
            # wait: row4 (2 > 9?) no; row6 (1 > 2?) no -> 3 matches
            assert [tuple(r) for r in got] == [(3, 7, 3)]
        finally:
            spark.catalog.dropTempView("mr_off2")


# -- round-12 review fixes: Postgres/engine-parity holes in the -----------
# -- older lowerings (DISTINCT ON / QUALIFY / SAMPLE BY / ASOF / case) ----


class TestRound12ReviewFixes:
    def test_distinct_on_star_hides_plumbing_and_keeps_order(
        self, spark
    ):
        # 'SELECT DISTINCT ON (k) *' must return exactly the source
        # columns (the row-number plumbing is not a result column —
        # and a fixed '__rn' alias used to collide with tables that
        # already have one), and the written ORDER BY is the result
        # order, as Postgres guarantees
        rows = [(1, 3, "a", 9), (1, 1, "b", 9), (2, 2, "c", 9)]
        spark.createDataFrame(
            rows, "k int, ts int, tag string, __rn int"
        ).createOrReplaceTempView("don_star")
        try:
            got = sqlext.sql(
                spark,
                "SELECT DISTINCT ON (k) * FROM don_star "
                "ORDER BY k DESC, ts DESC",
            )
            assert got.columns == ["k", "ts", "tag", "__rn"]
            # row order IS the written ORDER BY (k DESC)
            assert [tuple(r) for r in got.collect()] == [
                (2, 2, "c", 9), (1, 3, "a", 9),
            ]
            # mixed star projections suppress the plumbing too
            got2 = sqlext.sql(
                spark,
                "SELECT tag, * FROM don_star "
                "QUALIFY row_number() OVER (PARTITION BY k "
                "ORDER BY ts) = 1",
            )
            assert got2.columns == ["tag", "k", "ts", "tag", "__rn"]
        finally:
            spark.catalog.dropTempView("don_star")

    def test_sample_by_floors_pre_epoch_timestamps(self, spark):
        # DIV truncates toward zero: a 1969 row used to land in the
        # bucket STARTING AFTER it; pmod alignment floors both signs
        rows = [
            (_ts("1969-12-31T23:59:30"), 1.0),
            (_ts("1970-01-01T00:00:30"), 2.0),
        ]
        spark.createDataFrame(
            rows, "ts timestamp_ntz, v double"
        ).createOrReplaceTempView("pre_epoch")
        try:
            got = sqlext.sql(
                spark,
                "SELECT count(*) AS n FROM pre_epoch SAMPLE BY 1m",
            ).collect()
            # two DISTINCT buckets — and the pre-epoch row's bucket
            # STARTS BEFORE it (23:59), not after (00:00)
            assert sorted(int(r.n) for r in got) == [1, 1]
            assert {str(r.sample_ts) for r in got} == {
                "1969-12-31 23:59:00",
                "1970-01-01 00:00:00",
            }
        finally:
            spark.catalog.dropTempView("pre_epoch")

    def test_asof_literal_and_renamed_right_key(self, spark, views):
        # (a) a string literal containing '<alias>.' survives the
        # alias-qualifier strip; (b) with DIFFERENT key names the
        # right-alias key reference resolves to the renamed column
        got = sqlext.sql(
            spark,
            "SELECT l.k, r.rk AS right_k, 'l.note' AS tag, r.v "
            "FROM sqlext_left l ASOF JOIN sqlext_right r "
            "ON l.k = r.rk AND l.ts >= r.rts",
        ).collect()
        assert all(r.tag == "l.note" for r in got)
        assert all(r.right_k == r.k for r in got)
        # k=2's 08:00 row has no prior right row -> inner drops it
        assert len(got) == 2

    def test_asof_views_do_not_leak(self, spark, views):
        before = {
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("__asof_")
        }
        sqlext.sql(
            spark,
            "SELECT l.k, r.v FROM sqlext_left l ASOF JOIN "
            "sqlext_right r ON l.k = r.rk AND l.ts >= r.rts",
        ).collect()
        after = {
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("__asof_")
        }
        assert after == before == set()

    def test_case_insensitive_identifier_validation(self, spark):
        # Spark resolves identifiers case-insensitively by default;
        # the schema-validation refusals must too (EXCLUDE/REPLACE
        # targets, MEASURES and PREV/NEXT columns, DISTINCT ON keys)
        spark.createDataFrame(
            [(1, 2, "view", 5.0)],
            "user_id int, Payload int, event_type string, value double",
        ).createOrReplaceTempView("case_t")
        try:
            assert sqlext.sql(
                spark, "SELECT * EXCLUDE (payload) FROM case_t"
            ).columns == ["user_id", "event_type", "value"]
            assert "Payload" in sqlext.sql(
                spark,
                "SELECT * REPLACE (PAYLOAD * 2 AS PAYLOAD) "
                "FROM case_t",
            ).columns or "PAYLOAD" in [
                c.upper()
                for c in sqlext.sql(
                    spark,
                    "SELECT * REPLACE (PAYLOAD * 2 AS PAYLOAD) "
                    "FROM case_t",
                ).columns
            ]
            got = sqlext.sql(
                spark,
                "SELECT DISTINCT ON (USER_ID) user_id FROM case_t "
                "ORDER BY user_id",
            ).collect()
            assert [tuple(r) for r in got] == [(1,)]
            got2 = sqlext.sql(
                spark,
                """SELECT user_id, lv FROM case_t MATCH_RECOGNIZE (
                   PARTITION BY user_id ORDER BY Payload
                   MEASURES LAST(VALUE) AS lv
                   ONE ROW PER MATCH
                   PATTERN (V)
                   DEFINE V AS event_type = 'view')""",
            ).collect()
            assert [tuple(r) for r in got2] == [(1, 5.0)]
        finally:
            spark.catalog.dropTempView("case_t")

    def test_sum_promotes_sub_bigint_integrals(self, spark):
        # SQL SUM promotes integral inputs: an INT column whose
        # in-match values pass 2^31 must return the BIGINT sum, not
        # ARITHMETIC_OVERFLOW (type-preserving fold, pre-r12)
        rows = [
            (1, 1, "view", 0),
            (1, 2, "click", 2_000_000_000),
            (1, 3, "click", 2_000_000_000),
            (1, 4, "purchase", 0),
        ]
        spark.createDataFrame(
            rows, "user_id int, event_id int, event_type string, qty int"
        ).createOrReplaceTempView("sum_ovf")
        try:
            got = sqlext.sql(
                spark,
                """SELECT user_id, s_c, s_all FROM sum_ovf
                   MATCH_RECOGNIZE (
                     PARTITION BY user_id ORDER BY event_id
                     MEASURES SUM(C.qty) AS s_c, SUM(qty) AS s_all
                     ONE ROW PER MATCH
                     PATTERN (V C* P)
                     DEFINE V AS event_type = 'view',
                            C AS event_type = 'click',
                            P AS event_type = 'purchase')""",
            ).collect()
            assert [tuple(r) for r in got] == [
                (1, 4_000_000_000, 4_000_000_000)
            ]
        finally:
            spark.catalog.dropTempView("sum_ovf")
