"""ClickHouse-dialect shim laws (clickbom_spark/dialect.py): every
supported construct translates to a Spark query that returns EXACTLY
what the hand-written Spark SQL equivalent returns on the corpus; the
unsupported constructs fail fast with pointers, never mistranslate."""

from __future__ import annotations

import pytest

from clickbom_spark.dialect import (
    UnsupportedClickHouseSQL,
    run_clickhouse_sql,
    translate_clickhouse_sql,
)
from tests.conftest import SF_SMOKE

# (clickhouse_sql, equivalent_spark_sql) — executed side by side
PAIRS = [
    (
        "SELECT event_type, countIf(value > 100) AS big, "
        "sumIf(value, value > 100) AS big_sum, uniqExact(user_id) AS u "
        "FROM events GROUP BY event_type ORDER BY event_type",
        "SELECT event_type, count_if(value > 100) AS big, "
        "sum(if(value > 100, value, NULL)) AS big_sum, "
        "count(DISTINCT user_id) AS u "
        "FROM events GROUP BY event_type ORDER BY event_type",
    ),
    (
        "SELECT argMax(event_type, ts) AS last_type, "
        "argMin(event_type, ts) AS first_type, "
        "quantileExact(0.5)(value) AS med FROM events",
        "SELECT max_by(event_type, ts) AS last_type, "
        "min_by(event_type, ts) AS first_type, "
        "percentile(value, 0.5) AS med FROM events",
    ),
    (
        "SELECT toStartOfDay(ts) AS d, count() AS n, "
        "uniqUpTo(3)(user_id) AS u3 "
        "FROM events GROUP BY toStartOfDay(ts) ORDER BY d LIMIT 5",
        "SELECT date_trunc('DAY', ts) AS d, count(*) AS n, "
        "least(count(DISTINCT user_id), 3 + 1) AS u3 "
        "FROM events GROUP BY date_trunc('DAY', ts) ORDER BY d LIMIT 5",
    ),
    (
        "SELECT user_id, multiIf(value < 10, 'low', value < 100, "
        "'mid', 'high') AS band, toYYYYMM(ts) AS ym "
        "FROM events ORDER BY event_id LIMIT 20",
        "SELECT user_id, CASE WHEN value < 10 THEN 'low' WHEN value "
        "< 100 THEN 'mid' ELSE 'high' END AS band, "
        "CAST(date_format(ts, 'yyyyMM') AS INT) AS ym "
        "FROM events ORDER BY event_id LIMIT 20",
    ),
    (
        # PREWHERE merges into WHERE; casts; modulo/intDiv
        "SELECT intDiv(user_id, 10) AS bucket, count() AS n "
        "FROM events PREWHERE event_type = 'click' "
        "WHERE modulo(user_id, 2) = 0 "
        "GROUP BY intDiv(user_id, 10) ORDER BY bucket",
        "SELECT user_id DIV 10 AS bucket, count(*) AS n "
        "FROM events WHERE event_type = 'click' AND user_id % 2 = 0 "
        "GROUP BY user_id DIV 10 ORDER BY bucket",
    ),
    (
        # nested calls + quantiles multi + any/anyLast
        "SELECT quantiles(0.25, 0.75)(toFloat64(value)) AS iqr, "
        "uniq(toString(user_id)) AS approx_u FROM events",
        "SELECT percentile_approx(CAST(value AS DOUBLE), "
        "array(0.25, 0.75)) AS iqr, "
        "approx_count_distinct(CAST(user_id AS STRING)) AS approx_u "
        "FROM events",
    ),
    (
        "SELECT l_returnflag, groupUniqArray(l_linestatus) AS st "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
        "SELECT l_returnflag, collect_set(l_linestatus) AS st "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    ),
    (
        # string functions with swapped-arg position()
        "SELECT doc_id, position(text, 'the') AS p, "
        "lengthUTF8(text) AS n FROM documents ORDER BY doc_id LIMIT 10",
        "SELECT doc_id, locate('the', text) AS p, length(text) AS n "
        "FROM documents ORDER BY doc_id LIMIT 10",
    ),
]


@pytest.mark.parametrize("idx", range(len(PAIRS)))
def test_translated_equals_native(spark, idx):
    ch, native = PAIRS[idx]
    got = run_clickhouse_sql(spark, ch, SF_SMOKE).collect()
    want = spark.sql(native).collect()
    # arrays inside rows: compare as sorted tuples for set-valued aggs
    def canonize(rows):
        out = []
        for r in rows:
            vals = []
            for v in r:
                vals.append(tuple(sorted(v)) if isinstance(v, list) else v)
            out.append(tuple(vals))
        return out

    assert canonize(got) == canonize(want)


def test_unsupported_constructs_fail_fast():
    for sql, hint in [
        # FINAL is translatable only with a registered engine key
        ("SELECT * FROM sometable FINAL", "register_final_keys"),
        # SAMPLE is translatable only with a registered sampling key,
        # and the integer row-target form needs table statistics
        ("SELECT * FROM nation SAMPLE 0.1", "register_sampling_key"),
        ("SELECT * FROM events SAMPLE 10000", "row target"),
        ("SELECT topK(5)(event_type) FROM events", "heavy-hitters"),
        # alias-less ARRAY JOIN over an EXPRESSION has no source
        # column to replace
        ("SELECT a FROM t ARRAY JOIN arrayConcat(a, b)", "plain column"),
        ("SELECT x FROM t PREWHERE", "no condition"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=hint):
            translate_clickhouse_sql(sql)


def test_clause_scan_is_token_aware():
    """Clause keywords inside string literals or as substrings of
    longer identifiers must not trigger the clause machinery."""
    out = translate_clickhouse_sql(
        "SELECT 'SAMPLE 0.1' AS lit, finally AS f, "
        "'x PREWHERE y' AS p FROM events"
    )
    assert "'SAMPLE 0.1'" in out and "finally" in out
    assert "'x PREWHERE y'" in out


def test_prewhere_merge_parenthesizes_both_sides():
    """An OR in either condition must not re-bind across the AND."""
    out = translate_clickhouse_sql(
        "SELECT x FROM t PREWHERE a = 1 OR b = 2 WHERE c = 3 OR d = 4"
    )
    assert "WHERE (a = 1 OR b = 2) AND (c = 3 OR d = 4)" in out


def test_final_requires_registered_key_and_uses_it(spark):
    """FROM events FINAL == the engine's keep-latest compaction on the
    registered (user_id, event_type) key, max (ts, event_id) version —
    the same semantics as q_keep_latest_event."""
    got = run_clickhouse_sql(
        spark,
        "SELECT user_id, event_type, event_id, ts, value "
        "FROM events FINAL ORDER BY user_id, event_type",
        SF_SMOKE,
    ).collect()
    want = spark.sql(
        """
        SELECT user_id, event_type, event_id, ts, value FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        WHERE rn = 1 ORDER BY user_id, event_type
        """
    ).collect()
    assert got == want


def test_limit_n_by_is_first_n_per_group_in_order(spark):
    got = run_clickhouse_sql(
        spark,
        "SELECT event_type, event_id, value FROM events "
        "ORDER BY value DESC, event_id LIMIT 3 BY event_type",
        SF_SMOKE,
    )
    assert got.columns == ["event_type", "event_id", "value"]
    want = spark.sql(
        """
        SELECT event_type, event_id, value FROM (
          SELECT event_type, event_id, value, row_number() OVER (
            PARTITION BY event_type ORDER BY value DESC, event_id)
            AS rn FROM events) WHERE rn <= 3
        """
    ).collect()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want))


def test_limit_n_by_with_trailing_limit(spark):
    got = run_clickhouse_sql(
        spark,
        "SELECT event_type, event_id FROM events "
        "ORDER BY event_id LIMIT 2 BY event_type LIMIT 5",
        SF_SMOKE,
    ).collect()
    assert len(got) == 5
    # overall order preserved after the per-group cut
    assert [r.event_id for r in got] == sorted(r.event_id for r in got)


def test_array_join_is_lateral_view_explode(spark):
    got = run_clickhouse_sql(
        spark,
        "SELECT doc_id, tok FROM documents "
        "ARRAY JOIN splitByChar(' ', text) AS tok "
        "WHERE doc_id < 3 ORDER BY doc_id, tok",
        SF_SMOKE,
    ).collect()
    want = spark.sql(
        "SELECT doc_id, tok FROM documents "
        "LATERAL VIEW explode(split(text, '\\\\ ')) v AS tok "
        "WHERE doc_id < 3 ORDER BY doc_id, tok"
    ).collect()
    assert got == want and len(got) > 0


def test_to_start_of_week_is_sunday_start(spark):
    """ClickHouse toStartOfWeek default mode 0 = Sunday-start weeks;
    Spark date_trunc('WEEK') alone would give Monday."""
    rows = run_clickhouse_sql(
        spark,
        "SELECT toStartOfWeek(ts) AS w, count() AS n FROM events "
        "GROUP BY toStartOfWeek(ts) ORDER BY w",
        SF_SMOKE,
    ).collect()
    assert rows and all(r.w.weekday() == 6 for r in rows)  # 6 = Sunday


def test_translation_is_quote_safe():
    """Function-like text inside string literals must NOT translate."""
    sql = "SELECT 'uniq(x) and countIf(y)' AS s, uniq(user_id) AS u FROM events"
    out = translate_clickhouse_sql(sql)
    assert "'uniq(x) and countIf(y)'" in out
    assert "approx_count_distinct(user_id)" in out


def test_unknown_functions_pass_through():
    out = translate_clickhouse_sql(
        "SELECT abs(value), concat(event_type, '!') FROM events"
    )
    assert "abs(value)" in out and "concat(event_type, '!')" in out


def test_array_higher_order_functions_swap_argument_order(spark):
    """ClickHouse puts the lambda first, Spark the array first; the
    lambda syntax itself is shared."""
    ch = (
        "SELECT arrayMap(x -> x * 2, arrayFilter(x -> x > 1, "
        "array(1, 2, 3))) AS a, "
        "arraySum(array(1.5, 2.5)) AS s, "
        "arrayCount(x -> x > 1, array(1, 2, 3)) AS c, "
        "arrayExists(x -> x = 3, array(1, 2, 3)) AS e, "
        "notEmpty(array(1)) AS ne"
    )
    native = (
        "SELECT transform(filter(array(1, 2, 3), x -> x > 1), "
        "x -> x * 2) AS a, "
        "aggregate(array(1.5, 2.5), CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + x) AS s, "
        "size(filter(array(1, 2, 3), x -> x > 1)) AS c, "
        "exists(array(1, 2, 3), x -> x = 3) AS e, "
        "(size(array(1)) > 0) AS ne"
    )
    got = run_clickhouse_sql(spark, ch, SF_SMOKE).collect()
    want = spark.sql(native).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_url_function_family(spark):
    """ClickHouse URL getters map to Spark's JVM-side parse_url (plus
    regex derivations for the components parse_url lacks); ClickHouse
    semantics pinned on literal URLs, including the ''-on-missing
    contract for extractURLParameter."""
    ch = (
        "SELECT protocol(u) AS proto, domain(u) AS host, "
        "domainWithoutWWW(u) AS nwww, topLevelDomain(u) AS tld, "
        "path(u) AS p, pathFull(u) AS pf, queryString(u) AS qs, "
        "fragment(u) AS fr, extractURLParameter(u, 'b') AS b, "
        "extractURLParameter(u, 'zz') AS zz, "
        "cutQueryString(u) AS cq, cutFragment(u) AS cf, "
        "cutQueryStringAndFragment(u) AS cqf "
        "FROM (SELECT 'https://www.sub.example.com/a/b?x=1&b=2#frag' "
        "AS u)"
    )
    row = run_clickhouse_sql(spark, ch, SF_SMOKE).collect()[0]
    assert row["proto"] == "https"
    assert row["host"] == "www.sub.example.com"
    assert row["nwww"] == "sub.example.com"
    assert row["tld"] == "com"
    assert row["p"] == "/a/b"
    assert row["pf"] == "/a/b?x=1&b=2"
    assert row["qs"] == "x=1&b=2"
    assert row["fr"] == "frag"
    assert row["b"] == "2"
    assert row["zz"] == ""  # ClickHouse '' (not NULL) on missing param
    assert row["cq"] == "https://www.sub.example.com/a/b#frag"
    assert row["cf"] == "https://www.sub.example.com/a/b?x=1&b=2"
    assert row["cqf"] == "https://www.sub.example.com/a/b"


def test_tostartofweek_nondefault_mode_fails_fast():
    """Only mode 0 (Sunday-start) has a tested translation; Monday-
    start modes must raise, not silently shift by a day."""
    import pytest

    from clickbom_spark.dialect import (
        UnsupportedClickHouseSQL,
        translate_clickhouse_sql,
    )

    out = translate_clickhouse_sql(
        "SELECT toStartOfWeek(ts, 0) FROM events")
    assert "date_sub" in out
    with pytest.raises(UnsupportedClickHouseSQL, match="toStartOfWeek"):
        translate_clickhouse_sql("SELECT toStartOfWeek(ts, 1) FROM events")
    with pytest.raises(UnsupportedClickHouseSQL, match="toStartOfWeek"):
        translate_clickhouse_sql("SELECT toStartOfWeek(ts, 3) FROM events")


def test_datetime_arithmetic_family(spark):
    ch = (
        "SELECT addDays(toDate('2024-03-01'), 3) AS d3, "
        "subtractHours(toDateTime('2024-03-01 10:00:00'), 2) AS h2, "
        "dateDiff('day', toDate('2024-03-01'), toDate('2024-03-11')) "
        "AS dd, "
        "toDayOfWeek(toDate('2024-03-03')) AS dow_sun, "
        "toDayOfWeek(toDate('2024-03-04')) AS dow_mon, "
        "toUnixTimestamp(toDateTime('1970-01-02 00:00:00')) AS ut, "
        "toQuarter(toDate('2024-08-14')) AS q"
    )
    row = run_clickhouse_sql(spark, ch, SF_SMOKE).collect()[0]
    assert str(row["d3"]) == "2024-03-04"
    assert str(row["h2"]).startswith("2024-03-01 08:00:00")
    assert row["dd"] == 10
    # ClickHouse mode-0 toDayOfWeek: Monday=1 .. Sunday=7
    assert row["dow_sun"] == 7 and row["dow_mon"] == 1
    assert row["ut"] == 86400
    assert row["q"] == 3


def test_string_search_family(spark):
    ch = (
        "SELECT startsWith('hello', 'he') AS sw, "
        "endsWith('hello', 'lo') AS ew, "
        "trimBoth('  x  ') AS tb, "
        "replaceAll('a-b-c', '-', '+') AS ra, "
        "replaceOne('a-b-c', '-', '+') AS ro, "
        "replaceOne('abc', 'z', '+') AS ro_miss, "
        "extract('v=42;', '(\\\\d+)') AS ex, "
        "match('abc123', '^[a-z]+[0-9]+$') AS m, "
        "multiSearchAny('haystack', 'zz', 'stack') AS msa, "
        "concatWithSeparator('-', 'a', 'b', 'c') AS cws, "
        "leftPad('7', 3, '0') AS lp"
    )
    row = run_clickhouse_sql(spark, ch, SF_SMOKE).collect()[0]
    assert row["sw"] is True and row["ew"] is True
    assert row["tb"] == "x"
    assert row["ra"] == "a+b+c"
    assert row["ro"] == "a+b-c"
    assert row["ro_miss"] == "abc"
    assert row["ex"] == "42"
    assert row["m"] is True
    assert row["msa"] is True
    assert row["cws"] == "a-b-c"
    assert row["lp"] == "007"


def test_array_extras_and_scalars(spark):
    ch = (
        "SELECT arrayStringConcat(array('a', 'b'), ',') AS asc_, "
        "arraySlice(array(1, 2, 3, 4), 2, 2) AS sl, "
        "arrayReverse(array(1, 2, 3)) AS rv, "
        "arrayUniq(array(1, 1, 2)) AS au, "
        "arrayFlatten(array(array(1, 2), array(3))) AS fl, "
        "range(4) AS rg, "
        "if(2 > 1, 'y', 'n') AS iff, "
        "ifNull(NULL, 'd') AS inl, "
        "assumeNotNull(5) AS ann, "
        "isNull(NULL) AS isn, "
        "cityHash64('x') = cityHash64('x') AS stable"
    )
    row = run_clickhouse_sql(spark, ch, SF_SMOKE).collect()[0]
    assert row["asc_"] == "a,b"
    assert row["sl"] == [2, 3]
    assert row["rv"] == [3, 2, 1]
    assert row["au"] == 2
    assert row["fl"] == [1, 2, 3]
    assert row["rg"] == [0, 1, 2, 3]
    assert row["iff"] == "y"
    assert row["inl"] == "d"
    assert row["ann"] == 5
    assert row["isn"] is True
    assert row["stable"] is True


def test_with_totals_becomes_grouping_sets(spark):
    """GROUP BY ... WITH TOTALS lands the totals row in the same
    result set with NULL keys (GROUPING SETS ((cols), ()))."""
    ch = ("SELECT event_type, count() AS n FROM events "
          "GROUP BY event_type WITH TOTALS")
    rows = run_clickhouse_sql(spark, ch, SF_SMOKE).collect()
    per_type = {r["event_type"]: r["n"] for r in rows
                if r["event_type"] is not None}
    totals = [r["n"] for r in rows if r["event_type"] is None]
    assert len(totals) == 1
    assert totals[0] == sum(per_type.values())
    assert len(per_type) >= 2


def test_review_pinned_edge_cases(spark):
    """Regression pins from the round-9 review: absent-needle
    replaceOne, SQL EXTRACT pass-through, whole-match extract, empty
    and stepped range, NULL-propagating greatest/least, array-form
    multiSearchAny, parenthesized assumeNotNull, boundary-crossing
    dateDiff."""
    ch = (
        "SELECT replaceOne('abc', 'xy', '+') AS ro_miss2, "
        "extract('abc123', '[0-9]+') AS ex_whole, "
        "range(0) AS r0, "
        "range(2, 2) AS r22, "
        "range(2, 10, 3) AS rstep, "
        "greatest(NULL, 5) AS g_null, "
        "least(1, NULL) AS l_null, "
        "multiSearchAny('haystack', ['zz', 'stack']) AS msa_arr, "
        "assumeNotNull(1 + 1) * 10 AS ann_paren, "
        "dateDiff('day', toDateTime('2024-03-01 23:00:00'), "
        "toDateTime('2024-03-02 01:00:00')) AS dd_cross, "
        "dateDiff('month', toDate('2024-01-31'), toDate('2024-02-01')) "
        "AS dd_month, "
        "EXTRACT(YEAR FROM toDate('2024-03-01')) AS ex_sql"
    )
    row = run_clickhouse_sql(spark, ch, SF_SMOKE).collect()[0]
    assert row["ro_miss2"] == "abc"
    assert row["ex_whole"] == "123"
    assert row["r0"] == []
    assert row["r22"] == []
    assert row["rstep"] == [2, 5, 8]
    assert row["g_null"] is None
    assert row["l_null"] is None
    assert row["msa_arr"] is True
    assert row["ann_paren"] == 20
    assert row["dd_cross"] == 1  # one midnight crossed
    assert row["dd_month"] == 1  # one month boundary crossed
    assert row["ex_sql"] == 2024


def test_with_totals_does_not_misfire_on_totals_cte(spark):
    """A CTE literally named `totals` must not trigger the WITH TOTALS
    clause rewrite."""
    ch = ("WITH totals AS (SELECT count() AS n FROM events) "
          "SELECT n FROM totals")
    rows = run_clickhouse_sql(spark, ch, SF_SMOKE).collect()
    assert len(rows) == 1 and rows[0]["n"] > 0


def test_optional_arg_fail_fast(spark):
    import pytest

    from clickbom_spark.dialect import (
        UnsupportedClickHouseSQL,
        translate_clickhouse_sql,
    )

    with pytest.raises(UnsupportedClickHouseSQL, match="toDayOfWeek"):
        translate_clickhouse_sql("SELECT toDayOfWeek(ts, 1) FROM t")
    with pytest.raises(UnsupportedClickHouseSQL,
                       match="fromUnixTimestamp"):
        translate_clickhouse_sql(
            "SELECT fromUnixTimestamp(x, '%Y') FROM t")
    with pytest.raises(UnsupportedClickHouseSQL, match="dateDiff"):
        translate_clickhouse_sql(
            "SELECT dateDiff('week', a, b) FROM t")


def test_array_literals_and_indexing(spark):
    """ClickHouse [..] array literals translate to array(...) anywhere
    (nested included); the 1-based a[n] subscript fails fast toward
    arrayElement, whose element_at translation is 1-based like CH."""
    import pytest

    from clickbom_spark.dialect import (
        UnsupportedClickHouseSQL,
        translate_clickhouse_sql,
    )

    ch = (
        "SELECT ['a', 'b'] AS lit, "
        "[[1], [2, 3]] AS nested, "
        "has(['x', 'y'], 'y') AS h, "
        "arrayElement(['p', 'q'], 1) AS first, "
        "arrayStringConcat(['u', 'v'], '-') AS joined"
    )
    row = run_clickhouse_sql(spark, ch, SF_SMOKE).collect()[0]
    assert row["lit"] == ["a", "b"]
    assert row["nested"] == [[1], [2, 3]]
    assert row["h"] is True
    assert row["first"] == "p"  # 1-based, matching ClickHouse
    assert row["joined"] == "u-v"
    with pytest.raises(UnsupportedClickHouseSQL, match="1-based"):
        translate_clickhouse_sql("SELECT arr[1] FROM t")


def test_sample_is_deterministic_hash_threshold(spark):
    """SAMPLE k == the q_hash_sample membership predicate on the
    registered SAMPLE BY key: reproducible, disjoint under OFFSET,
    and the union of complementary slices is the whole table."""
    n_all = run_clickhouse_sql(
        spark, "SELECT count() AS n FROM documents", SF_SMOKE
    ).collect()[0]["n"]
    a = run_clickhouse_sql(
        spark, "SELECT count() AS n FROM documents SAMPLE 0.5", SF_SMOKE
    ).collect()[0]["n"]
    b = run_clickhouse_sql(
        spark,
        "SELECT count() AS n FROM documents SAMPLE 0.5 OFFSET 0.5",
        SF_SMOKE,
    ).collect()[0]["n"]
    assert a + b == n_all and 0 < a < n_all
    # deterministic: same query, same membership
    a2 = run_clickhouse_sql(
        spark, "SELECT count() AS n FROM documents SAMPLE 0.5", SF_SMOKE
    ).collect()[0]["n"]
    assert a2 == a
    # matches the hand-written hash-threshold predicate exactly
    want = spark.sql(
        "SELECT count(*) AS n FROM documents WHERE "
        "conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10)"
        " / 4294967296.0 < 0.5"
    ).collect()[0]["n"]
    assert a == want


def test_sample_key_registry(spark):
    from clickbom_spark.dialect import SAMPLING_KEYS, register_sampling_key

    assert "nation" not in SAMPLING_KEYS
    register_sampling_key("nation", "n_nationkey")
    try:
        n = run_clickhouse_sql(
            spark, "SELECT count() AS n FROM nation SAMPLE 0.9", SF_SMOKE
        ).collect()[0]["n"]
        assert 0 < n <= 25
    finally:
        SAMPLING_KEYS.pop("nation", None)


def test_multi_array_join_zips_elementwise(spark):
    """ARRAY JOIN a AS x, b AS y is an element-wise zip (ClickHouse
    semantics), compiled to ONE inline(transform(...)) generator —
    never a positional cross join."""
    spark.sql(
        "SELECT 1 AS id, array(10, 20) AS a, array('x', 'y') AS b "
        "UNION ALL SELECT 2, array(30), array('z')"
    ).createOrReplaceTempView("zt")
    out = translate_clickhouse_sql(
        "SELECT id, va, vb FROM zt ARRAY JOIN a AS va, b AS vb "
        "ORDER BY id, va"
    )
    assert "inline(transform(" in out and out.count("LATERAL VIEW") == 1
    got = [tuple(r) for r in spark.sql(out).collect()]
    assert got == [(1, 10, "x"), (1, 20, "y"), (2, 30, "z")]


def test_aliasless_array_join_replaces_source_column(spark):
    """ARRAY JOIN arr (no alias) replaces the array column with its
    element, usable in SELECT/WHERE/GROUP BY under the original name."""
    spark.sql(
        "SELECT 1 AS id, array(10, 20) AS a, array('x', 'y') AS b "
        "UNION ALL SELECT 2, array(30), array('z')"
    ).createOrReplaceTempView("zt")
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT id, a FROM zt ARRAY JOIN a ORDER BY id, a"
            )
        ).collect()
    ]
    assert got == [(1, 10), (1, 20), (2, 30)]
    # mixed alias-less + aliased in one clause
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT id, a, vb FROM zt ARRAY JOIN a, b AS vb "
                "ORDER BY id, a"
            )
        ).collect()
    ]
    assert got == [(1, 10, "x"), (1, 20, "y"), (2, 30, "z")]
    # exploded value flows through WHERE and GROUP BY
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT id, count() AS n FROM zt ARRAY JOIN a "
                "WHERE a > 10 GROUP BY id ORDER BY id"
            )
        ).collect()
    ]
    assert got == [(1, 1), (2, 1)]


def test_left_array_join_aliasless_keeps_empty_rows(spark):
    spark.sql(
        "SELECT 1 AS id, array() AS e UNION ALL SELECT 2, array(5)"
    ).createOrReplaceTempView("et")
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT id, e FROM et LEFT ARRAY JOIN e ORDER BY id"
            )
        ).collect()
    ]
    assert got == [(1, None), (2, 5)]


def test_asof_join_latest_and_earliest_forms(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, 10, 'p1'), (1, 25, 'p2'), (2, 5, 'p3')"
        " AS t(k, ts, tag)"
    ).createOrReplaceTempView("asof_l")
    spark.sql(
        "SELECT * FROM VALUES (1, 10, 100), (1, 20, 200), (2, 30, 300)"
        " AS t(k, ts, v)"
    ).createOrReplaceTempView("asof_r")
    # >= : latest r.ts <= l.ts (inclusive)
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT l.tag, r.v FROM asof_l AS l "
                "ASOF LEFT JOIN asof_r AS r "
                "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.tag"
            )
        ).collect()
    ]
    assert got == [("p1", 100), ("p2", 200), ("p3", None)]
    # > : strictly-earlier match only
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT l.tag, r.v FROM asof_l AS l "
                "ASOF LEFT JOIN asof_r AS r "
                "ON l.k = r.k AND l.ts > r.ts ORDER BY l.tag"
            )
        ).collect()
    ]
    assert got == [("p1", None), ("p2", 200), ("p3", None)]
    # <= : EARLIEST r.ts >= l.ts; inner join drops unmatched lefts
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT l.tag, r.v FROM asof_l AS l "
                "ASOF JOIN asof_r AS r "
                "ON l.k = r.k AND l.ts <= r.ts ORDER BY l.tag"
            )
        ).collect()
    ]
    assert got == [("p1", 100), ("p3", 300)]
    # flipped operand order normalizes (r.ts <= l.ts == l.ts >= r.ts)
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT l.tag, r.v FROM asof_l AS l "
                "ASOF JOIN asof_r AS r "
                "ON l.k = r.k AND r.ts <= l.ts ORDER BY l.tag"
            )
        ).collect()
    ]
    assert got == [("p1", 100), ("p2", 200)]


def test_asof_join_fail_fasts():
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    for sql, frag in [
        ("SELECT 1 FROM a ASOF JOIN b USING (k, ts)", "USING"),
        ("SELECT 1 FROM a ASOF JOIN b ON a.k = b.k", "inequality"),
        (
            "SELECT 1 FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t "
            "AND a.u >= b.u",
            "exactly one inequality",
        ),
        (
            "SELECT 1 FROM a ASOF JOIN (SELECT 1) ON a.t >= b.t",
            "alias",
        ),
        (
            "SELECT 1 FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t + 1",
            "plain b.<column>",
        ),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=frag):
            translate_clickhouse_sql(sql)
    # a column merely NAMED asof is not a join clause
    out = translate_clickhouse_sql("SELECT asof, x FROM t ORDER BY asof")
    assert "lead(" not in out


def test_retention_compiles_to_gated_max(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, 'v'), (1, 'c'), (2, 'c'), (3, 'v')"
        " AS t(u, e)"
    ).createOrReplaceTempView("ret_t")
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT u, retention(e = 'v', e = 'c') AS r "
                "FROM ret_t GROUP BY u ORDER BY u"
            )
        ).collect()
    ]
    # user 2 never saw the FIRST condition, so r[1] is gated to 0
    assert got == [(1, [1, 1]), (2, [0, 0]), (3, [1, 0])]


def test_sample_on_aliased_table_uses_table_key(spark):
    """Review fix: the SAMPLE BY key is table DDL — it must resolve
    under the TABLE name even when the source is aliased."""
    for q in (
        "SELECT count() AS n FROM documents AS d SAMPLE 0.3",
        "SELECT count() AS n FROM documents d SAMPLE 0.3",
    ):
        out = translate_clickhouse_sql(q)
        assert "md5(cast(doc_id" in out.lower(), out


def test_multi_array_join_unequal_lengths_null_pad_both_ways(spark):
    """Review fix: the zip is sized to the LONGEST array (a longer
    later array must not be truncated) and pads with NULLs via
    try_element_at (no ANSI element_at error on the shorter one)."""
    spark.sql(
        "SELECT 1 AS id, array(10, 20, 30) AS a, array('x') AS b"
    ).createOrReplaceTempView("zt_uneq")
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT va, vb FROM zt_uneq ARRAY JOIN a AS va, b AS vb"
            )
        ).collect()
    ]
    assert got == [(10, "x"), (20, None), (30, None)]
    # longer LATER array: rows must not be truncated to len(first)
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT va, vb FROM zt_uneq ARRAY JOIN b AS vb, a AS va"
            )
        ).collect()
    ]
    assert got == [(10, "x"), (20, None), (30, None)]


def test_asof_truncated_input_fails_clearly():
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    for sql in (
        "SELECT 1 FROM a ASOF JOIN b",
        "SELECT 1 FROM a ASOF JOIN b AS",
        "SELECT 1 FROM a ASOF JOIN",
        "SELECT 1 FROM a ASOF LEFT JOIN b ON",
    ):
        with pytest.raises(UnsupportedClickHouseSQL):
            translate_clickhouse_sql(sql)


def test_stat_moment_family(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, 2.0, 4.0), (1, 4.0, 8.0), "
        "(1, 6.0, 12.0) AS t(g, x, y)"
    ).createOrReplaceTempView("mom_t")
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT varPop(x) AS vp, varSamp(x) AS vs, "
            "stddevPop(x) AS sp, stddevSamp(x) AS ss, "
            "covarPop(x, y) AS cp, covarSamp(x, y) AS cs, "
            "corr(x, y) AS r FROM mom_t"
        )
    ).collect()[0]
    assert (
        round(got.vp, 9), round(got.vs, 9), round(got.sp, 9),
        round(got.cp, 9), round(got.cs, 9), round(got.r, 9),
    ) == (
        round(8.0 / 3, 9), 4.0, round((8.0 / 3) ** 0.5, 9),
        round(16.0 / 3, 9), 8.0, 1.0,
    )


def test_weighted_and_composite_aggregates(spark):
    spark.sql(
        "SELECT * FROM VALUES (10, 1), (20, 3) AS t(x, w)"
    ).createOrReplaceTempView("wt_t")
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT avgWeighted(x, w) AS aw, sumCount(x) AS sc, "
            "anyHeavy(w) AS ah FROM wt_t"
        )
    ).collect()[0]
    assert got.aw == 17.5
    assert got.sc.asDict() == {"sum": 30, "count": 2}
    assert got.ah in (1, 3)


def test_bitwise_rounding_encoding_family(spark):
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT bitAnd(12, 10) AS ba, bitOr(12, 10) AS bo, "
            "bitXor(12, 10) AS bx, bitNot(0) AS bn, "
            "bitShiftLeft(3, 2) AS sl, bitShiftRight(12, 2) AS sr, "
            "roundBankers(2.5) AS rb1, roundBankers(3.5) AS rb2, "
            "base64Decode(base64Encode('hi')) AS b64"
        )
    ).collect()[0]
    assert (got.ba, got.bo, got.bx, got.bn, got.sl, got.sr) == (
        8, 14, 6, -1, 12, 3
    )
    assert (got.rb1, got.rb2) == (2.0, 4.0)  # half-even, not half-up
    assert got.b64 == "hi"


def test_interval_and_quarter_truncation(spark):
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT toStartOfInterval(toDateTime('2024-05-17 10:47:23'),"
            " INTERVAL 15 minute) AS i15,"
            " toStartOfQuarter(toDate('2024-05-17')) AS q"
        )
    ).collect()[0]
    assert str(got.i15) == "2024-05-17 10:45:00"
    assert str(got.q) == "2024-04-01"
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    with pytest.raises(UnsupportedClickHouseSQL, match="calendar units"):
        translate_clickhouse_sql(
            "SELECT toStartOfInterval(ts, INTERVAL 2 month) FROM events"
        )


def test_tdigest_quantiles_translate_to_percentile_approx(spark):
    spark.sql(
        "SELECT * FROM VALUES (1), (2), (3), (4), (100) AS t(x)"
    ).createOrReplaceTempView("td_t")
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT quantileTDigest(0.5)(x) AS m, "
            "quantileDeterministic(0.5)(x, x) AS md, "
            "quantilesTDigest(0.25, 0.75)(x) AS qs FROM td_t"
        )
    ).collect()[0]
    assert got.m == 3 and got.md == 3 and list(got.qs) == [2, 4]
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    with pytest.raises(UnsupportedClickHouseSQL, match="topKWeighted"):
        translate_clickhouse_sql(
            "SELECT topKWeighted(3)(x, w) FROM t"
        )


def test_named_operator_spellings(spark):
    """divide/multiply/negate and the OrZero variants compile to the
    operators (no Spark function of those names exists); OrZero
    coalesces the zero-divisor case to 0, everything else keeps
    C-style truncation/sign semantics on both engines."""
    spark.sql(
        "SELECT * FROM VALUES (10, 3), (7, 0), (-7, 2) AS t(a, b)"
    ).createOrReplaceTempView("named_ops_t")
    rows = spark.sql(
        translate_clickhouse_sql(
            "SELECT a, divide(a, 2) AS d, multiply(a, b) AS m,"
            " negate(a) AS neg, intDivOrZero(a, b) AS idz,"
            " moduloOrZero(a, b) AS mz"
            " FROM named_ops_t ORDER BY a"
        )
    ).collect()
    got = {r.a: (r.d, r.m, r.neg, r.idz, r.mz) for r in rows}
    assert got[7] == (3.5, 0, -7, 0, 0)
    assert got[10] == (5.0, 30, -10, 3, 1)
    assert got[-7] == (-3.5, -14, 7, -3, -1)
    cd = spark.sql(
        translate_clickhouse_sql(
            "SELECT countDistinct(b) AS cd FROM named_ops_t"
        )
    ).collect()[0]
    assert cd.cd == 3


def test_split_by_string_literal_separator(spark):
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT arrayStringConcat(splitByString(', ', 'x, y, z'),"
            " '|') AS sp"
        )
    ).collect()[0]
    assert got.sp == "x|y|z"
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    with pytest.raises(UnsupportedClickHouseSQL, match="literal"):
        translate_clickhouse_sql("SELECT splitByString(sep, s) FROM t")


def test_round12_function_batch(spark):
    """The leak-through sweep batch: numeric trunc/truncate (Spark's
    trunc is a DATE function — the passthrough would silently
    re-type), dateAdd/dateSub with unit keywords, array editing,
    adjacent difference / running sum folds, binary-faithful
    md5/sha256 (hex() composes to the standard digests), typed empty
    arrays, and block-order fail-fasts."""
    spark.sql(
        "SELECT * FROM VALUES (2.9, -2.9, array(1, 4, 9),"
        " TIMESTAMP '2024-01-15 10:00:00') AS t(p, q, arr, ts)"
    ).createOrReplaceTempView("fn_batch_t")
    r = spark.sql(
        translate_clickhouse_sql(
            "SELECT trunc(p) AS tp, trunc(q) AS tq,"
            " dateAdd(DAY, 3, ts) AS da, toRelativeDayNum(ts) AS rdn,"
            " hasAll(arr, [1, 4]) AS ha, countEqual(arr, 4) AS ceq,"
            " arrayPopBack(arr) AS apo, arrayDifference(arr) AS ad,"
            " arrayCumSum(arr) AS acs, arrayReverseSort(arr) AS ars,"
            " hex(MD5('abc')) AS md, emptyArrayUInt64() AS ea"
            " FROM fn_batch_t"
        )
    ).collect()[0]
    assert float(r.tp) == 2.0 and float(r.tq) == -2.0
    assert str(r.da).startswith("2024-01-18") and r.rdn == 19737
    assert r.ha and r.ceq == 1 and list(r.apo) == [1, 4]
    assert list(r.ad) == [0, 3, 5] and list(r.acs) == [1, 5, 14]
    assert list(r.ars) == [9, 4, 1] and list(r.ea) == []
    # binary digest: hex(MD5(x)) must be the standard md5 hex
    assert r.md == "900150983CD24FB0D6963F7D28E17F72"
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    for bad, frag in [
        ("SELECT neighbor(x, 1) FROM t", "q_neighbor_deltas"),
        ("SELECT runningAccumulate(x) FROM t", "q_running_accumulate"),
        ("SELECT greatCircleDistance(1,2,3,4) FROM t", "q_geo_distance"),
        ("SELECT trunc(ts, 'MM') FROM t", "DIGIT count"),
        ("SELECT dateAdd(FORTNIGHT, 1, ts) FROM t", "supported units"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=frag):
            translate_clickhouse_sql(bad)


def test_round12_conversion_vector_batch(spark):
    """Second sweep batch: Or-Zero/Or-Null parse fallbacks, decimal /
    two-argument casts, typed intervals, vector folds (norms, dot,
    cosine distance), bit tests, rounding families, calendar
    spellings, parseDateTime, and the age() fixed-width restriction
    (month clamping diverges between engines — measured off-by-one)."""
    spark.sql(
        "SELECT * FROM VALUES (CAST(1.5 AS DOUBLE), '42', 'zz',"
        " array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE)),"
        " array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),"
        " TIMESTAMP '2024-03-31 10:00:00', 5)"
        " AS t(x, s, bad, v1, v2, t1, b)"
    ).createOrReplaceTempView("conv_batch_t")
    r = spark.sql(
        translate_clickhouse_sql(
            "SELECT toDecimal64(x, 2) AS d, toInt64OrZero(s) AS oz,"
            " toInt64OrZero(bad) AS ozb, toInt64OrNull(bad) AS onl,"
            " cast(s, 'Int64') AS c2, L2Norm(v1) AS l2,"
            " dotProduct(v1, v2) AS dp, cosineDistance(v1, v1) AS cdz,"
            " bitTest(b, 0) AS bt, bitTestAll(b, 0, 2) AS bta,"
            " roundToExp2(b) AS r2, roundDown(x, [1, 2, 3]) AS rd,"
            " toYYYYMMDD(t1) AS ymd, toMonday(t1) AS mon,"
            " monthName(t1) AS mn,"
            " parseDateTime('2024-01-15 10:30:00',"
            " '%Y-%m-%d %H:%i:%S') AS pd"
            " FROM conv_batch_t"
        )
    ).collect()[0]
    assert float(r.d) == 1.5 and r.oz == 42 and r.ozb == 0
    assert r.onl is None and r.c2 == 42
    assert r.l2 == 5.0 and r.dp == 3.0 and abs(r.cdz) < 1e-12
    assert r.bt == 1 and r.bta == 1 and r.r2 == 4 and float(r.rd) == 1
    assert r.ymd == 20240331 and str(r.mon) == "2024-03-25"
    assert r.mn == "March" and str(r.pd) == "2024-01-15 10:30:00"
    gc = spark.sql(
        translate_clickhouse_sql(
            "SELECT groupConcat(',')(s) AS g1, groupConcat(s) AS g2"
            " FROM conv_batch_t"
        )
    ).collect()[0]
    assert gc.g1 == "42" and gc.g2 == "42"
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    with pytest.raises(UnsupportedClickHouseSQL, match="clamp"):
        translate_clickhouse_sql("SELECT age('month', a, b) FROM t")
    with pytest.raises(UnsupportedClickHouseSQL, match="heuristic"):
        translate_clickhouse_sql(
            "SELECT parseDateTimeBestEffort(s) FROM t"
        )


def test_round12_json_url_map_batch(spark):
    """Third sweep batch: JSON key/array-length spellings, URL
    percent-coding, NUL-cut strings, lambda-first map/fold reorders,
    and the side-effect/block fail-fasts."""
    spark.sql(
        "SELECT '{\"a\": 1, \"b\": [1,2,3]}' AS j,"
        " 'a b%20c' AS u, array(1, 2, 3) AS arr,"
        " array('x', 'y') AS ks, array(1, 2) AS vs"
    ).createOrReplaceTempView("json_batch_t")
    r = spark.sql(
        translate_clickhouse_sql(
            "SELECT JSONExtractKeys(j) AS jk,"
            " JSONArrayLength(j, 'b') AS jl,"
            " decodeURLComponent(u) AS du,"
            " initcapUTF8('hello world') AS ic,"
            " mapFilter((k, v) -> v > 1,"
            "           mapFromArrays(ks, vs)) AS mfil,"
            " arrayFold((acc, x) -> acc + x, arr, 100) AS af"
            " FROM json_batch_t"
        )
    ).collect()[0]
    assert list(r.jk) == ["a", "b"] and r.jl == 3
    assert r.du == "a b c" and r.ic == "Hello World"
    assert dict(r.mfil) == {"y": 2} and r.af == 106
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    for bad, frag in [
        ("SELECT sleep(1) FROM t", "side-effecting"),
        ("SELECT blockNumber() FROM t", "physical blocks"),
        ("SELECT arrayShuffle(a) FROM t", "nondeterministic"),
        ("SELECT indexHint(x) FROM t", "Catalyst owns pushdown"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=frag):
            translate_clickhouse_sql(bad)


def test_unknown_parametric_aggregates_fail_fast():
    """EVERY fn(params)(args) double-paren call routes through the
    parametric table — unknown names fail fast with a clear message
    instead of leaking ClickHouse-only syntax into Spark's parser."""
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    with pytest.raises(UnsupportedClickHouseSQL,
                       match="not in the supported surface"):
        translate_clickhouse_sql("SELECT fooUnknown(1)(x) FROM t")
    with pytest.raises(UnsupportedClickHouseSQL,
                       match="exact_weighted_quantiles"):
        translate_clickhouse_sql(
            "SELECT quantileExactWeighted(0.5)(x, w) FROM t"
        )
    # OVER windows carry the keyword between the argument lists —
    # never routed to the parametric table
    out = translate_clickhouse_sql(
        "SELECT lag(x) OVER (ORDER BY ts) FROM t"
    )
    assert "OVER" in out


def test_iso_week_calendar(spark):
    """toISOWeek/toISOYear map to Spark's ISO-8601 weekofyear /
    YEAROFWEEK — pinned on the classic year-boundary cases."""
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT toISOWeek(toDate('2021-01-01')) AS w1, "
            "toISOYear(toDate('2021-01-01')) AS y1, "
            "toISOWeek(toDate('2024-01-01')) AS w2, "
            "toISOYear(toDate('2024-01-01')) AS y2"
        )
    ).collect()[0]
    # 2021-01-01 is ISO week 53 of ISO year 2020; 2024-01-01 is ISO
    # week 1 of 2024
    assert (got.w1, got.y1, got.w2, got.y2) == (53, 2020, 1, 2024)


def test_map_aggregates_fold_per_key(spark):
    """sumMap/minMap/maxMap compile to per-key array-HOF folds with
    the ClickHouse tuple-of-arrays shape: keys ascending, sumMap
    dropping keys whose total is 0, min/max keeping every key."""
    spark.sql(
        "SELECT * FROM VALUES"
        " ('a', array(1, 2, 3), array(10, 20, 30)),"
        " ('a', array(2, 4), array(-20, 5)),"
        " ('b', array(1), array(7)),"
        " ('b', array(1, 5), array(-7, 0))"
        " AS t(g, k, v)"
    ).createOrReplaceTempView("map_agg_t")
    rows = spark.sql(
        translate_clickhouse_sql(
            "SELECT g, sumMap(k, v) AS s, minMap(k, v) AS lo,"
            " maxMap(k, v) AS hi,"
            " tupleElement(sumMap(k, v), 1) AS ks"
            " FROM map_agg_t GROUP BY g ORDER BY g"
        )
    ).collect()
    a, b = rows
    assert list(a.s.col1) == [1, 3, 4] and list(a.s.col2) == [10, 30, 5]
    assert list(a.ks) == [1, 3, 4]
    assert list(a.lo.col1) == [1, 2, 3, 4]
    assert list(a.lo.col2) == [10, -20, 30, 5]
    assert list(a.hi.col2) == [10, 20, 30, 5]
    # every key of group b sums to zero — sumMap drops them all,
    # min/max keep the keys
    assert list(b.s.col1) == [] and list(b.lo.col1) == [1, 5]
    assert list(b.hi.col2) == [7, 0]
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    with pytest.raises(UnsupportedClickHouseSQL, match="keys_array"):
        translate_clickhouse_sql("SELECT sumMap(t) FROM t")


def test_any_left_join_dedupes_right_side(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(k, tag)"
    ).createOrReplaceTempView("any_l")
    spark.sql(
        "SELECT * FROM VALUES (1, 7, 7), (1, 7, 7), (3, 9, 9)"
        " AS t(k, v, w)"
    ).createOrReplaceTempView("any_r")
    # duplicate right rows are IDENTICAL, so ANY's arbitrary pick is
    # value-deterministic here: exactly one match per left row
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT l.tag, r.v FROM any_l AS l "
                "ANY LEFT JOIN any_r AS r ON l.k = r.k ORDER BY l.tag"
            )
        ).collect()
    ]
    assert got == [("a", 7), ("b", None)]
    # GLOBAL strips; ALL strips; plain semantics preserved
    got = [
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT l.tag, r.v FROM any_l AS l "
                "GLOBAL ALL LEFT JOIN any_r AS r ON l.k = r.k "
                "ORDER BY l.tag, r.v"
            )
        ).collect()
    ]
    assert got == [("a", 7), ("a", 7), ("b", None)]


def test_any_join_fail_fasts():
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    for sql, frag in [
        ("SELECT 1 FROM a ANY RIGHT JOIN b ON a.k = b.k", "RIGHT/FULL"),
        ("SELECT 1 FROM a ANY JOIN b ON a.k < b.k", "equality"),
        ("SELECT 1 FROM a ANY JOIN b USING (k)", "USING"),
        ("SELECT 1 FROM a ANY JOIN b ON a.k = b.k + 1", "plain b.<column>"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=frag):
            translate_clickhouse_sql(sql)


def test_second_review_fixes(spark):
    """Round-9 second-review findings, pinned by execution."""
    # avgWeighted skips weights of NULL-value rows (ClickHouse skips
    # rows where any argument is NULL)
    spark.sql(
        "SELECT * FROM VALUES (CAST(NULL AS INT), 10), (4, 1) AS t(x, w)"
    ).createOrReplaceTempView("awn_t")
    got = spark.sql(
        translate_clickhouse_sql("SELECT avgWeighted(x, w) AS aw FROM awn_t")
    ).collect()[0]
    assert got.aw == 4.0
    # chained ANY JOINs: the first ON clause must stop at the next ANY
    out = translate_clickhouse_sql(
        "SELECT 1 FROM t ANY LEFT JOIN b ON t.k = b.k "
        "ANY LEFT JOIN c ON t.j = c.j"
    )
    assert out.count("max_by(struct(*), 1)") == 2
    # ARRAY JOIN directly after an ANY JOIN's ON clause
    out = translate_clickhouse_sql(
        "SELECT va FROM t ANY LEFT JOIN b ON t.k = b.k "
        "ARRAY JOIN t.arr AS va"
    )
    assert "LATERAL VIEW" in out and "max_by" in out
    # GLOBAL/ALL strip for ALL join kinds, not just LEFT/INNER
    out = translate_clickhouse_sql(
        "SELECT c.c_name FROM orders GLOBAL RIGHT JOIN customer AS c "
        "ON orders.o_custkey = c.c_custkey"
    )
    assert "GLOBAL" not in out and "RIGHT JOIN" in out
    out = translate_clickhouse_sql(
        "SELECT 1 FROM a ALL FULL JOIN b ON a.k = b.k"
    )
    assert " ALL " not in out and "FULL JOIN" in out
    # ...while SELECT ALL / UNION ALL survive untouched
    out = translate_clickhouse_sql(
        "SELECT x FROM t UNION ALL SELECT y FROM u"
    )
    assert "UNION ALL" in out
    # GLOBAL also prefixes [NOT] IN (one-shot-subquery distribution
    # hint) — stripped the same way; named identifiers survive
    out = translate_clickhouse_sql(
        "SELECT k FROM t WHERE k GLOBAL IN (SELECT k FROM u) "
        "AND j GLOBAL NOT IN (SELECT j FROM v)"
    )
    assert "GLOBAL" not in out
    assert "k IN (" in out and "j NOT IN (" in out
    assert "global_in" in translate_clickhouse_sql(
        "SELECT global_in FROM t"
    )


def test_interval_buckets_align_to_local_midnight(spark):
    """toStartOfInterval must bucket in the SESSION timezone (like
    toStartOfDay), not UTC epoch — hour buckets in a :30-offset zone
    are the discriminating case."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        # render via date_format so the assertion sees SESSION-tz
        # wall-clock strings (collect() converts to the driver tz)
        got = spark.sql(
            "SELECT date_format(h, 'yyyy-MM-dd HH:mm:ss') AS h, "
            "date_format(d, 'yyyy-MM-dd HH:mm:ss') AS d FROM (" +
            translate_clickhouse_sql(
                "SELECT toStartOfInterval("
                "toDateTime('2024-05-17 10:47:23'), INTERVAL 1 hour)"
                " AS h, toStartOfInterval("
                "toDateTime('2024-05-17 10:47:23'), INTERVAL 1 day)"
                " AS d"
            ) + ")"
        ).collect()[0]
        assert got.h == "2024-05-17 10:00:00"
        assert got.d == "2024-05-17 00:00:00"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    with pytest.raises(UnsupportedClickHouseSQL, match="multi-day"):
        translate_clickhouse_sql(
            "SELECT toStartOfInterval(ts, INTERVAL 7 day) FROM events"
        )


def test_settings_and_format_strip(spark):
    """SETTINGS / FORMAT are execution directives, not semantics:
    query-tail forms strip; identifiers merely NAMED settings/format
    survive; unknown FORMAT names fail fast."""
    out = translate_clickhouse_sql(
        "SELECT x FROM t WHERE y = 1 "
        "SETTINGS max_threads = 8, join_algorithm = 'hash' FORMAT TSV"
    )
    assert out.strip() == "SELECT x FROM t WHERE y = 1"
    out = translate_clickhouse_sql("SELECT settings, format FROM t")
    assert "settings" in out and "format" in out
    out = translate_clickhouse_sql(
        "SELECT settings FROM t ORDER BY settings"
    )
    assert out.count("settings") == 2
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    with pytest.raises(UnsupportedClickHouseSQL, match="FORMAT"):
        translate_clickhouse_sql("SELECT x FROM t FORMAT mysteryfmt")
    # end-to-end: a reference-shaped query with both directives runs
    got = run_clickhouse_sql(
        spark,
        "SELECT event_type, count() AS n FROM events "
        "GROUP BY event_type ORDER BY event_type "
        "SETTINGS max_threads = 4 FORMAT JSONEachRow",
        SF_SMOKE,
    ).collect()
    assert len(got) == 5 and all(r.n > 0 for r in got)


def test_with_fill_fails_fast_but_fill_cte_survives():
    import pytest

    from clickbom_spark.dialect import UnsupportedClickHouseSQL

    with pytest.raises(UnsupportedClickHouseSQL, match="gap-fill"):
        translate_clickhouse_sql(
            "SELECT d, n FROM t ORDER BY d WITH FILL STEP 1"
        )
    out = translate_clickhouse_sql(
        "WITH fill AS (SELECT 1 AS x) SELECT x FROM fill"
    )
    assert "fill" in out


def test_register_table_ddl_wires_final_and_sample(spark):
    """Feeding the reference's CREATE TABLE DDL registers FINAL and
    SAMPLE metadata, so the query-side clauses compile without manual
    register_* calls — verified end-to-end on a live view."""
    from clickbom_spark import dialect as D

    t = D.register_table_ddl(
        """
        CREATE TABLE IF NOT EXISTS db.ddl_events (
          k Int64, grp String, ver Int64, v Int64
        ) ENGINE = ReplacingMergeTree(ver)
        PARTITION BY grp
        ORDER BY (k, grp)
        SAMPLE BY k
        SETTINGS index_granularity = 8192
        """
    )
    assert t == "ddl_events"
    assert D.FINAL_KEYS["ddl_events"] == (("k", "grp"), ("ver",))
    assert D.SAMPLING_KEYS["ddl_events"] == "k"
    spark.sql(
        "SELECT * FROM VALUES (1, 'a', 1, 10), (1, 'a', 2, 20), "
        "(2, 'b', 1, 30) AS t(k, grp, ver, v)"
    ).createOrReplaceTempView("ddl_events")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT k, grp, v FROM ddl_events FINAL"
            )
        ).collect()
    )
    # FINAL keeps max-ver per (k, grp)
    assert got == [(1, "a", 20), (2, "b", 30)]
    # FINAL + SAMPLE compose (the rewrite aliases the subquery back
    # to the table name, which carries the sampling key)
    out = translate_clickhouse_sql(
        "SELECT k FROM ddl_events FINAL SAMPLE 0.5"
    )
    assert "max_by" in out and "md5(cast(k" in out.lower()


def test_register_table_ddl_fail_fasts():
    import pytest

    from clickbom_spark import dialect as D

    with pytest.raises(D.UnsupportedClickHouseSQL, match="version"):
        D.register_table_ddl(
            "CREATE TABLE t1 (x Int64) ENGINE = ReplacingMergeTree "
            "ORDER BY x"
        )
    with pytest.raises(D.UnsupportedClickHouseSQL, match="ENGINE"):
        D.register_table_ddl("CREATE TABLE t2 (x Int64)")
    with pytest.raises(D.UnsupportedClickHouseSQL, match="CREATE TABLE"):
        D.register_table_ddl("SELECT 1")
    # plain MergeTree registers nothing for FINAL but honors SAMPLE BY
    D.register_table_ddl(
        "CREATE TABLE t3 (x Int64) ENGINE = MergeTree ORDER BY x "
        "SAMPLE BY intDiv(x, 10)"
    )
    assert "t3" not in D.FINAL_KEYS
    assert D.SAMPLING_KEYS["t3"] == "(x DIV 10)"


def test_third_review_fixes(spark):
    """Round-9 third-review findings, pinned by execution."""
    from clickbom_spark import dialect as D

    # a column named settings must not block a REAL trailing clause
    out = translate_clickhouse_sql(
        "SELECT settings FROM t SETTINGS max_threads = 8"
    )
    assert out.strip() == "SELECT settings FROM t"
    out = translate_clickhouse_sql(
        "SELECT x FROM t WHERE settings = 1 SETTINGS max_threads = 8"
    )
    assert out.strip() == "SELECT x FROM t WHERE settings = 1"
    # ReplicatedReplacingMergeTree strips the (zk, replica) prefix
    t = D.register_table_ddl(
        "CREATE TABLE rrmt (k Int64, ver Int64) ENGINE = "
        "ReplicatedReplacingMergeTree('/ch/t', '{replica}', ver) "
        "ORDER BY k"
    )
    assert D.FINAL_KEYS[t] == (("k",), ("ver",))
    # the two-arg (version, is_deleted) form fails fast
    import pytest

    with pytest.raises(D.UnsupportedClickHouseSQL, match="is_deleted"):
        D.register_table_ddl(
            "CREATE TABLE t4 (k Int64) ENGINE = "
            "ReplacingMergeTree(ver, is_deleted) ORDER BY k"
        )
    # truncated DDL raises the contracted exception, not IndexError
    for bad in (
        "CREATE TABLE t5 (x Int64) ENGINE =",
        "CREATE TABLE t6 (x Int64) ENGINE = MergeTree ORDER BY",
        "CREATE TABLE t7 (x Int64) ENGINE = MergeTree SAMPLE BY",
    ):
        with pytest.raises(D.UnsupportedClickHouseSQL):
            D.register_table_ddl(bad)
    # a USER subquery aliased to a registered table must NOT sample
    with pytest.raises(D.UnsupportedClickHouseSQL, match="subquery"):
        translate_clickhouse_sql(
            "SELECT * FROM (SELECT doc_id FROM archive) AS documents "
            "SAMPLE 0.5"
        )
    # ...while the FINAL-rewrite composition still does (its own
    # wrapper aliases back to the table name)
    out = translate_clickhouse_sql(
        "SELECT user_id FROM events FINAL SAMPLE 0.5"
    )
    assert "max_by" in out and "md5(cast(event_id" in out.lower()
    assert "register_table_ddl" in D.__all__


def test_engine_pointer_fail_fasts(spark):
    """Known-unmappable ClickHouse aggregates fail fast with a pointer
    at the engine operator that implements the semantics, instead of
    leaking unresolved functions to Spark."""
    import pytest

    for sql, frag in [
        ("SELECT groupBitmapAnd(b) FROM t", "q_bitmap_ops"),
        ("SELECT intervalLengthSum(a, b) FROM t",
         "q_interval_union_length"),
        ("SELECT maxIntersections(a, b) FROM t", "q_max_intersections"),
        ("SELECT groupArrayMovingSum(3)(x) FROM t",
         "q_group_array_moving_sum"),
        ("SELECT histogram(5)(x) FROM t", "q_histogram_equi_height"),
        ("SELECT windowFunnel(60)(ts, a, b) FROM t GROUP BY u",
         "q_window_funnel"),
        ("SELECT sequenceMatch('(?1).*(?2)')(ts, a, b) FROM t",
         "q_sequence_match"),
        ("SELECT quantileTimingWeighted(0.9)(x, w) FROM t",
         "q_weighted_quantiles"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=frag):
            translate_clickhouse_sql(sql)
    # sketch families that DO carry the approximate contract map
    out = translate_clickhouse_sql(
        "SELECT uniqTheta(u) AS a, uniqCombined(u) AS b, "
        "quantileTiming(0.9)(ms) AS c FROM t"
    )
    assert out.count("approx_count_distinct") == 2
    assert "percentile_approx(ms, 0.9)" in out


def test_star_modifiers(spark):
    """* EXCEPT passes through (Spark-native); * REPLACE / * APPLY
    need schema knowledge and fail fast."""
    import pytest

    # (the call normalizer may drop the space before the paren —
    # Spark accepts both spellings)
    out = translate_clickhouse_sql("SELECT * EXCEPT (b) FROM t")
    assert out in (
        "SELECT * EXCEPT (b) FROM t", "SELECT * EXCEPT(b) FROM t"
    )
    for sql in (
        "SELECT * REPLACE (x + 1 AS x) FROM t",
        "SELECT * APPLY (sum) FROM t GROUP BY g",
    ):
        with pytest.raises(UnsupportedClickHouseSQL, match="star"):
            translate_clickhouse_sql(sql)
    # plain replace() the STRING function is untouched
    out = translate_clickhouse_sql("SELECT replace(s, 'a', 'b') FROM t")
    assert "replace(s, 'a', 'b')" in out


def test_fourth_review_fixes():
    """Round-9 fourth-review findings, pinned."""
    import pytest

    # arithmetic `expr * replace(...)` is not a star modifier
    out = translate_clickhouse_sql(
        "SELECT n * replace(s, 'a', 'b') FROM t"
    )
    assert "replace(s, 'a', 'b')" in out
    # chained modifiers after an EXCEPT group still fail fast
    for bad in (
        "SELECT * EXCEPT (a) APPLY (sum) FROM t GROUP BY g",
        "SELECT * EXCEPT (a) REPLACE (x + 1 AS x) FROM t",
        "SELECT t.* APPLY (max) FROM t",
    ):
        with pytest.raises(UnsupportedClickHouseSQL, match="star"):
            translate_clickhouse_sql(bad)
    # paren-less single-column EXCEPT gains Spark's required parens
    assert translate_clickhouse_sql(
        "SELECT * EXCEPT b FROM t"
    ) == "SELECT * EXCEPT (b) FROM t"
    # ...and a BARE set-operation EXCEPT fails fast since the clause
    # sweep: ClickHouse's bare EXCEPT keeps duplicates (filtering
    # semantics) while Spark's default deduplicates — passing it
    # through silently changed row multiplicity.  The DISTINCT
    # spelling coincides on both engines and passes.
    with pytest.raises(UnsupportedClickHouseSQL, match="DISTINCT"):
        translate_clickhouse_sql(
            "SELECT a FROM t EXCEPT SELECT a FROM u"
        )
    out = translate_clickhouse_sql(
        "SELECT a FROM t EXCEPT DISTINCT SELECT a FROM u"
    )
    assert "EXCEPT DISTINCT SELECT" in out
    # parametric sketch spellings translate instead of leaking f(x)(y)
    out = translate_clickhouse_sql(
        "SELECT uniqCombined(17)(u) AS a, "
        "quantilesTiming(0.5, 0.9)(ms) AS b FROM t"
    )
    assert "approx_count_distinct(u)" in out
    assert "percentile_approx(ms, array(0.5, 0.9))" in out
    # groupBitmapXor joins its siblings' fail-fast pointer
    with pytest.raises(UnsupportedClickHouseSQL, match="q_bitmap_ops"):
        translate_clickhouse_sql("SELECT groupBitmapXor(b) FROM t")


def test_generic_if_and_distinct_combinators(spark):
    """The -If combinator on multi-argument aggregates and -Distinct
    on the arithmetic ones — all null-skipping verified live."""
    spark.sql(
        "SELECT * FROM VALUES (1, 'a', 10), (2, 'b', 20), (2, 'b', 20),"
        " (3, 'c', 30) AS t(k, s, v)"
    ).createOrReplaceTempView("cmb_t")
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT uniqExactIf(s, v > 10) AS ue, "
            "argMaxIf(s, k, v < 30) AS am, "
            "anyIf(s, v = 20) AS a1, "
            "anyLastIf(s, v < 25) AS al, "
            "groupUniqArrayIf(s, v >= 20) AS ga, "
            "sumDistinct(v) AS sd, "
            "avgDistinct(v) AS ad "
            "FROM cmb_t"
        )
    ).collect()[0]
    assert got.ue == 2          # {'b', 'c'}
    assert got.am == "b"        # max k among v<30 rows is 2 -> 'b'
    assert got.a1 == "b"
    assert got.al in ("a", "b")  # last among matching; order-free any
    assert sorted(got.ga) == ["b", "c"]
    assert got.sd == 60         # 10 + 20 + 30 (distinct)
    assert got.ad == 20.0
    # last row non-matching: null-skipping must still find a value
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT anyLastIf(s, v = 10) AS al, any(s) AS a FROM cmb_t"
        )
    ).collect()[0]
    assert got.al == "a" and got.a is not None


def test_with_ties_compiles_to_rank_window(spark):
    """Round-10: LIMIT n WITH TIES compiles to the rank() <= n window
    the old fail-fast pointed at — keeps every row tying the cutoff."""
    spark.sql(
        "SELECT * FROM VALUES (1,'a'),(2,'b'),(2,'c'),(3,'d'),(3,'e') "
        "AS t(x, y)"
    ).createOrReplaceTempView("wt_t")
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT x, y FROM wt_t ORDER BY x DESC LIMIT 2 WITH TIES"
        )
    ).collect()
    # DESC ranks over x=[3,3,2,1(,1)] are 1,1,3,4: rank<=2 keeps only
    # the two x=3 rows — the boundary tie is kept, nothing below it
    assert sorted((r.x, r.y) for r in got) == [(3, "d"), (3, "e")]
    got2 = spark.sql(
        translate_clickhouse_sql(
            "SELECT x, y FROM wt_t ORDER BY x LIMIT 3 WITH TIES"
        )
    ).collect()
    # ranks over ASC: x=1 ->1, x=2 ->2,2, x=3 ->4: rank<=3 keeps 1,2,2
    assert sorted((r.x, r.y) for r in got2) == [(1, "a"), (2, "b"), (2, "c")]
    # a CTE merely named ties still survives
    out = translate_clickhouse_sql(
        "WITH ties AS (SELECT 1 AS x) SELECT x FROM ties"
    )
    assert "ties" in out


def test_with_ties_fail_fasts():
    with pytest.raises(UnsupportedClickHouseSQL, match="ORDER BY"):
        translate_clickhouse_sql("SELECT x FROM t LIMIT 5 WITH TIES")
    with pytest.raises(UnsupportedClickHouseSQL, match="positional"):
        translate_clickhouse_sql(
            "SELECT x FROM t ORDER BY 1 LIMIT 5 WITH TIES"
        )
    with pytest.raises(UnsupportedClickHouseSQL, match="final clause"):
        translate_clickhouse_sql(
            "SELECT x FROM t ORDER BY x LIMIT 5 WITH TIES OFFSET 2"
        )
    with pytest.raises(UnsupportedClickHouseSQL, match="integers"):
        translate_clickhouse_sql(
            "SELECT x FROM t ORDER BY x LIMIT 2.5, 5 WITH TIES"
        )


def test_with_ties_offset_form(spark):
    """Round-11 (VERDICT r10 item 6): LIMIT m, n WITH TIES — skip the
    first m ordered rows, take the next n, extend with rows tying the
    (m+n)-th order value."""
    spark.sql(
        "SELECT * FROM VALUES (1,'a'),(1,'b'),(2,'c'),(2,'d'),(3,'e'),"
        "(3,'f'),(4,'g') AS t(x, tag)"
    ).createOrReplaceTempView("wto_t")
    got = sorted(
        r.x
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT x FROM wto_t ORDER BY x LIMIT 2, 3 WITH TIES"
            )
        ).collect()
    )
    # skip the two 1s; rows 3..5 are (2,2,3); the second 3 ties in
    assert got == [2, 2, 3, 3]
    # the OFFSET spelling is the same rewrite (operands swapped)
    got2 = sorted(
        r.x
        for r in spark.sql(
            translate_clickhouse_sql(
                "SELECT x FROM wto_t ORDER BY x "
                "LIMIT 3 OFFSET 2 WITH TIES"
            )
        ).collect()
    )
    assert got2 == [2, 2, 3, 3]
    # offset past the end -> empty, not an error
    assert (
        spark.sql(
            translate_clickhouse_sql(
                "SELECT x FROM wto_t ORDER BY x LIMIT 9, 3 WITH TIES"
            )
        ).count()
        == 0
    )


def test_with_ties_composes_with_clause_rewrites(spark):
    """WITH TIES runs LAST in the clause pipeline: FINAL on the body
    must still be rewritten (the body is only wrapped opaque after)."""
    sql = translate_clickhouse_sql(
        "SELECT user_id, event_type, ts FROM events FINAL "
        "ORDER BY user_id LIMIT 3 WITH TIES"
    )
    assert "__kl" in sql  # FINAL keep-latest wrapper made it inside
    assert "LIMIT 1 OFFSET 2" in sql  # single-key cutoff-filter form


def test_with_ties_single_key_avoids_global_window(spark):
    """The 100 TB shape: a single-key WITH TIES compiles to a
    distributed top-k cutoff (TakeOrderedAndProject) + filter — never
    an unpartitioned rank() window over the whole body."""
    df = spark.sql(
        translate_clickhouse_sql(
            "SELECT o_custkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC LIMIT 10 WITH TIES"
        ).replace("orders", f"parquet.`{SF_SMOKE}/orders.parquet`")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert df.count() >= 10


def test_with_ties_null_placement_matches_clickhouse(spark):
    """ClickHouse sorts NULL as LARGER than everything (ASC → last,
    DESC → first) — the opposite of Spark's default; both compiled
    forms must make that explicit."""
    spark.sql(
        "SELECT * FROM VALUES (1), (2), (2), (CAST(NULL AS INT)), "
        "(CAST(NULL AS INT)) AS t(x)"
    ).createOrReplaceTempView("wtn_t")
    # ASC: NULLs rank worst; top-3 is 1,2,2 — no NULL leaks in
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT x FROM wtn_t ORDER BY x LIMIT 3 WITH TIES"
        )
    ).collect()
    assert sorted(r.x for r in got) == [1, 2, 2]
    # DESC: NULLs rank best; cutoff at rank 2 is NULL → exactly the
    # NULL tier survives
    got2 = spark.sql(
        translate_clickhouse_sql(
            "SELECT x FROM wtn_t ORDER BY x DESC LIMIT 2 WITH TIES"
        )
    ).collect()
    assert [r.x for r in got2] == [None, None]
    # DESC with n exceeding the row count keeps everything
    got3 = spark.sql(
        translate_clickhouse_sql(
            "SELECT x FROM wtn_t ORDER BY x DESC LIMIT 99 WITH TIES"
        )
    ).collect()
    assert len(got3) == 5


def test_with_ties_multi_key_rank_window(spark):
    """Composite tie definitions fall back to the rank() window (the
    honest cost) with ClickHouse NULL placement injected."""
    spark.sql(
        "SELECT * FROM VALUES (1,'a'),(1,'b'),(1,'a'),(2,'z') AS t(x, y)"
    ).createOrReplaceTempView("wtm_t")
    sql = translate_clickhouse_sql(
        "SELECT x, y FROM wtm_t ORDER BY x, y LIMIT 2 WITH TIES"
    )
    assert "rank() OVER" in sql
    assert "NULLS LAST" in sql
    got = spark.sql(sql).collect()
    # ranks over (x,y): (1,a)=1,1 (1,b)=3 (2,z)=4 → rank<=2 keeps both (1,a)
    assert sorted((r.x, r.y) for r in got) == [(1, "a"), (1, "a")]


def test_multiarg_uniq_counts_tuples(spark):
    """Fifth-review fix: uniq*(a, b) counts distinct TUPLES — Spark's
    approx_count_distinct second arg is the rsd knob, so multi-arg
    forms must gate one struct; the -If variant's gate must be the
    WHOLE struct (per-column gating would count a spurious all-NULL
    tuple for non-matching rows)."""
    spark.sql(
        "SELECT * FROM VALUES (1, 'x', true), (1, 'y', true), "
        "(1, 'x', true), (2, 'x', false) AS t(a, b, c)"
    ).createOrReplaceTempView("mu_t")
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT uniq(a, b) AS u, uniqExact(a, b) AS ue, "
            "uniqIf(a, b, c) AS ui, uniqExactIf(a, b, c) AS uei "
            "FROM mu_t"
        )
    ).collect()[0]
    assert got.ue == 3          # (1,x), (1,y), (2,x)
    assert got.u == 3           # exact at this cardinality
    assert got.uei == 2         # gated: (1,x), (1,y) — NOT an
    assert got.ui == 2          # extra all-NULL tuple


def test_dictget_family(spark):
    """dictGet (registry default on a miss), dictGetOrDefault,
    dictGetOrNull, dictHas, the typed variants' type defaults, and a
    composite key — against a registered in-memory dictionary."""
    from clickbom_spark.dialect import register_dictionary

    spark.sql(
        "SELECT * FROM VALUES (1, 'alpha', 10.0), (2, 'beta', 20.0) "
        "AS t(k, label, score)"
    ).createOrReplaceTempView("__dict_dg_test")
    register_dictionary(
        "dg_test", lambda sp, sf: sp.table("__dict_dg_test"),
        key="k", defaults={"label": "'none'"},
    )
    spark.sql(
        "SELECT * FROM VALUES (1), (2), (3) AS t(id)"
    ).createOrReplaceTempView("dg_rows")
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT id, dictGet('dg_test', 'label', id) AS l, "
            "dictGetOrDefault('dg_test', 'label', id, 'missing') AS ld, "
            "dictGetOrNull('dg_test', 'label', id) AS ln, "
            "dictHas('dg_test', id) AS h, "
            "dictGetString('dg_test', 'label', id) AS ls, "
            "dictGetFloat64('dg_test', 'score', id) AS f "
            "FROM dg_rows ORDER BY id"
        )
    ).collect()
    assert [(r.l, r.ld, r.ln, r.h, r.ls, r.f) for r in got] == [
        ("alpha", "alpha", "alpha", True, "alpha", 10.0),
        ("beta", "beta", "beta", True, "beta", 20.0),
        ("none", "missing", None, False, "", 0.0),
    ]


def test_dictget_composite_key(spark):
    from clickbom_spark.dialect import register_dictionary

    spark.sql(
        "SELECT * FROM VALUES (1, 'a', 'one-a'), (1, 'b', 'one-b') "
        "AS t(k1, k2, v)"
    ).createOrReplaceTempView("__dict_dg_comp")
    register_dictionary(
        "dg_comp", lambda sp, sf: sp.table("__dict_dg_comp"),
        key=("k1", "k2"), defaults={"v": "'?'"},
    )
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT dictGet('dg_comp', 'v', tuple(1, 'a')) AS t1, "
            "dictGet('dg_comp', 'v', (1, 'b')) AS t2, "
            "dictGet('dg_comp', 'v', (2, 'a')) AS t3"
        )
    ).collect()[0]
    assert (got.t1, got.t2, got.t3) == ("one-a", "one-b", "?")


def test_dictget_broadcasts(spark):
    """The declared 100 TB shape: each dictGet is a correlated scalar
    subquery Catalyst rewrites into a join; a dictionary-sized right
    side must come back as a BROADCAST hash join, never a shuffle."""
    from clickbom_spark.dialect import register_dictionary, run_clickhouse_sql

    register_dictionary(
        "dg_nation",
        "SELECT n_nationkey AS k, n_name AS nname FROM nation",
        key="k", defaults={"nname": "'UNKNOWN'"},
    )
    df = run_clickhouse_sql(
        spark,
        "SELECT dictGet('dg_nation', 'nname', s_nationkey) AS nation, "
        "count() AS n FROM supplier GROUP BY nation ORDER BY nation",
        SF_SMOKE,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0


def test_dictget_fail_fasts():
    from clickbom_spark.dialect import register_dictionary

    with pytest.raises(UnsupportedClickHouseSQL, match="register_dictionary"):
        translate_clickhouse_sql("SELECT dictGet('nosuch', 'a', 1)")
    register_dictionary("dg_ff", None, key="k", defaults={})
    # untyped dictGet without a registered attribute default
    with pytest.raises(UnsupportedClickHouseSQL, match="DEFAULT"):
        translate_clickhouse_sql("SELECT dictGet('dg_ff', 'a', 1)")
    # dictionary / attribute names must be string literals
    with pytest.raises(UnsupportedClickHouseSQL, match="string literal"):
        translate_clickhouse_sql("SELECT dictGetOrNull(name, 'a', 1)")
    with pytest.raises(UnsupportedClickHouseSQL, match="string literal"):
        translate_clickhouse_sql("SELECT dictGetOrNull('dg_ff', col, 1)")
    # composite arity mismatch
    register_dictionary("dg_ff2", None, key=("a", "b"))
    with pytest.raises(UnsupportedClickHouseSQL, match="key has 2 parts"):
        translate_clickhouse_sql(
            "SELECT dictGetOrNull('dg_ff2', 'v', tuple(1, 2, 3))"
        )
    with pytest.raises(UnsupportedClickHouseSQL, match="composite"):
        translate_clickhouse_sql("SELECT dictGetOrNull('dg_ff2', 'v', 1)")
    # hierarchical traversals need the hierarchical= registration
    # (round 11 compiled them — see test_dict_hierarchy_family)
    with pytest.raises(UnsupportedClickHouseSQL, match="hierarchical"):
        translate_clickhouse_sql("SELECT dictIsIn('dg_ff', 1, 2)")


def test_with_fill_runs_via_run_clickhouse_sql(spark):
    """Round-10: run_clickhouse_sql HAS the SparkSession, so it
    resolves the output schema the translate-only fail-fast lacks and
    compiles WITH FILL: dense spine, FROM inclusive / TO exclusive,
    type defaults on generated rows, existing rows never duplicated."""
    from clickbom_spark.dialect import run_clickhouse_sql

    df = run_clickhouse_sql(
        spark,
        "SELECT s_nationkey AS nk, count() AS n, anyLast(s_name) AS nm "
        "FROM supplier GROUP BY nk ORDER BY nk WITH FILL FROM 0 TO 30",
        SF_SMOKE,
    )
    rows = df.collect()
    assert [r.nk for r in rows] == list(range(30))  # dense, TO exclusive
    real = [r for r in rows if r.n > 0]
    filled = [r for r in rows if r.n == 0]
    assert real and filled
    assert all(r.nm == "" for r in filled)  # string type default
    assert all(r.nm != "" for r in real)    # originals untouched

    # integer STEP + implicit bounds (min/max of the data, inclusive)
    df2 = run_clickhouse_sql(
        spark,
        "SELECT toInt64(s_nationkey * 2) AS k2, count() AS n "
        "FROM supplier GROUP BY k2 ORDER BY k2 WITH FILL STEP 2",
        SF_SMOKE,
    )
    k2 = [r.k2 for r in df2.collect()]
    assert k2 == list(range(min(k2), max(k2) + 1, 2))

    # date key: daily spine between min and max
    df3 = run_clickhouse_sql(
        spark,
        "SELECT toDate(ts) AS d, count() AS n FROM events "
        "GROUP BY d ORDER BY d WITH FILL",
        SF_SMOKE,
    )
    d = [r.d for r in df3.collect()]
    assert len(d) == (max(d) - min(d)).days + 1
    assert d == sorted(d)


def test_with_fill_translate_only_still_fails_fast():
    with pytest.raises(UnsupportedClickHouseSQL, match="run_clickhouse_sql"):
        translate_clickhouse_sql(
            "SELECT d, n FROM t ORDER BY d WITH FILL STEP 1"
        )


def test_with_fill_desc_walks_downward(spark):
    """Round-11 late addition: ORDER BY k DESC WITH FILL walks the
    spine downward — FROM defaults to the max key, TO to the min
    (inclusive), an explicit TO is exclusive at the BOTTOM, and the
    INTERPOLATE carry repeats the last LARGER-key real row."""
    from clickbom_spark.dialect import run_clickhouse_sql

    spark.sql(
        "SELECT * FROM VALUES (9, 90), (6, 60), (2, 20) AS t(k, v)"
    ).createOrReplaceTempView("wfd_t")
    rows = run_clickhouse_sql(
        spark,
        "SELECT k, v FROM wfd_t ORDER BY k DESC WITH FILL "
        "INTERPOLATE (v)",
        SF_SMOKE,
    ).collect()
    assert [r.k for r in rows] == [9, 8, 7, 6, 5, 4, 3, 2]
    # carry: filled 8,7 repeat v(9)=90; 5,4,3 repeat v(6)=60
    assert [r.v for r in rows] == [90, 90, 90, 60, 60, 60, 60, 20]
    # explicit bounds: FROM 8 (inclusive) TO 3 (exclusive), STEP 2
    rows2 = run_clickhouse_sql(
        spark,
        "SELECT k, v FROM wfd_t ORDER BY k DESC WITH FILL "
        "FROM 8 TO 3 STEP 2",
        SF_SMOKE,
    ).collect()
    # spine {8, 6, 4}; base rows 9, 6, 2 kept; non-carried v
    # defaults to 0 on filled rows
    assert [(r.k, r.v) for r in rows2] == [
        (9, 90), (8, 0), (6, 60), (4, 0), (2, 20)
    ]


def test_with_fill_bare_interpolate_carries_all(spark):
    """Bare INTERPOLATE (no column list) carries EVERY non-key
    column — the schema-resolved all-columns form ClickHouse
    defines; it must still be the final clause."""
    from clickbom_spark.dialect import run_clickhouse_sql

    spark.sql(
        "SELECT * FROM VALUES (1, 10, 'a'), (4, 40, 'd') AS t(k, v, s)"
    ).createOrReplaceTempView("wfb_t")
    rows = run_clickhouse_sql(
        spark,
        "SELECT k, v, s FROM wfb_t ORDER BY k WITH FILL INTERPOLATE",
        SF_SMOKE,
    ).collect()
    assert [(r.k, r.v, r.s) for r in rows] == [
        (1, 10, "a"), (2, 10, "a"), (3, 10, "a"), (4, 40, "d")
    ]
    with pytest.raises(UnsupportedClickHouseSQL, match="final"):
        run_clickhouse_sql(
            spark,
            "SELECT k FROM wfb_t ORDER BY k WITH FILL INTERPOLATE "
            "TO 5",
            SF_SMOKE,
        )


def test_with_fill_run_fail_fasts(spark):
    from clickbom_spark.dialect import run_clickhouse_sql

    cases = {
        "float": "SELECT value AS v, count() AS n FROM events "
                 "GROUP BY v ORDER BY v WITH FILL",
        "bad step": "SELECT user_id AS u, count() AS n FROM events "
                    "GROUP BY u ORDER BY u WITH FILL STEP 0",
    }
    for why, sql in cases.items():
        with pytest.raises(UnsupportedClickHouseSQL):
            run_clickhouse_sql(spark, sql, SF_SMOKE).collect()
    # a fill key that is not an output column dies in the base query's
    # own analysis (ORDER BY nope) — Spark's error, equally honest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        run_clickhouse_sql(
            spark,
            "SELECT count() AS n FROM events ORDER BY nope WITH FILL",
            SF_SMOKE,
        ).collect()


def test_with_fill_contradictory_bounds_yield_no_fill(spark):
    """ADVICE r11: bounds inconsistent with the walk direction (DESC
    FROM 2 TO 8, ASC FROM 8 TO 2) used to hit sequence() with a
    sign-fighting step (opaque IllegalArgumentException).  ClickHouse
    generates no filled rows there — the ordered base comes back."""
    from clickbom_spark.dialect import run_clickhouse_sql

    spark.sql(
        "SELECT * FROM VALUES (9, 90), (6, 60), (2, 20) AS t(k, v)"
    ).createOrReplaceTempView("wfc_t")
    rows = run_clickhouse_sql(
        spark,
        "SELECT k, v FROM wfc_t ORDER BY k DESC WITH FILL FROM 2 TO 8",
        SF_SMOKE,
    ).collect()
    assert [(r.k, r.v) for r in rows] == [(9, 90), (6, 60), (2, 20)]
    rows2 = run_clickhouse_sql(
        spark,
        "SELECT k, v FROM wfc_t ORDER BY k WITH FILL FROM 8 TO 2",
        SF_SMOKE,
    ).collect()
    assert [(r.k, r.v) for r in rows2] == [(2, 20), (6, 60), (9, 90)]


def test_with_fill_interpolate_duplicate_key_carry_deterministic(spark):
    """ADVICE r11: duplicate fill-key rows with differing carried
    values now tie-break deterministically — the GREATEST carried
    tuple wins in both walk directions (ClickHouse carries 'the last
    row in its output order', itself unspecified under ties)."""
    from clickbom_spark.dialect import run_clickhouse_sql

    spark.sql(
        "SELECT * FROM VALUES (1, 30), (1, 10), (4, 40) AS t(k, v)"
    ).createOrReplaceTempView("wfdk_t")
    for _ in range(3):  # stable across replans
        rows = run_clickhouse_sql(
            spark,
            "SELECT k, v FROM wfdk_t ORDER BY k WITH FILL "
            "INTERPOLATE (v)",
            SF_SMOKE,
        ).collect()
        # both real k=1 rows survive; filled 2,3 carry max(v)=30
        assert sorted((r.k, r.v) for r in rows) == [
            (1, 10), (1, 30), (2, 30), (3, 30), (4, 40)
        ]


def test_distinct_on_compiles_via_limit_by(spark):
    """Round-12: ``SELECT DISTINCT ON (cols)`` compiles through the
    LIMIT 1 BY window (ClickHouse documents the equivalence) — it
    used to slip through as a bogus ON(cols) function call.  First
    row per key in the query's ORDER BY; trailing LIMIT composes;
    mixing with LIMIT n BY fails fast."""
    spark.sql(
        "SELECT * FROM VALUES (1,'a',10),(1,'b',5),(2,'c',7) AS t(k,s,v)"
    ).createOrReplaceTempView("don_ut")
    rows = spark.sql(translate_clickhouse_sql(
        "SELECT DISTINCT ON (k) k, s, v FROM don_ut ORDER BY k, v"
    )).collect()
    assert sorted((r.k, r.s, r.v) for r in rows) == [
        (1, "b", 5), (2, "c", 7)
    ]
    top = spark.sql(translate_clickhouse_sql(
        "SELECT DISTINCT ON (k) k, v FROM don_ut ORDER BY k, v DESC "
        "LIMIT 1"
    )).collect()
    assert [(r.k, r.v) for r in top] == [(1, 10)]
    with pytest.raises(UnsupportedClickHouseSQL, match="ambiguous"):
        translate_clickhouse_sql(
            "SELECT DISTINCT ON (k) k FROM don_ut LIMIT 2 BY k"
        )
    with pytest.raises(UnsupportedClickHouseSQL, match="key columns"):
        translate_clickhouse_sql("SELECT DISTINCT ON () k FROM don_ut")
    # plain DISTINCT is untouched
    assert "DISTINCT" in translate_clickhouse_sql(
        "SELECT DISTINCT k FROM don_ut"
    )


def test_apply_alter_ddl(spark, tmp_path):
    """Round-12 (VERDICT r11 item 7 groundwork): the reference's
    table-migration ALTER (entrypoint.sh:130-161) runs verbatim
    against a VersionedLake — metadata-only ADD COLUMN with the
    literal default surfacing on pre-evolution files, idempotent like
    the reference's system.columns probe, every other ALTER action
    fail-fast."""
    from clickbom_spark.dialect import apply_alter_ddl
    from clickbom_spark.ext.manifest import VersionedLake

    lake = VersionedLake.create(
        spark, str(tmp_path / "alter_lake"),
        spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING"),
        n_files=1,
    )
    # the reference's exact migration statement
    assert apply_alter_ddl(
        lake,
        "ALTER TABLE db.components ADD COLUMN source "
        "LowCardinality(String) DEFAULT 'unknown'",
    ) == "source"
    got = sorted((r.k, r.source) for r in lake.read().collect())
    assert got == [(1, "unknown"), (2, "unknown")]
    # idempotent: the column exists, so a re-run (even with a
    # different default) is the probe's "already exists" no-op
    v_before = lake.current_version()
    assert apply_alter_ddl(
        lake, "ALTER TABLE db.components ADD COLUMN source String "
        "DEFAULT 'x'",
    ) == "source"
    assert lake.current_version() == v_before
    # absent DEFAULT takes the ClickHouse type default
    apply_alter_ddl(lake, "ALTER TABLE t ADD COLUMN IF NOT EXISTS "
                          "n_extra UInt32")
    assert {r.n_extra for r in lake.read().collect()} == {0}
    # rows written AFTER the evolution carry real values
    lake.upsert(
        spark.createDataFrame(
            [(3, "c", "mend", 7)], "k INT, v STRING, source STRING, "
            "n_extra BIGINT",
        ),
        key_cols=["k"],
    )
    rows = {r.k: (r.source, r.n_extra) for r in lake.read().collect()}
    assert rows[3] == ("mend", 7) and rows[1] == ("unknown", 0)
    for bad, why in (
        ("ALTER TABLE t DROP COLUMN v", "ADD COLUMN only"),
        ("ALTER TABLE t ADD COLUMN x Decimal(10,2)", "supported types"),
        ("ALTER TABLE t ADD COLUMN y String DEFAULT now()",
         "literal defaults"),
        ("SELECT 1", "ALTER TABLE statement"),
    ):
        with pytest.raises(UnsupportedClickHouseSQL, match=why):
            apply_alter_ddl(lake, bad)


def test_hierarchy_depth_over_64_raises(spark):
    """ADVICE r11: an ancestor chain deeper than 64 links without a
    root used to be truncated SILENTLY (wrong dictGetHierarchy /
    dictIsIn answers) — it now fails fast."""
    from clickbom_spark.dialect import register_dictionary, run_clickhouse_sql

    deep = spark.createDataFrame(
        [(i, i + 1, f"n{i}") for i in range(1, 80)] + [(80, 0, "root")],
        "dk BIGINT, dp BIGINT, dn STRING",
    )
    register_dictionary(
        "deep_hier_ut", deep, key="dk", defaults={"dn": "''"},
        hierarchical="dp",
    )
    with pytest.raises(UnsupportedClickHouseSQL, match="64 links"):
        run_clickhouse_sql(
            spark,
            "SELECT dictGetHierarchy('deep_hier_ut', toInt64(1)) AS c "
            "FROM (SELECT 1 AS x)",
            SF_SMOKE,
        ).collect()


def test_integer_sample_resolves_via_rowcount(spark):
    """Round-10: SAMPLE n (integer row target) resolves to the
    hash-range fraction n/total at plan-build when the table's row
    count is registered — the statistic a VersionedLake manifest
    carries exactly (lake.row_count()), matching ClickHouse's
    approximate row-target semantics."""
    from clickbom_spark.dialect import register_sampling_rowcount

    total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    register_sampling_rowcount("documents", total)
    half = run_clickhouse_sql(
        spark,
        "SELECT count() AS n FROM documents SAMPLE 0.5",
        SF_SMOKE,
    ).collect()[0].n
    target = run_clickhouse_sql(
        spark,
        f"SELECT count() AS n FROM documents SAMPLE {total // 2}",
        SF_SMOKE,
    ).collect()[0].n
    assert target == half  # same resolved fraction, same hash members
    everything = run_clickhouse_sql(
        spark,
        f"SELECT count() AS n FROM documents SAMPLE {total * 10}",
        SF_SMOKE,
    ).collect()[0].n
    assert everything == total  # over-asking clamps to the whole table


def test_integer_sample_fail_fasts(spark):
    from clickbom_spark.dialect import register_sampling_rowcount

    # events has a sampling KEY but no registered row count
    with pytest.raises(UnsupportedClickHouseSQL, match="row count"):
        translate_clickhouse_sql("SELECT count() FROM events SAMPLE 1000")
    with pytest.raises(UnsupportedClickHouseSQL, match="fraction"):
        translate_clickhouse_sql("SELECT count() FROM events SAMPLE 1.5")
    register_sampling_rowcount("events", 100)
    with pytest.raises(UnsupportedClickHouseSQL, match="OFFSET"):
        translate_clickhouse_sql(
            "SELECT count() FROM events SAMPLE 10 OFFSET 0.5"
        )
    with pytest.raises(ValueError):
        register_sampling_rowcount("events2", 0)


def test_lake_row_count_feeds_integer_sample(spark, tmp_path):
    from clickbom_spark.dialect import register_sampling_rowcount
    from clickbom_spark.ext.manifest import VersionedLake

    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    lake = VersionedLake.create(spark, str(tmp_path / "lk"), df)
    assert lake.row_count() == 100  # manifest-only, no scan
    register_sampling_rowcount("lk_t", lake.row_count())
    from clickbom_spark.dialect import register_sampling_key

    register_sampling_key("lk_t", "k")
    lake.read().createOrReplaceTempView("lk_t")
    n = spark.sql(
        translate_clickhouse_sql("SELECT count() AS n FROM lk_t SAMPLE 30")
    ).collect()[0].n
    assert 10 <= n <= 60  # hash-approximate around the 30-row target


def test_dictget_shadowing_fail_fast():
    """Fifth-round-style review fix: a caller key expression naming a
    column the dictionary view owns would bind to the VIEW inside the
    correlated subquery (innermost scope) — a tautological predicate
    returning max(attr) over the whole dictionary.  Fail fast."""
    from clickbom_spark.dialect import register_dictionary

    register_dictionary(
        "dg_shadow", None, key="user_id", defaults={"v": "0"}
    )
    with pytest.raises(UnsupportedClickHouseSQL, match="bind to the dict"):
        translate_clickhouse_sql(
            "SELECT dictGet('dg_shadow', 'v', user_id) FROM events"
        )
    # non-colliding expressions still translate, view-qualified
    out = translate_clickhouse_sql(
        "SELECT dictGet('dg_shadow', 'v', event_id) FROM events"
    )
    assert "__dk.user_id = (event_id)" in out
    # arity check on dictHas raises the dialect error, not IndexError
    with pytest.raises(UnsupportedClickHouseSQL, match="dictionary, key"):
        translate_clickhouse_sql("SELECT dictHas('dg_shadow')")
    # ADVICE r10: a dictionary column name INSIDE A STRING LITERAL is
    # data, not a binding — no spurious fail-fast
    out = translate_clickhouse_sql(
        "SELECT dictGet('dg_shadow', 'v', "
        "if(event_type = 'user_id done''s', event_id, 0)) FROM events"
    )
    assert "__dk.user_id" in out


def test_sample_exponent_literals_fail_fast():
    with pytest.raises(UnsupportedClickHouseSQL, match="exponent"):
        translate_clickhouse_sql("SELECT count() FROM events SAMPLE 1e3")
    with pytest.raises(UnsupportedClickHouseSQL, match="exponent"):
        translate_clickhouse_sql("SELECT count() FROM events SAMPLE 5e-1")
    # SAMPLE 1 is the whole table: the clause strips, no per-row hash
    out = translate_clickhouse_sql("SELECT count(*) FROM events SAMPLE 1")
    assert "md5" not in out and "SAMPLE" not in out


def test_dict_view_materialization_word_boundary(spark):
    """'__dict_nation' must not be materialized by a query that only
    references '__dict_nation_ext' (prefix false-positive)."""
    from clickbom_spark.dialect import register_dictionary, run_clickhouse_sql

    register_dictionary("wb", None, key="k")  # unmaterializable
    register_dictionary(
        "wb_ext",
        "SELECT n_nationkey AS k, n_name AS nm FROM nation",
        key="k",
    )
    # only wb_ext is referenced: the sourceless 'wb' must NOT be
    # touched (a substring match would crash on None.createOrReplace…)
    df = run_clickhouse_sql(
        spark,
        "SELECT dictGetString('wb_ext', 'nm', s_nationkey) AS nm, "
        "count() AS n FROM supplier GROUP BY nm ORDER BY nm",
        SF_SMOKE,
    )
    assert df.count() > 0
    # referencing the sourceless one errors clearly
    with pytest.raises(UnsupportedClickHouseSQL, match="without a"):
        run_clickhouse_sql(
            spark,
            "SELECT dictGetOrNull('wb', 'k', s_nationkey) FROM supplier",
            SF_SMOKE,
        )


def test_json_extraction_family(spark):
    """JSONExtract* walk literal paths (ClickHouse 1-based indices →
    JSONPath 0-based), typed variants return the ClickHouse type
    default on a miss, simpleJSON*/visitParam* share the mapping."""
    spark.sql(
        """SELECT * FROM VALUES
           ('{"k": 7, "s": "hi", "f": 1.5, "b": true,
              "arr": [10, 20], "o": {"x": "deep"}}'),
           ('{"other": 1}') AS t(j)"""
    ).createOrReplaceTempView("js_t")
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT JSONExtractInt(j, 'k') AS k, "
            "JSONExtractString(j, 's') AS s, "
            "JSONExtractFloat(j, 'f') AS f, "
            "JSONExtractBool(j, 'b') AS b, "
            "JSONExtractInt(j, 'arr', 2) AS a2, "
            "JSONExtractString(j, 'o', 'x') AS deep, "
            "JSONHas(j, 'k') AS has_k, "
            "JSONLength(j, 'arr') AS alen, "
            "simpleJSONExtractInt(j, 'k') AS sk, "
            "visitParamExtractString(j, 's') AS vs "
            "FROM js_t ORDER BY k DESC"
        )
    ).collect()
    hit, miss = got
    assert (hit.k, hit.s, hit.f, hit.b) == (7, "hi", 1.5, True)
    assert (hit.a2, hit.deep, hit.has_k, hit.alen) == (20, "deep", True, 2)
    assert (hit.sk, hit.vs) == (7, "hi")
    # miss path: ClickHouse type defaults
    assert (miss.k, miss.s, miss.f, miss.b) == (0, "", 0.0, False)
    assert (miss.has_k, miss.alen) == (False, 0)


def test_json_fail_fasts():
    with pytest.raises(UnsupportedClickHouseSQL, match="dynamic"):
        translate_clickhouse_sql("SELECT JSONExtractString(j, key_col)")
    with pytest.raises(UnsupportedClickHouseSQL, match="1-based"):
        translate_clickhouse_sql("SELECT JSONExtractInt(j, 'a', 0)")
    with pytest.raises(UnsupportedClickHouseSQL, match="exactly"):
        translate_clickhouse_sql(
            "SELECT simpleJSONExtractInt(j, 'a', 'b')"
        )


def test_format_datetime(spark):
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT formatDateTime(TIMESTAMP '2024-03-05 07:08:09', "
            "'%Y-%m-%d %H:%i:%S') AS a, "
            "formatDateTime(TIMESTAMP '2024-03-05 07:08:09', "
            "'%F week %% T') AS b"
        )
    ).collect()[0]
    assert got.a == "2024-03-05 07:08:09"
    assert got.b == "2024-03-05 week % T"  # literals quoted, %% escapes
    with pytest.raises(UnsupportedClickHouseSQL, match="%f"):
        translate_clickhouse_sql(
            "SELECT formatDateTime(ts, '%f') FROM events"
        )
    # %M is version-split (minutes pre-23.1, MONTH NAME after) and %G
    # is the week-based year Spark bans — both fail fast
    with pytest.raises(UnsupportedClickHouseSQL, match="month name"):
        translate_clickhouse_sql(
            "SELECT formatDateTime(ts, '%H:%M') FROM events"
        )
    with pytest.raises(UnsupportedClickHouseSQL, match="week-based"):
        translate_clickhouse_sql(
            "SELECT formatDateTime(ts, '%G') FROM events"
        )
    with pytest.raises(UnsupportedClickHouseSQL, match="timezone"):
        translate_clickhouse_sql(
            "SELECT formatDateTime(ts, '%Y', 'UTC') FROM events"
        )


def test_format_datetime_e_space_pads(spark):
    """ADVICE r10: ClickHouse %e SPACE-pads single-digit days (' 5');
    Java 'd' renders '5' — the translator splices an lpad segment."""
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT formatDateTime(TIMESTAMP '2024-03-05 07:08:09', "
            "'%Y:%e:%m') AS a, "
            "formatDateTime(TIMESTAMP '2024-03-15 07:08:09', '%e') AS b, "
            "formatDateTime(TIMESTAMP '2024-03-05 07:08:09', '%e') AS c"
        )
    ).collect()[0]
    assert got.a == "2024: 5:03"
    assert got.b == "15"  # two-digit day: no padding
    assert got.c == " 5"  # single-digit day: space-padded


def test_extract_all_and_count_matches(spark):
    got = spark.sql(
        translate_clickhouse_sql(
            r"SELECT extractAll('a1 b22 c333', '\\d+') AS nums, "
            r"extractAll('k=1;m=2', '(\\w+)=') AS keys, "
            r"countMatches('a1 b22 c333', '\\d+') AS n"
        )
    ).collect()[0]
    assert got.nums == ["1", "22", "333"]
    assert got.keys == ["k", "m"]  # capture group 1 extracted
    assert got.n == 3
    with pytest.raises(UnsupportedClickHouseSQL, match="literal"):
        translate_clickhouse_sql("SELECT extractAll(s, pat) FROM t")


def test_array_and_misc_completions(spark):
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT arrayMin([3, 1, 2]) AS mn, arrayMax([3, 1, 2]) AS mx, "
            "arrayAvg([1, 2, 3, 6]) AS av, "
            "arrayEnumerate(['a', 'b', 'c']) AS en, "
            "arrayEnumerate(arraySlice(['a'], 1, 0)) AS en0, "
            "tuple(1, 'x') AS tp, materialize(42) AS m, "
            "ignore('anything', 1) AS ig"
        )
    ).collect()[0]
    assert (got.mn, got.mx, got.av) == (1, 3, 3.0)
    assert got.en == [1, 2, 3] and got.en0 == []
    assert got.tp == (1, "x") and got.m == 42 and got.ig == 0


def test_star_replace_apply_run_path(spark):
    """Round-10+: run_clickhouse_sql compiles * REPLACE / * APPLY over
    the resolved schema (the translate-only path keeps failing fast).
    REPLACE rewrites only the output expansion — WHERE still sees the
    original column; APPLY of an aggregate aggregates the base."""
    from clickbom_spark.dialect import run_clickhouse_sql

    # REPLACE: double the account balance in the OUTPUT only; the
    # WHERE filter applies to the stored value
    got = run_clickhouse_sql(
        spark,
        "SELECT * REPLACE (toInt64(round(s_acctbal * 100)) * 2 AS "
        "s_acctbal) FROM (SELECT * FROM supplier WHERE s_acctbal > 0 "
        "ORDER BY s_suppkey LIMIT 3)",
        SF_SMOKE,
    ).collect()
    raw = spark.sql(
        f"SELECT * FROM parquet.`{SF_SMOKE}/supplier.parquet` "
        "WHERE s_acctbal > 0 ORDER BY s_suppkey LIMIT 3"
    ).collect()
    assert [r.s_suppkey for r in got] == [r.s_suppkey for r in raw]
    for g, r in zip(got, raw):
        assert g.s_acctbal == round(r.s_acctbal * 100) * 2
    # column order and names preserved
    assert [f for f in got[0].asDict()] == [f for f in raw[0].asDict()]

    # APPLY(max): global aggregate per column, ClickHouse-style names
    agg = run_clickhouse_sql(
        spark,
        "SELECT * EXCEPT (s_name) APPLY (max) FROM supplier",
        SF_SMOKE,
    )
    row = agg.collect()[0]
    assert "max(s_suppkey)" in agg.columns
    want = spark.sql(
        f"SELECT max(s_suppkey) AS m FROM "
        f"parquet.`{SF_SMOKE}/supplier.parquet`"
    ).collect()[0].m
    assert row["max(s_suppkey)"] == want

    # chained REPLACE then APPLY: the modifier order composes
    chained = run_clickhouse_sql(
        spark,
        "SELECT * EXCEPT (s_name) "
        "REPLACE (s_suppkey * 10 AS s_suppkey) APPLY (max) "
        "FROM supplier",
        SF_SMOKE,
    ).collect()[0]
    assert chained["max(s_suppkey)"] == want * 10


def test_star_replace_apply_fail_fasts(spark):
    from clickbom_spark.dialect import run_clickhouse_sql

    # translate-only path still refuses
    with pytest.raises(UnsupportedClickHouseSQL, match="run_clickhouse_sql"):
        translate_clickhouse_sql(
            "SELECT * REPLACE (x AS y) FROM t"
        )
    # star chain must be the whole select list
    with pytest.raises(UnsupportedClickHouseSQL, match="ENTIRE"):
        run_clickhouse_sql(
            spark,
            "SELECT * REPLACE (s_suppkey AS s_suppkey), s_name "
            "FROM supplier",
            SF_SMOKE,
        )
    # replacing a column outside the expansion
    with pytest.raises(UnsupportedClickHouseSQL, match="not in the"):
        run_clickhouse_sql(
            spark,
            "SELECT * REPLACE (1 AS nope) FROM supplier",
            SF_SMOKE,
        )
    # malformed REPLACE item
    with pytest.raises(UnsupportedClickHouseSQL, match="expr AS column"):
        run_clickhouse_sql(
            spark,
            "SELECT * REPLACE (s_suppkey) FROM supplier",
            SF_SMOKE,
        )
    # lambda APPLY not compiled
    with pytest.raises(UnsupportedClickHouseSQL, match="one function"):
        run_clickhouse_sql(
            spark,
            "SELECT * APPLY (x -> x + 1) FROM supplier",
            SF_SMOKE,
        )


def test_limit_offset_forms(spark):
    """ClickHouse's comma spellings: plain LIMIT m, n compiles to
    LIMIT n OFFSET m; LIMIT m, n BY pages WITHIN each group
    (m < rn <= m + n)."""
    spark.sql(
        "SELECT * FROM VALUES ('a',1),('a',2),('a',3),('b',4),('b',5) "
        "AS t(g, x)"
    ).createOrReplaceTempView("lc_t")
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT x FROM lc_t ORDER BY x LIMIT 1, 3"
        )
    ).collect()
    assert [r.x for r in got] == [2, 3, 4]
    got2 = spark.sql(
        translate_clickhouse_sql(
            "SELECT g, x FROM lc_t ORDER BY g, x LIMIT 1, 2 BY g"
        )
    ).collect()
    # per group, skip 1 keep 2: a -> 2,3; b -> 5
    assert sorted((r.g, r.x) for r in got2) == [
        ("a", 2), ("a", 3), ("b", 5)
    ]
    with pytest.raises(UnsupportedClickHouseSQL, match="integer"):
        translate_clickhouse_sql("SELECT x FROM t LIMIT 1.5, 3")


def test_untuple_and_state_merge_pointers(spark):
    spark.sql(
        "SELECT named_struct('p', 1, 'q', 'y') AS s, 9 AS z"
    ).createOrReplaceTempView("ut_t")
    got = spark.sql(
        translate_clickhouse_sql("SELECT z, untuple(s) FROM ut_t")
    ).collect()[0]
    assert (got.z, got.p, got.q) == (9, 1, "y")
    # order-statistic / top-k states still fail fast toward the
    # engine's mergeable sketches (uniq/uniqExact states are compiled
    # since round 12 — see test_state_merge_uniq), as do the
    # SimpleState spellings ClickHouse itself disallows (avg/count
    # are not SimpleAggregateFunction)
    for bad in ("quantileState(x)", "medianState(x)",
                "avgSimpleState(x)", "countSimpleState()",
                "topKMerge(s)", "uniqSimpleState(x)"):
        with pytest.raises(UnsupportedClickHouseSQL, match="MERGEABLE"):
            translate_clickhouse_sql(f"SELECT {bad} FROM t")


def test_dict_hierarchy_family(spark):
    """Round-11 (VERDICT r10 item 6): dictGetHierarchy / dictIsIn /
    dictGetChildren / dictGetDescendants compile against the
    ancestor-chain closure of a dictionary registered with
    hierarchical=<parent attr>."""
    from clickbom_spark.dialect import register_dictionary, run_clickhouse_sql

    df = spark.createDataFrame(
        [(1, 0, "root"), (2, 1, "a"), (3, 1, "b"), (4, 2, "aa"),
         (5, 99, "orphan")],
        "hid BIGINT, hpid BIGINT, hnm STRING",
    )
    register_dictionary(
        "hier_ut", df, key="hid", defaults={"hnm": "''"},
        hierarchical="hpid",
    )
    got = {
        r.k: r
        for r in run_clickhouse_sql(
            spark,
            """
            SELECT k,
                   dictGetHierarchy('hier_ut', k) AS chain,
                   dictIsIn('hier_ut', k, toInt64(1)) AS under1,
                   dictGetChildren('hier_ut', k) AS kids,
                   dictGetDescendants('hier_ut', k) AS descs
            FROM (SELECT toInt64(event_id % 6) AS k FROM events
                  WHERE event_id < 6)
            """,
            SF_SMOKE,
        ).collect()
    }
    # registered chains walk to the root; an id absent from the
    # dictionary falls back to the one-element chain; an absent
    # PARENT id appears once then the walk stops (ClickHouse order)
    assert got[4].chain == [4, 2, 1] and got[2].chain == [2, 1]
    assert got[0].chain == [0] and got[5].chain == [5, 99]
    # dictIsIn includes the key itself (the chain starts at child)
    assert got[1].under1 is True and got[4].under1 is True
    assert got[5].under1 is False
    # children = immediate; descendants = closure minus self (sorted)
    assert got[1].kids == [2, 3] and got[1].descs == [2, 3, 4]
    assert got[2].kids == [4] and got[2].descs == [4]
    assert got[4].kids == [] and got[4].descs == []


def test_dict_hierarchy_fail_fasts():
    from clickbom_spark.dialect import register_dictionary

    register_dictionary("flat_ut", None, key="fk", defaults={"fv": "0"})
    register_dictionary("hier_ff_ut", None, key="hk", hierarchical="hp")
    with pytest.raises(UnsupportedClickHouseSQL, match="hierarchical"):
        translate_clickhouse_sql(
            "SELECT dictGetHierarchy('flat_ut', x) FROM t"
        )
    with pytest.raises(UnsupportedClickHouseSQL, match="single-column"):
        register_dictionary(
            "two_key_hier", None, key=("a", "b"), hierarchical="p"
        )
    with pytest.raises(UnsupportedClickHouseSQL, match="level"):
        translate_clickhouse_sql(
            "SELECT dictGetDescendants('hier_ff_ut', x, 2) FROM t"
        )


def test_state_merge_simple_algebra(spark):
    """Round-11 (VERDICT r10 item 5): the SIMPLE -State/-Merge algebra
    compiles — sum/count/min/max/avg states are named-struct partial
    folds, -Merge re-aggregates them, -MergeState re-aggregates to a
    NEW state, and merged results equal the direct rescan (the
    AggregatingMergeTree materialized-view pattern)."""
    spark.sql(
        "SELECT * FROM VALUES (1, 10), (1, 20), (2, 5), (2, NULL) "
        "AS t(k, v)"
    ).createOrReplaceTempView("smt")
    # states per k, then a second MergeState hop, then final Merge —
    # two merge levels must still equal the direct aggregate
    spark.sql(translate_clickhouse_sql(
        "SELECT k, sumState(v) AS ss, countState() AS cs, "
        "countState(v) AS cvs, avgState(v) AS avs, minState(v) AS ms, "
        "maxState(v) AS xs FROM smt GROUP BY k"
    )).createOrReplaceTempView("smt_states")
    spark.sql(translate_clickhouse_sql(
        "SELECT sumMergeState(ss) AS ss, countMergeState(cs) AS cs, "
        "countMergeState(cvs) AS cvs, avgMergeState(avs) AS avs, "
        "minMergeState(ms) AS ms, maxMergeState(xs) AS xs "
        "FROM smt_states"
    )).createOrReplaceTempView("smt_states2")
    got = spark.sql(translate_clickhouse_sql(
        "SELECT sumMerge(ss) AS s, countMerge(cs) AS c, "
        "countMerge(cvs) AS cv, avgMerge(avs) AS a, "
        "minMerge(ms) AS lo, maxMerge(xs) AS hi FROM smt_states2"
    )).collect()[0]
    # direct rescan: sum=35, rows=4, non-null v=3, avg=35/3, min=5,
    # max=20 (avgState's count skips the NULL like ClickHouse avg)
    assert (got.s, got.c, got.cv, got.lo, got.hi) == (35, 4, 3, 5, 20)
    assert got.a == 35 / 3
    # SimpleState is the unwrapped value (SimpleAggregateFunction)
    simple = spark.sql(translate_clickhouse_sql(
        "SELECT sumSimpleState(v) AS sv, minSimpleState(v) AS mv "
        "FROM smt"
    )).collect()[0]
    assert (simple.sv, simple.mv) == (35, 5)


def test_state_merge_null_states_coalesce_to_zero(spark):
    """ADVICE r11: countMerge/sumMerge over a frame where every state
    is NULL (outer-join feed) or over empty input must return 0, like
    ClickHouse — not NULL."""
    spark.sql(
        "SELECT CAST(NULL AS STRUCT<s: BIGINT>) AS ss, "
        "CAST(NULL AS STRUCT<c: BIGINT>) AS cs"
    ).createOrReplaceTempView("smt_null_states")
    got = spark.sql(translate_clickhouse_sql(
        "SELECT sumMerge(ss) AS s, countMerge(cs) AS c "
        "FROM smt_null_states"
    )).collect()[0]
    assert (got.s, got.c) == (0, 0)
    empty = spark.sql(translate_clickhouse_sql(
        "SELECT sumMerge(ss) AS s, countMerge(cs) AS c "
        "FROM smt_null_states WHERE 1 = 0"
    )).collect()[0]
    assert (empty.s, empty.c) == (0, 0)


def test_state_merge_uniq(spark):
    """Round-12 (VERDICT r11 item 3): uniqState/uniqMerge compile
    through the portable bounded HLL code-set state, uniqExactState/
    uniqExactMerge through the distinct-value set.  Laws: merge of
    per-day partial states == direct rescan (the AggregatingMergeTree
    MV contract), a MergeState hop preserves the result, the exact
    twin equals count(DISTINCT), the estimate lands inside the
    1.04/sqrt(256) band, and empty input merges to 0."""
    sf = SF_SMOKE
    spark.read.parquet(f"{sf}/orders.parquet").createOrReplaceTempView(
        "smu_orders"
    )
    spark.sql(translate_clickhouse_sql(
        "SELECT toDate(o_orderdate) AS d, uniqState(o_custkey) AS us, "
        "uniqExactState(o_custkey) AS es FROM smu_orders GROUP BY d"
    )).createOrReplaceTempView("smu_states")
    got = spark.sql(translate_clickhouse_sql(
        "SELECT uniqMerge(us) AS u, uniqExactMerge(es) AS e "
        "FROM smu_states"
    )).collect()[0]
    direct = spark.sql(translate_clickhouse_sql(
        "SELECT uniqMerge(us) AS u FROM (SELECT uniqState(o_custkey) "
        "AS us FROM smu_orders)"
    )).collect()[0].u
    via_hop = spark.sql(translate_clickhouse_sql(
        "SELECT uniqMerge(m) AS u FROM (SELECT uniqMergeState(us) AS m "
        "FROM smu_states)"
    )).collect()[0].u
    exact = spark.sql(
        "SELECT count(DISTINCT o_custkey) AS c FROM smu_orders"
    ).collect()[0].c
    assert got.u == direct == via_hop
    assert got.e == exact
    assert abs(got.u - exact) <= 4 * 1.04 / 16 * exact + 2
    # exact MergeState hop preserves the set
    via_exact_hop = spark.sql(translate_clickhouse_sql(
        "SELECT uniqExactMerge(m) AS e FROM "
        "(SELECT uniqExactMergeState(es) AS m FROM smu_states)"
    )).collect()[0].e
    assert via_exact_hop == exact
    # empty input: ClickHouse uniqMerge of nothing is 0
    zero = spark.sql(translate_clickhouse_sql(
        "SELECT uniqMerge(us) AS u, uniqExactMerge(es) AS e "
        "FROM smu_states WHERE 1 = 0"
    )).collect()[0]
    assert (zero.u, zero.e) == (0, 0)
    # the state is BOUNDED: every code is in [1, 255*64+53] and the
    # per-group set can never exceed m*53 entries
    st = spark.sql(translate_clickhouse_sql(
        "SELECT uniqState(o_custkey) AS us FROM smu_orders"
    )).collect()[0].us
    assert 0 < len(st) <= 256 * 53
    assert all(1 <= c <= 255 * 64 + 53 for c in st)
    # multi-argument approximate states are not compiled (the code
    # packs ONE value) — fail fast with the tuple hint
    with pytest.raises(UnsupportedClickHouseSQL, match="single-argument"):
        translate_clickhouse_sql("SELECT uniqState(a, b) FROM t")


def test_star_chain_refuses_wrong_frames(spark):
    """Review fixes: a star chain inside a UNION branch, or combined
    with top-level ORDER BY/LIMIT, would post-project the WRONG frame
    (ClickHouse rewrites the select list before limiting) — refuse."""
    from clickbom_spark.dialect import run_clickhouse_sql

    for bad in (
        "SELECT s_suppkey FROM supplier UNION ALL "
        "SELECT * REPLACE (s_suppkey * 2 AS s_suppkey) FROM supplier",
        "SELECT * APPLY (max) FROM supplier LIMIT 10",
        "SELECT * REPLACE (0 - s_suppkey AS s_suppkey) FROM supplier "
        "ORDER BY s_suppkey",
    ):
        with pytest.raises(UnsupportedClickHouseSQL, match="wrong frame"):
            run_clickhouse_sql(spark, bad, SF_SMOKE)


def test_regex_group_detection(spark):
    """Review fixes: named groups ARE capturing (RE2), a '(' inside a
    character class is NOT, and extract/extractAll share one scanner."""
    got = spark.sql(
        translate_clickhouse_sql(
            r"SELECT extractAll('k=1;m=2', '(?<k>\\w+)=') AS named, "
            r"extractAll('(a) (b)', '[(]\\w[)]') AS klass, "
            r"extract('k=1', '(?<k>\\w+)=') AS named1, "
            r"extractAll('xa xb', '(?:x)(a|b)') AS noncap"
        )
    ).collect()[0]
    assert got.named == ["k", "m"]      # named group -> group 1
    assert got.klass == ["(a)", "(b)"]  # class '(' is not a group
    assert got.named1 == "k"
    assert got.noncap == ["a", "b"]     # (?:) skipped, real group used


def test_json_raw_and_array_avg_empty(spark):
    """Review fixes: JSONExtractRaw returns '' on a miss (ClickHouse
    type default); arrayAvg of an empty array is NaN, not NULL."""
    import math

    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT JSONExtractRaw('{\"a\": 1}', 'missing') AS raw, "
            "arrayAvg(arraySlice([1], 1, 0)) AS av"
        )
    ).collect()[0]
    assert got.raw == ""
    assert math.isnan(got.av)


def test_length_polymorphism(spark):
    """ClickHouse length()/empty()/notEmpty() accept strings AND
    arrays; the translated argument's head routes to size() when it is
    a known array producer, length() otherwise."""
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT length('abc') AS ls, "
            "length(splitByChar(' ', 'a b c')) AS la, "
            "length(extractAll('x1 y2', '[a-z]')) AS lr, "
            "empty('') AS es, empty([1, 2]) AS ea, "
            "notEmpty('x') AS ns"
        )
    ).collect()[0]
    assert (got.ls, got.la, got.lr) == (3, 3, 2)
    assert (got.es, got.ea, got.ns) == (True, False, True)


def test_review_fixes_r12_batch(spark):
    """Post-batch review fixes: arrayPartialSort preserves SIZE (the
    ClickHouse contract — first k sorted, rest unspecified), empty()/
    notEmpty() recurse arrayness through polymorphic heads
    (arrayConcat→concat, arrayReverse→reverse), transform() compiles
    a simple CASE (x evaluated once), and non-literal transform
    arrays fail fast instead of mis-slicing."""
    got = spark.sql(
        translate_clickhouse_sql(
            "SELECT length(arrayPartialSort(2, [5, 3, 4, 1])) AS n, "
            "arrayPartialSort(2, [5, 3, 4, 1])[1:2]? NULL : NULL"
            .replace("[1:2]? NULL : NULL", " AS s")
        )
    ).collect()[0]
    assert got.n == 4  # size-preserving
    assert got.s[:2] == [1, 3]  # k-prefix sorted
    got2 = spark.sql(
        translate_clickhouse_sql(
            "SELECT empty(arrayConcat([1], [2])) AS ec, "
            "notEmpty(arrayReverse(splitByChar(' ', 'a b'))) AS nr"
        )
    ).collect()[0]
    assert (got2.ec, got2.nr) == (False, True)
    out = translate_clickhouse_sql(
        "SELECT transform(x, [1, 2], [10, 20], 0) FROM t"
    )
    assert "CASE (x) WHEN 1 THEN 10" in out  # simple-CASE, x once
    with pytest.raises(UnsupportedClickHouseSQL, match="literals"):
        translate_clickhouse_sql(
            "SELECT transform(x, ['a'] || ['b'], ['p'], 'd') FROM t"
        )


# ---------------------------------------------------------------------------
# Round-12 sweep 4: passthrough closure.  Before this sweep every name
# here reached Spark's analyzer verbatim — either dying later as an
# unresolved routine or, for the same-named-different-semantics
# collisions (locate / bin / numeric hex), silently returning
# ClickHouse-wrong answers.
# ---------------------------------------------------------------------------


def test_sweep4_silent_collision_closures():
    """locate/bin/unbin/numeric-hex MUST fail fast: Spark resolves the
    names (or would after lowering) with different semantics —
    locate's argument order flipped across ClickHouse versions, and
    bin/hex pad to the source type's width that the BIGINT erasure
    loses."""
    for sql, hint in [
        ("SELECT locate('x', s) FROM t", "argument order"),
        ("SELECT bin(x) FROM t", "bit width"),
        ("SELECT unbin(s) FROM t", "raw bytes"),
        ("SELECT hex(255) FROM t", "byte width"),
        ("SELECT version() FROM t", "Spark version"),
        ("SELECT toTypeName(x) FROM t", "vocabulary"),
        ("SELECT erf(x) FROM t", "libm"),
        ("SELECT arrayShiftLeft(a, 1) FROM t", "explicit pad"),
        ("SELECT geoDistance(1, 2, 3, 4) FROM t", "libm trig"),
        ("SELECT studentTTest(x, g) FROM t", "q_student_ttest"),
        ("SELECT mannWhitneyUTest(x, g) FROM t", "q_mann_whitney"),
        ("SELECT arrayAUC(a, b) FROM t", "q_model_auc"),
        ("SELECT isIPAddressInRange(s, c) FROM t", "literal"),
        ("SELECT IPv6StringToNum(s) FROM t", "IPv4-only"),
        ("SELECT dateName(p, d) FROM t", "literal part"),
        ("SELECT dateName('era', d) FROM t", "supported surface"),
        ("SELECT toUnixTimestamp64Nano(ts) FROM t", "microsecond"),
        ("SELECT makeDateTime(1, 2, 3, 4, 5, 6, 'UTC') FROM t",
         "timezone argument"),
        ("SELECT timezoneOf(ts) FROM t", "naive"),
        ("SELECT byteSwap(x) FROM t", "byte width"),
        ("SELECT fuzzBits(s, 0.1) FROM t", "nondeterministic"),
        ("SELECT normalizeQuery(s) FROM t", "query-log"),
        ("SELECT minSampleSizeConversion(0.1, 0.05, 0.8, 0.05) "
         "FROM t", "power analysis"),
        ("SELECT jsonMergePatch(a, b) FROM t", "map_concat"),
        ("SELECT geohashEncode(lon, lat) FROM t", "geospatial"),
        ("SELECT fromDaysSinceYearZero(n) FROM t", "year-zero"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=hint):
            translate_clickhouse_sql(sql)
    # hex of strings/binary stays exact passthrough
    assert "hex(s)" in translate_clickhouse_sql("SELECT hex(s) FROM t")


def test_sweep4_translation_pins():
    """Representative text pins — one per compile family."""
    for sql, frag in [
        ("SELECT substringIndex(s, '.', 2) FROM t", "substring_index"),
        ("SELECT regexpExtract(s, 'p') FROM t",
         "regexp_extract(s, 'p', 1)"),
        ("SELECT arrayRotateLeft(a, 2) FROM t", "pmod"),
        ("SELECT arrayUnion(a, b, c) FROM t", "array_distinct(concat"),
        ("SELECT widthBucket(x, 0, 10, 5) FROM t", "width_bucket"),
        ("SELECT roundAge(x) FROM t", "WHEN (x) <= 17 THEN 17"),
        ("SELECT sumKahan(x) FROM t", "sum(x)"),
        ("SELECT any_respect_nulls(x) FROM t", "any_value(x, false)"),
        ("SELECT toStartOfFifteenMinutes(ts) FROM t", "DIV 900"),
        ("SELECT toUnixTimestamp64Milli(ts) FROM t", "unix_millis"),
        ("SELECT makeDate(2024, 60) FROM t", "date_add(make_date"),
        ("SELECT YYYYMMDDToDate(n) FROM t", "try_to_date"),
        ("SELECT IPv4NumToString(n) FROM t", "shiftright"),
        ("SELECT isIPAddressInRange(s, '10.0.0.0/8') FROM t",
         "BETWEEN 167772160 AND 184549375"),
        ("SELECT bitPositionsToArray(x) FROM t", "getbit"),
        ("SELECT UUIDv7ToDateTime(u) FROM t", "conv("),
        ("SELECT toJSONString(x) FROM t", "to_json"),
        ("SELECT serverTimezone() FROM t", "current_timezone()"),
        ("SELECT currentUser() FROM t", "current_user()"),
        ("SELECT clamp(x, 0, 1) FROM t", "least(greatest"),
        ("SELECT exp2(x) FROM t", "power(CAST(2 AS DOUBLE)"),
        ("SELECT intExp2(x) FROM t", "shiftleft(CAST(1 AS BIGINT)"),
    ]:
        assert frag in translate_clickhouse_sql(sql), sql


def test_sweep4_executes_exactly(spark):
    """Value-level checks for the compiles whose semantics carry edge
    cases (rotation wrap, shift overflow, subsequence bounds, CIDR
    fold, epoch clamps, UUIDv7 timestamp prefix)."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW sweep4_t AS SELECT * FROM VALUES"
        " (array(1, 2, 3, 4), array(3, 4, 5), '192.168.1.77',"
        "  CAST('2024-03-15 13:47:23' AS TIMESTAMP),"
        "  '0190b6e5-9d3a-7abc-8000-000000000000',"
        "  CAST(167772161 AS BIGINT))"
        " AS sweep4_t(a, b, ip, ts, u, n)"
    )

    def one(sql):
        return spark.sql(translate_clickhouse_sql(sql)).collect()[0][0]

    assert one("SELECT arrayRotateLeft(a, 6) FROM sweep4_t") == [3, 4, 1, 2]
    assert one("SELECT arrayRotateLeft(a, -1) FROM sweep4_t") == [4, 1, 2, 3]
    assert one("SELECT arrayShiftLeft(a, 2, 0) FROM sweep4_t") == [3, 4, 0, 0]
    assert one("SELECT arrayShiftRight(a, 2, 0) FROM sweep4_t") == [0, 0, 1, 2]
    assert one("SELECT arrayShiftLeft(a, 7, 0) FROM sweep4_t") == [0, 0, 0, 0]
    assert one("SELECT arrayUnion(a, b) FROM sweep4_t") == [1, 2, 3, 4, 5]
    assert one("SELECT arraySymmetricDifference(a, b) FROM sweep4_t") == [
        1, 2, 5]
    assert abs(one("SELECT arrayJaccardIndex(a, b) FROM sweep4_t") - 0.4) < 1e-12
    assert one(
        "SELECT arrayEnumerateDense(array(10, 20, 10, 30)) FROM sweep4_t"
    ) == [1, 2, 1, 3]
    assert one("SELECT hasSubstr(a, array(2, 3)) FROM sweep4_t") is True
    assert one("SELECT hasSubstr(a, array(2, 4)) FROM sweep4_t") is False
    assert one("SELECT hasSubstr(a, array()) FROM sweep4_t") is True
    assert one("SELECT tokens('ab, cd!ef') FROM sweep4_t") == [
        "ab", "cd", "ef"]
    assert one("SELECT ngrams('abcd', 3) FROM sweep4_t") == ["abc", "bcd"]
    assert one("SELECT ngrams('ab', 3) FROM sweep4_t") == []
    assert str(one("SELECT toLastDayOfWeek(ts) FROM sweep4_t")) == (
        "2024-03-16")  # Saturday of the Sunday-start week
    assert one(
        "SELECT toModifiedJulianDay('1858-11-17') FROM sweep4_t") == 0
    assert str(one(
        "SELECT fromModifiedJulianDay(51544) FROM sweep4_t"
    )) == "2000-01-01"
    assert str(one("SELECT makeDate(2024, 60) FROM sweep4_t")) == (
        "2024-02-29")
    assert str(one(
        "SELECT YYYYMMDDToDate(20241399) FROM sweep4_t"
    )) == "1970-01-01"  # invalid packed int clamps to the epoch
    assert one("SELECT dateName('weekday', ts) FROM sweep4_t") == "Friday"
    assert one("SELECT roundAge(22) FROM sweep4_t") == 18
    assert one("SELECT roundDuration(250) FROM sweep4_t") == 240
    assert one("SELECT roundDuration(0) FROM sweep4_t") == 0
    assert one("SELECT IPv4NumToString(n) FROM sweep4_t") == "10.0.0.1"
    assert one("SELECT IPv4StringToNum(ip) FROM sweep4_t") == 3232235853
    assert one("SELECT isIPv4String('999.1.1.1') FROM sweep4_t") is False
    assert one(
        "SELECT isIPAddressInRange(ip, '192.168.0.0/16') FROM sweep4_t"
    ) is True
    assert one(
        "SELECT isIPAddressInRange(ip, '10.0.0.0/8') FROM sweep4_t"
    ) is False
    assert one(
        "SELECT bitPositionsToArray(CAST(10 AS BIGINT)) FROM sweep4_t"
    ) == [1, 3]
    assert one(
        "SELECT bitmaskToList(CAST(10 AS BIGINT)) FROM sweep4_t") == "2,8"
    # RFC 9562: the v7 prefix is the big-endian unix-millis timestamp
    assert str(one("SELECT UUIDv7ToDateTime(u) FROM sweep4_t")).startswith(
        "2024-07-1")
    assert one("SELECT singleValueOrNull(ip) FROM sweep4_t") == (
        "192.168.1.77")
    assert one("SELECT timeSlots(ts, 3600, 1800) FROM sweep4_t") is not None
    assert len(one("SELECT timeSlots(ts, 3600, 1800) FROM sweep4_t")) == 3


def test_sweep5_translation_pins():
    """Round-12 sweep 5 — second passthrough-closure pass."""
    for sql, frag in [
        ("SELECT hasToken(s, 'tok') FROM t", "RLIKE"),
        ("SELECT ilike(s, '%A%') FROM t", "ilike(s, '%A%')"),
        ("SELECT notILike(s, '%A%') FROM t", "NOT ilike"),
        ("SELECT extractGroups(s, '(a)(b)') FROM t",
         "regexp_extract(s, '(a)(b)', 2)"),
        ("SELECT splitByRegexp('[,;]', s) FROM t",
         "split(s, '[,;]', -1)"),
        ("SELECT editDistanceUTF8(a, b) FROM t", "levenshtein"),
        ("SELECT mid(s, 2, 3) FROM t", "substring(s, 2, 3)"),
        ("SELECT arrayFirstOrNull(x -> x > 1, a) FROM t",
         "try_element_at(filter(a, x -> x > 1), 1)"),
        ("SELECT arrayFirstIndex(x -> x > 1, a) FROM t",
         "array_position(transform(a, x -> x > 1), true)"),
        ("SELECT arrayReduce('sum', a) FROM t", "aggregate"),
        ("SELECT mapContainsKey(m, 'k') FROM t", "map_contains_key"),
        ("SELECT mapExists((k, v) -> v > 1, m) FROM t",
         "cardinality(map_filter(m, (k, v) -> v > 1)) > 0"),
        ("SELECT javaHash(s) FROM t", "xxhash64"),
        ("SELECT randBernoulli(0.5) FROM t", "rand() < (0.5)"),
        ("SELECT sign(x) FROM t", "CAST(sign(x) AS BIGINT)"),
        ("SELECT sigmoid(x) FROM t", "1.0 + exp(-(x))"),
        ("SELECT char(72) FROM t", "char(72)"),
        ("SELECT format('{}!', a) FROM t",
         "format_string('%1$s!', a)"),
        ("SELECT toTime(ts) FROM t", "86400 + pmod"),
        ("SELECT dateTrunc('month', ts) FROM t",
         "date_trunc('month', ts)"),
        ("SELECT timestampSub(MINUTE, 5, ts) FROM t", "INTERVAL 1 MINUTE"),
        ("SELECT addQuarters(ts, 2) FROM t",
         "make_interval(0, CAST(2 AS INT) * 3)"),
        ("SELECT toDate32OrZero(s) FROM t", "DATE '1900-01-01'"),
        ("SELECT firstDayOfMonth(d) FROM t", "date_trunc('MONTH'"),
        ("SELECT toRelativeMonthNum(ts) FROM t",
         "year(ts) * 12 + month(ts)"),
    ]:
        assert frag in translate_clickhouse_sql(sql), sql


def test_sweep5_fail_fasts():
    for sql, hint in [
        ("SELECT hasToken(s, c) FROM t", "literal"),
        ("SELECT damerauLevenshteinDistance(a, b) FROM t", "DP"),
        ("SELECT ngramSimHash(s) FROM t", "q_simhash_pairs"),
        ("SELECT ngramMinHash(s) FROM t", "q_minhash_lsh_dedup"),
        ("SELECT detectLanguage(s) FROM t", "q_lang_id"),
        ("SELECT stem('en', s) FROM t", "NLP"),
        ("SELECT normalizeUTF8NFC(s) FROM t", "ICU"),
        ("SELECT arrayFirst(x -> x > 1, a) FROM t",
         "arrayFirstOrNull"),
        ("SELECT arraySplit((x, y) -> y, a, b) FROM t", "explode"),
        ("SELECT arrayReduce('median', a) FROM t", "engine"),
        ("SELECT arrayReduce(agg_name, a) FROM t", "literal"),
        ("SELECT mapApply((k, v) -> (k, v), m) FROM t",
         "transform_keys"),
        ("SELECT mapConcat(m1, m2) FROM t", "map_zip_with"),
        ("SELECT murmurHash3_128(s) FROM t", "128-bit"),
        ("SELECT randomString(8) FROM t", "deterministic surface"),
        ("SELECT bitRotateLeft(x, 2) FROM t", "bit width"),
        ("SELECT char(200) FROM t", "ASCII"),
        ("SELECT char(h) FROM t", "ASCII"),
        ("SELECT format('{bad}', a) FROM t", "placeholder"),
        ("SELECT base58Encode(s) FROM t", "Base58"),
        ("SELECT mortonEncode(a, b) FROM t", "q_zorder_cluster"),
        ("SELECT toRelativeWeekNum(ts) FROM t", "anchor"),
        ("SELECT toDateTime64(s, 9) FROM t", "microsecond"),
        ("SELECT addNanoseconds(ts, 5) FROM t", "microsecond"),
        ("SELECT kolmogorovSmirnovTest(x, g) FROM t", "q_ks_test"),
        ("SELECT entropy(x) FROM t", "q_entropy_shannon"),
        ("SELECT groupArrayIntersect(a) FROM t", "explode"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=hint):
            translate_clickhouse_sql(sql)


def test_sweep5_executes_exactly(spark):
    """Value-level checks for the sweep-5 compiles with edge cases
    (token boundaries, running-floor fold, last-index reversal, map
    zip NULL fill, byte-wise char, positional format)."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW sweep5_t AS SELECT * FROM VALUES"
        " ('the Quick brown fox', array(1, -2, 3, -4),"
        "  CAST('2024-03-15 13:47:23' AS TIMESTAMP),"
        "  map('a', 1, 'b', 5), map('a', 2, 'c', 7))"
        " AS sweep5_t(s, a, ts, m1, m2)"
    )

    def one(sql):
        return spark.sql(translate_clickhouse_sql(sql)).collect()[0][0]

    assert one("SELECT hasToken(s, 'Quick') FROM sweep5_t") is True
    assert one("SELECT hasToken(s, 'Quic') FROM sweep5_t") is False
    assert one(
        "SELECT hasTokenCaseInsensitive(s, 'QUICK') FROM sweep5_t"
    ) is True
    assert one(
        "SELECT splitByRegexp('[,;]', 'a,b;c,') FROM sweep5_t"
    ) == ["a", "b", "c", ""]  # trailing empty kept
    assert one("SELECT firstLine('l1\\nl2') FROM sweep5_t") == "l1"
    assert one("SELECT arrayCumSumNonNegative(a) FROM sweep5_t") == [
        1, 0, 3, 0]  # running sum floors at 0
    assert one("SELECT arrayReduce('sum', a) FROM sweep5_t") == -2
    assert one(
        "SELECT arrayFirstOrNull(x -> x > 99, a) FROM sweep5_t"
    ) is None
    assert one("SELECT arrayLastIndex(x -> x < 0, a) FROM sweep5_t") == 4
    assert one("SELECT arrayLastIndex(x -> x > 99, a) FROM sweep5_t") == 0
    assert one(
        "SELECT arrayEnumerateUniq(array(10, 20, 10, 10)) FROM sweep5_t"
    ) == [1, 1, 2, 3]
    assert dict(one("SELECT mapSubtract(m1, m2) FROM sweep5_t")) == {
        "a": -1, "b": 5, "c": -7}  # absent keys fill with 0
    assert one("SELECT mapAll((k, v) -> v > 0, m1) FROM sweep5_t") is True
    assert one("SELECT char(72, 73) FROM sweep5_t") == "HI"
    assert one(
        "SELECT format('{1}-{0}', 'a', 'b') FROM sweep5_t") == "b-a"
    assert str(one("SELECT toTime(ts) FROM sweep5_t")).startswith(
        "1970-01-02 13:47:23")
    assert str(one(
        "SELECT timestampSub(MINUTE, 5, ts) FROM sweep5_t"
    )).startswith("2024-03-15 13:42:23")
    assert str(one("SELECT addQuarters(ts, 1) FROM sweep5_t")).startswith(
        "2024-06-15")
    assert str(one(
        "SELECT toDate32OrZero('bogus') FROM sweep5_t")) == "1900-01-01"


def test_sweep6_translation_pins():
    """Round-12 sweep 6 — combinators, named operators, multi-search,
    vector leftovers, AES, ISO-calendar leftovers."""
    for sql, frag in [
        ("SELECT equals(a, b) FROM t", "(a = b)"),
        ("SELECT lessOrEquals(a, b) FROM t", "(a <= b)"),
        ("SELECT and(p, q, r) FROM t", "(p AND q AND r)"),
        ("SELECT xor(p, q) FROM t", "((p) != (q))"),
        ("SELECT isNotDistinctFrom(a, b) FROM t", "(a <=> b)"),
        ("SELECT caseWithExpression(x, 1, 'a', 'z') FROM t",
         "CASE (x) WHEN 1 THEN 'a' ELSE 'z' END"),
        ("SELECT positionCaseInsensitive(s, 'X') FROM t",
         "locate(lower('X'), lower(s))"),
        ("SELECT countSubstrings(s, 'ab') FROM t",
         "replace(s, 'ab', '')"),
        ("SELECT multiSearchAllPositions(s, ['a']) FROM t",
         "transform(array('a'), msn -> locate(msn, s))"),
        ("SELECT multiMatchAny(s, ['p']) FROM t", "regexp_like"),
        ("SELECT arrayDotProduct(a, b) FROM t", "zip_with"),
        ("SELECT LinfDistance(a, b) FROM t", "greatest(dacc, dv)"),
        ("SELECT L2Normalize(a) FROM t", "sqrt(aggregate"),
        ("SELECT sumOrNull(x) FROM t", "sum(x)"),
        ("SELECT countOrNull(x) FROM t", "nullif(count(x), 0)"),
        ("SELECT sumOrDefault(x) FROM t", "coalesce(sum(x), 0)"),
        ("SELECT sumArray(a) FROM t", "sum(aggregate(a"),
        ("SELECT countArray(a) FROM t", "sum(size(a))"),
        ("SELECT minArray(a) FROM t", "min(array_min(a))"),
        ("SELECT groupArrayArray(a) FROM t",
         "flatten(collect_list(a))"),
        ("SELECT medianIf(x, c) FROM t",
         "percentile_approx(if(c, x, NULL), 0.5)"),
        ("SELECT toBool(x) FROM t", "CAST(x AS BOOLEAN)"),
        ("SELECT toUUIDOrZero(s) FROM t",
         "00000000-0000-0000-0000-000000000000"),
        ("SELECT toLowCardinality(s) FROM t", "(s)"),
        ("SELECT toStartOfISOYear(d) FROM t",
         "make_date(extract(YEAROFWEEK FROM d), 1, 4)"),
        ("SELECT toWeek(d, 3) FROM t", "weekofyear(d)"),
        ("SELECT addDate(d, INTERVAL 3 DAY) FROM t",
         "(d + INTERVAL 3 DAY)"),
        ("SELECT encrypt('aes-128-ecb', s, k) FROM t",
         "aes_encrypt(s, k, 'ECB')"),
        ("SELECT tryDecrypt('aes-256-gcm', s, k) FROM t",
         "try_aes_decrypt(s, k, 'GCM')"),
        ("SELECT extractAllGroupsVertical(s, '(a)(b)') FROM t",
         "arrays_zip"),
    ]:
        assert frag in translate_clickhouse_sql(sql), sql


def test_sweep6_fail_fasts():
    for sql, hint in [
        ("SELECT minOrDefault(x) FROM t", "minOrNull"),
        ("SELECT uniqArray(a) FROM t", "explode"),
        ("SELECT sumForEach(a) FROM t", "posexplode"),
        ("SELECT toDecimal256(x, 10) FROM t", "DECIMAL"),
        ("SELECT toInt128(x) FROM t", "64-bit"),
        ("SELECT bitmapBuild(a) FROM t", "q_bitmap_ops"),
        ("SELECT tuplePlus(t1, t2) FROM t", "named_struct"),
        ("SELECT toWeek(d) FROM t", "mode 3"),
        ("SELECT toYearWeek(d) FROM t", "mode 3"),
        ("SELECT encrypt('aes-128-ctr', s, k) FROM t", "ecb/cbc"),
        ("SELECT encrypt(m, s, k) FROM t", "literal"),
        ("SELECT evalMLMethod(st, a) FROM t", "q_train_quality_lr"),
        ("SELECT rankCorr(a, b) FROM t", "q_spearman_corr"),
        ("SELECT cramersVBiasCorrected(a, b) FROM t", "q_cramers_v"),
        ("SELECT proportionsZTest(a, b, c, d, 0.9, 'u') FROM t",
         "countIf"),
        ("SELECT jaroSimilarity(a, b) FROM t", "iterative"),
        ("SELECT extractAllGroups(s, '(a)') FROM t", "explicitly"),
        ("SELECT getSetting('x') FROM t", "introspection"),
        ("SELECT lowCardinalityKeys(x) FROM t", "encoding"),
        ("SELECT seriesDecomposeSTL(a, 7) FROM t", "decomposition"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=hint):
            translate_clickhouse_sql(sql)


def test_sweep6_executes_exactly(spark):
    """Value checks: combinator NULL/empty contracts, multi-search
    zero-miss contract, vertical group zip, ISO-year start, AES
    round-trip."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW sweep6_t AS SELECT * FROM VALUES"
        " ('abcabcAbc', array(1.0D, 2.0D, 2.0D),"
        "  array(3.0D, 4.0D, 0.0D), CAST('2021-01-01' AS DATE), 5)"
        " AS sweep6_t(s, va, vb, d, n)"
    )

    def one(sql):
        return spark.sql(translate_clickhouse_sql(sql)).collect()[0][0]

    assert one("SELECT countSubstrings(s, 'abc') FROM sweep6_t") == 2
    assert one(
        "SELECT countSubstringsCaseInsensitive(s, 'ABC') FROM sweep6_t"
    ) == 3
    assert one(
        "SELECT multiSearchFirstPosition(s, ['zz', 'bc']) FROM sweep6_t"
    ) == 2
    assert one(
        "SELECT multiSearchFirstPosition(s, ['zz', 'qq']) FROM sweep6_t"
    ) == 0
    assert one(
        "SELECT multiSearchAllPositions(s, ['bc', 'zz']) FROM sweep6_t"
    ) == [2, 0]
    assert one(
        "SELECT extractAllGroupsVertical('k1=v1 k2=v2', "
        "'(\\\\w+)=(\\\\w+)') FROM sweep6_t"
    ) == [["k1", "v1"], ["k2", "v2"]]
    assert one(
        "SELECT extractAllGroupsHorizontal('k1=v1 k2=v2', "
        "'(\\\\w+)=(\\\\w+)') FROM sweep6_t"
    ) == [["k1", "k2"], ["v1", "v2"]]
    assert abs(one(
        "SELECT stringJaccardIndex('abc', 'bcd') FROM sweep6_t"
    ) - 0.5) < 1e-12
    assert abs(one(
        "SELECT arrayDotProduct(va, vb) FROM sweep6_t") - 11.0) < 1e-12
    assert one("SELECT sumOrNull(n) FROM sweep6_t WHERE 1 = 0") is None
    assert one("SELECT countOrNull(n) FROM sweep6_t WHERE 1 = 0") is None
    assert one("SELECT sumOrDefault(n) FROM sweep6_t WHERE 1 = 0") == 0
    assert float(one("SELECT sumArray(va) FROM sweep6_t")) == 5.0
    assert one("SELECT countArray(va) FROM sweep6_t") == 3
    assert one("SELECT groupArrayArray(va) FROM sweep6_t") == [
        1.0, 2.0, 2.0]
    # 2021-01-01 is ISO week 53 of ISO year 2020, which began Monday
    # 2019-12-30 (the week containing Jan 4, 2020)
    assert str(one("SELECT toStartOfISOYear(d) FROM sweep6_t")) == (
        "2019-12-30")
    assert one("SELECT toWeek(d, 3) FROM sweep6_t") == 53
    assert one("SELECT toYearWeek(d, 3) FROM sweep6_t") == 202053
    assert one(
        "SELECT CAST(decrypt('aes-128-ecb', encrypt('aes-128-ecb', "
        "'secret', '1234567890123456'), '1234567890123456') "
        "AS STRING) FROM sweep6_t"
    ) == "secret"


def test_cast_as_syntax_maps_clickhouse_type_names():
    """CAST(x AS Int64) — the standard-syntax spelling with a
    ClickHouse type name — maps through the cast-type table
    (it used to leak Spark's UNSUPPORTED_DATATYPE); Spark-native
    names and comma-bearing types (DECIMAL(p, s), MAP<K, V>) pass
    verbatim."""
    for sql, frag in [
        ("SELECT CAST(x AS Int64) FROM t", "CAST(x AS BIGINT)"),
        ("SELECT CAST(x AS UInt8) FROM t", "CAST(x AS BIGINT)"),
        ("SELECT CAST(x AS Nullable(Float64)) FROM t",
         "CAST(x AS DOUBLE)"),
        ("SELECT CAST(x AS String) FROM t", "CAST(x AS STRING)"),
        ("SELECT CAST(x AS BIGINT) FROM t", "CAST(x AS BIGINT)"),
        ("SELECT CAST(x AS DECIMAL(18, 2)) FROM t",
         "CAST(x AS DECIMAL(18, 2))"),
        ("SELECT CAST(m AS MAP<STRING, INT>) FROM t",
         "CAST(m AS MAP<STRING, INT>)"),
    ]:
        assert frag in translate_clickhouse_sql(sql), sql


def test_clause_sweep_scalar_with_and_colon_casts():
    """Round-12 clause sweep: scalar WITH macro expansion (Spark's
    WITH only accepts CTEs), ::Type vocabulary mapping, table-function
    fail-fasts, PASTE JOIN / COLLATE / bare set-op fail-fasts."""
    assert translate_clickhouse_sql(
        "WITH 5 AS k SELECT a + k FROM t"
    ).strip() == "SELECT a + (5) FROM t"
    # later entries see earlier scalar aliases
    assert "((5) * 2)" in translate_clickhouse_sql(
        "WITH 5 AS k, k * 2 AS k2 SELECT k2 FROM t"
    )
    # scalar-subquery form substitutes as a scalar subquery
    assert "(SELECT max(value) FROM events)" in translate_clickhouse_sql(
        "WITH (SELECT max(value) FROM events) AS mx "
        "SELECT value / mx FROM events"
    )
    # CTE entries stay a real WITH; mixed lists split correctly
    out = translate_clickhouse_sql(
        "WITH x AS (SELECT 1 AS a), 7 AS k SELECT a + k FROM x"
    )
    assert out.startswith("WITH x AS (SELECT 1 AS a)")
    assert "a + (7)" in out
    # qualified t.k and calls k(...) are NOT substituted
    out = translate_clickhouse_sql(
        "WITH 5 AS k SELECT t.k, k FROM t"
    )
    assert "t.k, (5)" in out
    # ::Type maps the ClickHouse vocabulary; Spark names untouched
    assert "a::BIGINT" in translate_clickhouse_sql(
        "SELECT a::Int64 FROM t")
    assert "a::DOUBLE" in translate_clickhouse_sql(
        "SELECT a::Nullable(Float64) FROM t")
    assert "b::DATE" in translate_clickhouse_sql(
        "SELECT b::Date FROM t")
    assert "'x::Int64'" in translate_clickhouse_sql(
        "SELECT 'x::Int64' FROM t")  # strings untouched
    # star-modifier EXCEPT still passes; bare set ops fail fast
    assert "* EXCEPT" in translate_clickhouse_sql(
        "SELECT * EXCEPT (a, b) FROM t")
    for sql, hint in [
        ("SELECT a FROM t INTERSECT SELECT a FROM u", "DISTINCT"),
        ("SELECT a FROM t EXCEPT (SELECT a FROM u)", "DISTINCT"),
        ("SELECT a FROM t1 PASTE JOIN t2", "row_number"),
        ("SELECT a FROM t ORDER BY a COLLATE 'en'", "ICU"),
        ("SELECT a FROM s3('s3://b/k', 'CSV')", "spark.read"),
        ("SELECT a FROM remote('h', db.t)", "spark.read"),
        ("SELECT a FROM generateRandom('a Int64') LIMIT 3",
         "spark.read"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=hint):
            translate_clickhouse_sql(sql)
    # DISTINCT spellings coincide on both engines and pass through;
    # ALL spellings fail fast (ClickHouse ALL = filtering semantics;
    # Spark ALL = bag-multiset — [a,a] INTERSECT ALL [a] differs)
    assert "INTERSECT DISTINCT" in translate_clickhouse_sql(
        "SELECT a FROM t INTERSECT DISTINCT SELECT a FROM u")
    assert "EXCEPT DISTINCT" in translate_clickhouse_sql(
        "SELECT a FROM t EXCEPT DISTINCT SELECT a FROM u")
    for sql in [
        "SELECT a FROM t INTERSECT ALL SELECT a FROM u",
        "SELECT a FROM t EXCEPT ALL SELECT a FROM u",
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match="filtering"):
            translate_clickhouse_sql(sql)
    # view() is transparent
    assert translate_clickhouse_sql(
        "SELECT a FROM view(SELECT a FROM t)"
    ).strip() == "SELECT a FROM (SELECT a FROM t)"


def test_clause_sweep_executes(spark):
    """Scalar WITH and :: casts run end-to-end on Spark."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW clause_t AS "
        "SELECT * FROM VALUES (10.0), (20.0) AS clause_t(v)"
    )
    rows = spark.sql(translate_clickhouse_sql(
        "WITH (SELECT max(v) FROM clause_t) AS mx, 100 AS scale "
        "SELECT toInt64(v / mx * scale) AS pct FROM clause_t "
        "ORDER BY pct"
    )).collect()
    assert [r.pct for r in rows] == [50, 100]
    assert spark.sql(translate_clickhouse_sql(
        "SELECT '42'::Int64 AS r"
    )).collect()[0].r == 42


def test_combinator_stacks_and_position_forms(spark):
    """Two-deep combinator stacks compile (-StateIf/-IfState,
    -IfMerge, -SimpleStateIf, uniq[Exact]StateIf, sum/avgDistinctIf,
    avgWeightedIf, sketch -If); UNKNOWN stacks on aggregate bases
    fail fast instead of leaking unresolved routines; position()
    handles the 3-arg start (previously silently dropped) and the
    SQL-standard needle IN haystack spelling (previously an
    IndexError crash)."""
    for sql, frag in [
        ("SELECT position(s, 'x', 3) FROM t", "locate('x', s, 3)"),
        ("SELECT position('x' IN s) FROM t", "locate('x', s)"),
        ("SELECT sumStateIf(x, c) FROM t",
         "named_struct('s', sum(if(c, x, NULL)))"),
        ("SELECT countIfState(c) FROM t", "count_if(c)"),
        ("SELECT sumIfMerge(st) FROM t", "coalesce(sum((st).s), 0)"),
        ("SELECT maxSimpleStateIf(x, c) FROM t", "max(if(c, x, NULL))"),
        ("SELECT uniqStateIf(x, c) FROM t", "collect_set"),
        ("SELECT sumDistinctIf(x, c) FROM t",
         "sum(DISTINCT if(c, x, NULL))"),
        ("SELECT uniqThetaIf(x, c) FROM t",
         "approx_count_distinct(if(c, x, NULL))"),
    ]:
        assert frag in translate_clickhouse_sql(sql), sql
    for sql in (
        "SELECT sumResampleIf(x, c) FROM t",
        "SELECT maxStateArray(a) FROM t",
        "SELECT quantileStateIf(x, c) FROM t",
        "SELECT groupArrayResample(x) FROM t",
    ):
        with pytest.raises(UnsupportedClickHouseSQL, match="stack"):
            translate_clickhouse_sql(sql)
    # non-aggregate bases ending in a combinator word still pass
    assert "getState(x)" in translate_clickhouse_sql(
        "SELECT getState(x) FROM t")
    # end-to-end: the StateIf round-trip merges to the rescan answer
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW comb_t AS SELECT * FROM VALUES"
        " (1, 10.0), (1, 90.0), (2, 50.0) AS comb_t(g, v)"
    )
    merged = spark.sql(translate_clickhouse_sql(
        "SELECT sumIfMerge(st) AS s FROM (SELECT g, "
        "sumStateIf(v, v > 20) AS st FROM comb_t GROUP BY g)"
    )).collect()[0].s
    rescan = spark.sql(translate_clickhouse_sql(
        "SELECT sumIf(v, v > 20) AS s FROM comb_t"
    )).collect()[0].s
    assert merged == rescan == 140.0
    assert spark.sql(translate_clickhouse_sql(
        "SELECT position('lo' IN 'hello') AS p"
    )).collect()[0].p == 4


def test_multi_array_lambda_hofs(spark):
    """ClickHouse's array HOFs accept MULTIPLE arrays (lambda arity =
    array count); a straight transform/filter mapping silently bound
    the second parameter to Spark's ELEMENT INDEX — multi-array forms
    now zip first (plan stays one zip_with, no explode)."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW hof_t AS SELECT"
        " array(1, 2, 3) AS a, array(10, 20, 30) AS b"
    )

    def one(sql):
        return spark.sql(translate_clickhouse_sql(sql)).collect()[0][0]

    assert one("SELECT arrayMap((x, y) -> x + y, a, b) FROM hof_t") == [
        11, 22, 33]
    assert one(
        "SELECT arrayFilter((x, y) -> y > 10, a, b) FROM hof_t") == [2, 3]
    assert one(
        "SELECT arrayExists((x, y) -> x * 10 = y, a, b) FROM hof_t"
    ) is True
    assert one(
        "SELECT arrayAll((x, y) -> x + y > 12, a, b) FROM hof_t"
    ) is False
    assert one(
        "SELECT arrayCount((x, y) -> x + y > 12, a, b) FROM hof_t") == 2
    assert one(
        "SELECT arrayFirstOrNull((x, y) -> y > 10, a, b) FROM hof_t") == 2
    assert one(
        "SELECT arrayFirstIndex((x, y) -> y > 10, a, b) FROM hof_t") == 2
    # lambda-first forms of the folds (previously produced garbage)
    assert float(one("SELECT arraySum(x -> x * 2, a) FROM hof_t")) == 12.0
    assert float(one(
        "SELECT arraySum((x, y) -> x * y, a, b) FROM hof_t")) == 140.0
    assert one("SELECT arrayMin(x -> -x, a) FROM hof_t") == -3
    assert one("SELECT arrayCumSum(x -> x * 2, a) FROM hof_t") == [
        2, 6, 12]
    # keyed arraySort is a STABLE Schwartzian sort (equal keys keep
    # input order, the ClickHouse contract)
    assert one("SELECT arraySort(x -> -x, a) FROM hof_t") == [3, 2, 1]
    assert one(
        "SELECT arraySort(x -> x % 2, array(4, 1, 2, 3)) FROM hof_t"
    ) == [4, 2, 1, 3]
    # arity mismatches and 3+ arrays fail fast
    for sql, hint in [
        ("SELECT arrayMap(x -> x, a, b) FROM hof_t", "arity"),
        ("SELECT arrayMap((x, y, z) -> x, a, b, a) FROM hof_t",
         "binary"),
        ("SELECT arrayFilter((x, y) -> x, a) FROM hof_t",
         "parameter"),
        ("SELECT arraySort((x, y) -> y, a, b) FROM hof_t",
         "explicitly"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=hint):
            translate_clickhouse_sql(sql)


def test_semantic_settings_fail_fast():
    """SETTINGS entries that change RESULTS fail fast instead of
    silently stripping: join_use_nulls=0 (type-default outer-join
    fill), group_by_use_nulls=0, final=1, union_default_mode='ALL',
    totals_mode.  Values that COINCIDE with this engine's semantics
    (join_use_nulls=1, final=0) and pure runtime tuning strip as
    before."""
    ok = [
        "SELECT 1 SETTINGS max_threads = 4",
        "SELECT 1 SETTINGS join_use_nulls = 1",
        "SELECT 1 SETTINGS final = 0",
        "SELECT 1 SETTINGS group_by_use_nulls = 1, max_threads = 8",
        "SELECT 1 SETTINGS max_memory_usage = 10000000000",
        "SELECT 1 SETTINGS union_default_mode = 'DISTINCT'",
    ]
    for sql in ok:
        assert translate_clickhouse_sql(sql).strip() == "SELECT 1", sql
    for sql in (
        "SELECT 1 SETTINGS join_use_nulls = 0",
        "SELECT 1 SETTINGS final = 1",
        "SELECT 1 SETTINGS union_default_mode = 'ALL'",
        "SELECT 1 SETTINGS max_threads = 8, group_by_use_nulls = 0",
        "SELECT 1 SETTINGS totals_mode = 'after_having_auto'",
    ):
        with pytest.raises(UnsupportedClickHouseSQL, match="RESULTS"):
            translate_clickhouse_sql(sql)


def test_rewrite_pass_properties():
    """Property-style invariants for the round-12 rewrite passes:
    string literals are never touched by scalar-WITH substitution or
    ::-cast mapping, and substitution respects token boundaries."""
    from clickbom_spark.dialect import (
        _expand_scalar_with,
        _map_colon_casts,
        _subst_ident,
    )

    # literals survive untouched even when they contain the alias,
    # '::Int64' text, or WITH-like fragments
    out = _expand_scalar_with(
        "WITH 5 AS k SELECT 'k and k(x) and t.k' AS s, k FROM t"
    )
    assert "'k and k(x) and t.k'" in out
    assert out.rstrip().endswith("(5) FROM t")
    assert _map_colon_casts("SELECT 'a::Int64', x::Int64 FROM t") == (
        "SELECT 'a::Int64', x::BIGINT FROM t"
    )
    # token boundaries: k vs kk vs k2 vs _k
    body = _subst_ident("SELECT k, kk, k2, _k, a.k, k(x)", "k", "(9)")
    assert body == "SELECT (9), kk, k2, _k, a.k, k(x)"
    # idempotence of the colon-cast pass
    once = _map_colon_casts("SELECT x::Float64 FROM t")
    assert _map_colon_casts(once) == once
    # a WITH that is ALL CTEs is untouched byte-for-byte
    sql = "WITH x AS (SELECT 1 AS a), y AS (SELECT 2 AS b) SELECT * FROM x"
    assert _expand_scalar_with(sql) == sql
    # no-WITH queries are untouched
    assert _expand_scalar_with("SELECT 1") == "SELECT 1"


def test_sweep7_windows_utc_snowflake(spark):
    """Round-12 sweep 7: tumble/hop -> Spark window() structs, UTC
    conversions, sub-second components, Twitter-epoch snowflake IDs,
    XML-entity encode/decode, timeDiff, toDecimalString."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW sweep7_t AS SELECT"
        " CAST('2024-03-15 13:47:23.456789' AS TIMESTAMP) AS ts,"
        " 'a<b&c\"d' AS s"
    )

    def one(sql):
        return spark.sql(translate_clickhouse_sql(sql)).collect()[0][0]

    assert str(one(
        "SELECT tumbleStart(ts, INTERVAL 10 MINUTE) FROM sweep7_t"
    )).startswith("2024-03-15 13:40:00")
    assert str(one(
        "SELECT tumbleEnd(ts, INTERVAL 10 MINUTE) FROM sweep7_t"
    )).startswith("2024-03-15 13:50:00")
    assert one("SELECT toMillisecond(ts) FROM sweep7_t") == 456
    assert one("SELECT toMicrosecond(ts) FROM sweep7_t") == 456789
    assert str(one(
        "SELECT snowflakeIDToDateTime(dateTime64ToSnowflakeID(ts)) "
        "FROM sweep7_t"
    )).startswith("2024-03-15 13:47:23.456")
    assert one(
        "SELECT timeDiff(ts, ts + INTERVAL 90 SECOND) FROM sweep7_t"
    ) == 90
    assert one(
        "SELECT decodeXMLComponent(encodeXMLComponent(s)) "
        "FROM sweep7_t"
    ) == 'a<b&c"d'
    assert str(one(
        "SELECT toUTCTimestamp(ts, 'America/New_York') FROM sweep7_t"
    )).startswith("2024-03-15 17:47:23")
    assert one(
        "SELECT toDecimalString(3.14159, 3) FROM sweep7_t") == "3.142"
    for sql, hint in [
        ("SELECT hopStart(ts, INTERVAL 5 MINUTE, INTERVAL 10 MINUTE)"
         " FROM sweep7_t", "SEVERAL"),
        ("SELECT tumble(ts, sz) FROM sweep7_t", "literal"),
        ("SELECT regionToName(x) FROM sweep7_t", "geobase"),
        ("SELECT joinGet('db.t', 'v', k) FROM sweep7_t",
         "register_dictionary"),
        ("SELECT generateULID() FROM sweep7_t", "Crockford"),
        ("SELECT catboostEvaluate('/m.bin', a) FROM sweep7_t",
         "model"),
        ("SELECT decodeHTMLComponent(s) FROM sweep7_t",
         "named-entity"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=hint):
            translate_clickhouse_sql(sql)


def test_sweep8_url_tail_and_kv(spark):
    """Round-12 sweep 8: URL-family tail + key-value extraction."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW sweep8_t AS SELECT"
        " 'https://www.example.com:8443/p/q?a=1&b=2#frag' AS u,"
        " 'k1:v1, k2:v2' AS kv, '/usr/local/bin/spark' AS p"
    )

    def one(sql):
        return spark.sql(translate_clickhouse_sql(sql)).collect()[0][0]

    assert dict(one(
        "SELECT extractKeyValuePairs(kv) FROM sweep8_t"
    )) == {"k1": "v1", "k2": "v2"}
    assert one("SELECT cutWWW(u) FROM sweep8_t") == (
        "https://example.com:8443/p/q?a=1&b=2#frag")
    assert one("SELECT netloc(u) FROM sweep8_t") == (
        "www.example.com:8443")
    assert one("SELECT queryStringAndFragment(u) FROM sweep8_t") == (
        "a=1&b=2#frag")
    assert one("SELECT extractURLParameters(u) FROM sweep8_t") == [
        "a=1", "b=2"]
    assert one("SELECT extractURLParameterNames(u) FROM sweep8_t") == [
        "a", "b"]
    # separator bookkeeping matches ClickHouse for first/last params
    assert one("SELECT cutURLParameter(u, 'a') FROM sweep8_t") == (
        "https://www.example.com:8443/p/q?b=2#frag")
    assert one("SELECT cutURLParameter(u, 'b') FROM sweep8_t") == (
        "https://www.example.com:8443/p/q?a=1#frag")
    assert one("SELECT port(u) FROM sweep8_t") == 8443
    assert one("SELECT port('http://x.com/a') FROM sweep8_t") == 0
    assert one("SELECT basename(p) FROM sweep8_t") == "spark"
    assert one(
        "SELECT decodeURLFormComponent('a+b%3Dc') FROM sweep8_t"
    ) == "a b=c"
    assert str(one(
        "SELECT toDateTimeOrZero('bogus') FROM sweep8_t"
    )).startswith("1970-01-01")
    for sql, hint in [
        ("SELECT parseDateTimeBestEffortUS(s) FROM sweep8_t",
         "heuristic"),
        ("SELECT firstSignificantSubdomain(u) FROM sweep8_t",
         "public-suffix"),
        ("SELECT extractKeyValuePairs(kv, ':') FROM sweep8_t",
         "str_to_map"),
        ("SELECT parseTimeDelta('1h30m') FROM sweep8_t", "heuristic"),
        ("SELECT URLHierarchy(u) FROM sweep8_t", "prefix"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=hint):
            translate_clickhouse_sql(sql)


def test_scalar_with_scoping_review_fixes(spark):
    """Self-review fixes on the scalar-WITH pass: (1) earlier scalar
    aliases are visible inside later CTE BODIES (the ClickHouse
    scoping rule — previously left an unresolved column); (2) an
    alias TARGET (`expr AS k`) is never substituted; (3) a column
    merely NAMED collate no longer trips the COLLATE fail-fast."""
    out = translate_clickhouse_sql(
        "WITH 5 AS k, c AS (SELECT k AS v FROM t) SELECT v FROM c"
    )
    assert "(5) AS v" in out and out.startswith("WITH c AS")
    # a scalar name colliding with a body alias FAILS FAST (round-13
    # ADVICE): substituting reference sites (ORDER BY k) would
    # silently retarget them to the scalar
    with pytest.raises(UnsupportedClickHouseSQL, match="collides"):
        translate_clickhouse_sql(
            "WITH 5 AS k SELECT a AS k FROM t ORDER BY k")
    with pytest.raises(UnsupportedClickHouseSQL, match="collides"):
        translate_clickhouse_sql(  # bare-alias form
            "WITH 2 AS n SELECT a n FROM t ORDER BY n")
    assert translate_clickhouse_sql(
        "SELECT collate FROM t"
    ).strip() == "SELECT collate FROM t"
    with pytest.raises(UnsupportedClickHouseSQL, match="ICU"):
        translate_clickhouse_sql(
            "SELECT a FROM t ORDER BY a COLLATE 'en'"
        )
    # end-to-end: scalar alias inside a CTE body
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW scw_t AS "
        "SELECT * FROM VALUES (10), (20) AS scw_t(v)"
    )
    rows = spark.sql(translate_clickhouse_sql(
        "WITH 2 AS f, c AS (SELECT v * f AS w FROM scw_t) "
        "SELECT w FROM c ORDER BY w"
    )).collect()
    assert [r.w for r in rows] == [20, 40]


def test_r13_approximate_spellings():
    """Round-13 policy extensions: quantileGK compiles (Spark's
    percentile_approx IS a GK-family sketch — accuracy maps through);
    the Theta/Combined[64]/HLL12 -State/-Merge spellings ride the
    portable HLL code-set state (same mergeable approximate-distinct
    contract; merge law exact, estimates differ from ClickHouse's)."""
    for sql, frag in [
        ("SELECT quantileGK(100)(x) FROM t",
         "percentile_approx(x, 0.5, 100)"),
        ("SELECT quantileGK(100, 0.9)(x) FROM t",
         "percentile_approx(x, 0.9, 100)"),
        ("SELECT quantilesGK(100, 0.5, 0.9)(x) FROM t",
         "percentile_approx(x, array(0.5, 0.9), 100)"),
        ("SELECT uniqThetaState(x) FROM t", "collect_set"),
        ("SELECT uniqCombinedState(x) FROM t", "collect_set"),
        ("SELECT uniqCombined64State(x) FROM t", "collect_set"),
        ("SELECT uniqHLL12State(x) FROM t", "collect_set"),
    ]:
        assert frag in translate_clickhouse_sql(sql), sql
    # the -Merge finalizers reuse the uniqMerge register algebra
    base = translate_clickhouse_sql("SELECT uniqMerge(s) FROM p")
    for alt in ("uniqThetaMerge", "uniqCombinedMerge",
                "uniqCombined64Merge", "uniqHLL12Merge"):
        assert translate_clickhouse_sql(
            f"SELECT {alt}(s) FROM p") == base, alt
    with pytest.raises(UnsupportedClickHouseSQL, match="accuracy"):
        translate_clickhouse_sql("SELECT quantilesGK(100)(x) FROM t")


def test_qualify_and_fetch_clauses(spark):
    """Round-13 clause compiles: QUALIFY (post-window filter) wraps
    the query head and filters the alias in an outer WHERE; the
    standard-SQL OFFSET m ROWS / FETCH FIRST n ROWS ONLY spellings
    become LIMIT n OFFSET m.  A column merely NAMED qualify is
    untouched; an inline-window QUALIFY fails fast."""
    out = translate_clickhouse_sql(
        "SELECT g, row_number() OVER (ORDER BY g) AS rn FROM t "
        "QUALIFY rn = 1 ORDER BY g")
    assert "__qualify_q WHERE rn = 1 ORDER BY g" in out
    assert translate_clickhouse_sql(
        "SELECT x FROM t ORDER BY x OFFSET 5 ROWS "
        "FETCH FIRST 10 ROWS ONLY"
    ).endswith("LIMIT 10 OFFSET 5")
    assert translate_clickhouse_sql(
        "SELECT x FROM t ORDER BY x FETCH NEXT 7 ROW ONLY"
    ).endswith("LIMIT 7")
    assert translate_clickhouse_sql(
        "SELECT x FROM t ORDER BY x OFFSET 4 ROWS"
    ).endswith("OFFSET 4")
    assert translate_clickhouse_sql(
        "SELECT qualify FROM t").strip() == "SELECT qualify FROM t"
    with pytest.raises(UnsupportedClickHouseSQL, match="alias"):
        translate_clickhouse_sql(
            "SELECT x FROM t QUALIFY row_number() OVER (ORDER BY x) "
            "= 1")
    # end-to-end: top-1 per group via the alias idiom
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW qual_t AS SELECT * FROM VALUES "
        "(1, 'a'), (2, 'a'), (3, 'b') AS qual_t(x, g)"
    )
    rows = spark.sql(translate_clickhouse_sql(
        "SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x "
        "DESC) AS rn FROM qual_t QUALIFY rn = 1 ORDER BY g"
    )).collect()
    assert [(r.g, r.x) for r in rows] == [("a", 2), ("b", 3)]


def test_advice_r13_fixes(spark):
    """ADVICE r13 pins: (1) an alias merely NAMED qualify — `AS
    qualify` or bare-alias position — is not rewritten as a QUALIFY
    clause; (2) hasTokenOrNull returns NULL for a needle containing
    '_' (a separator in the compiled boundary class); (3) left()/
    leftUTF8() with a NULL length return NULL, not ''."""
    assert translate_clickhouse_sql(
        "SELECT x FROM t AS qualify WHERE x > 1"
    ).strip() == "SELECT x FROM t AS qualify WHERE x > 1"
    assert translate_clickhouse_sql(
        "SELECT x FROM t qualify WHERE x > 1"
    ).strip() == "SELECT x FROM t qualify WHERE x > 1"
    row = spark.sql(translate_clickhouse_sql(
        "SELECT hasTokenOrNull('a_b c', 'a_b') AS hu, "
        "hasTokenOrNull('a_b c', 'c') AS hc, "
        "left('abc', NULL) AS ln, leftUTF8('abc', NULL) AS lnu, "
        "right('abc', NULL) AS rn, left('abc', -1) AS lneg, "
        "leftUTF8('abc', -1) AS lnegu, left('abc', 2) AS lpos"
    )).collect()[0]
    assert row.hu is None and row.hc is True
    assert row.ln is None and row.lnu is None and row.rn is None
    assert row.lneg == "ab" and row.lnegu == "ab" and row.lpos == "ab"


def test_r14_variant_closure_values(spark):
    """Value pins for the round-14 suffix-variant closure: the
    non-parametric quantile family (= median), exact low/high middle
    selection, toUUIDOrDefault, the registered same-name
    passthroughs, and the CaseInsensitiveUTF8 multiSearch aliases."""
    row = spark.sql(translate_clickhouse_sql(
        "SELECT quantileExactLow(x) AS lo, quantileExactHigh(x) AS "
        "hi, quantileExact(x) AS m, quantileExactExclusive(x) AS ee "
        "FROM (SELECT 1 AS x UNION ALL SELECT 2 UNION ALL SELECT 3 "
        "UNION ALL SELECT 4)"
    )).collect()[0]
    assert (row.lo, row.hi, row.m, row.ee) == (2, 3, 2.5, 2.5)
    row = spark.sql(translate_clickhouse_sql(
        "SELECT toUUIDOrDefault('nope', "
        "'f47ac10b-58cc-4372-a567-0e02b2c3d479') AS a, "
        "toUUIDOrDefault('nope') AS z, "
        "printf('%d-%s', 7, 'x') AS p, overlay('abcdef', 'ZZ', 2) "
        "AS o, overlayUTF8('abcdef', 'ZZ', 2) AS ou, "
        "substring('abcdef', -3, 2) AS sub, "
        "stringJaccardIndexUTF8('abc', 'bcd') AS j, "
        "multiSearchFirstPositionCaseInsensitiveUTF8('xaB', "
        "['Q','ab']) AS mp"
    )).collect()[0]
    assert row.a == "f47ac10b-58cc-4372-a567-0e02b2c3d479"
    assert row.z == "00000000-0000-0000-0000-000000000000"
    assert row.p == "7-x" and row.o == "aZZdef" and row.ou == "aZZdef"
    assert row.sub == "de" and row.j == 0.5 and row.mp == 2
    # variant fail-fasts carry their OWN spelling in the message
    with pytest.raises(UnsupportedClickHouseSQL,
                       match="ngramSimHashCaseInsensitive"):
        translate_clickhouse_sql(
            "SELECT ngramSimHashCaseInsensitive(s) FROM t")
    with pytest.raises(UnsupportedClickHouseSQL,
                       match="byteHammingDistance"):
        translate_clickhouse_sql(
            "SELECT byteHammingDistance(s, s2) FROM t")
    with pytest.raises(UnsupportedClickHouseSQL, match="UUIDToNum"):
        translate_clickhouse_sql("SELECT UUIDToNum(u) FROM t")
    with pytest.raises(UnsupportedClickHouseSQL,
                       match="quantileTDigestWeighted"):
        translate_clickhouse_sql(
            "SELECT quantileTDigestWeighted(x, w) FROM t")


def test_sweep11_closures(spark):
    """Sweep-11 pins: timeSeriesGroupArray compiles to a sorted
    collect (col1/col2 tuple shape, timestamp-ascending); the
    experimental Prometheus-grid family prefix-guards; the OrNull
    query-log tooling twins and Dynamic-JSON AndTypes introspection
    fail fast (their bases already did); the transactions tail is
    closed."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW ts_t AS SELECT * FROM VALUES "
        "('a', TIMESTAMP'2024-01-02 00:00:00', 2.0), "
        "('a', TIMESTAMP'2024-01-01 00:00:00', 1.0), "
        "('b', TIMESTAMP'2024-01-03 00:00:00', 3.0) AS t(g, d, f)"
    )
    rows = spark.sql(translate_clickhouse_sql(
        "SELECT g, timeSeriesGroupArray(d, f) AS series FROM ts_t "
        "GROUP BY g ORDER BY g"
    )).collect()
    assert [(r.g, [(str(p.col1), float(p.col2)) for p in r.series])
            for r in rows] == [
        ("a", [("2024-01-01 00:00:00", 1.0),
               ("2024-01-02 00:00:00", 2.0)]),
        ("b", [("2024-01-03 00:00:00", 3.0)]),
    ]
    for bad, frag in (
        ("timeSeriesLastTwoSamples(d, f)", "regridding"),
        # parametric spellings route through _parametric's own
        # fail-fast before the prefix guard — either is a clean stop
        ("timeSeriesRateToGrid(1, 100, 10, 30)(d, f)",
         "not in the supported surface"),
        ("formatQueryOrNull(s)", "query-log tooling"),
        ("formatQuerySingleLineOrNull(s)", "query-log tooling"),
        ("distinctJSONPathsAndTypes(s)", "Dynamic JSON"),
        ("transactionOldestSnapshot()", "introspection"),
    ):
        with pytest.raises(UnsupportedClickHouseSQL, match=frag):
            translate_clickhouse_sql(f"SELECT {bad} FROM t")


def test_sweep12_closures(spark):
    """Sweep-12 pins: URLHash drops one trailing /?# before the
    digest surrogate (level form fails fast), splitByAlpha is the
    documented alphaTokens alias, and the keyed-SipHash/geobase
    stragglers fail fast with their family messages."""
    row = spark.sql(translate_clickhouse_sql(
        "SELECT URLHash('http://e.com/a/') = URLHash('http://e.com/a')"
        " AS eq, URLHash('http://e.com/a') = URLHash('http://e.com/b')"
        " AS ne, splitByAlpha('ab1cd') AS sa, alphaTokens('ab1cd') AS "
        "at"
    )).collect()[0]
    assert row.eq is True and row.ne is False
    assert row.sa == row.at == ["ab", "cd"]
    for bad, frag in (
        ("URLHash(s, 2)", "hierarchy prefix"),
        ("sipHash128ReferenceKeyed((1, 2), s)", "keyed SipHash"),
        ("regionHierarchy(x)", "geobase"),
        ("regionToTopContinent(x)", "geobase"),
    ):
        with pytest.raises(UnsupportedClickHouseSQL, match=frag):
            translate_clickhouse_sql(f"SELECT {bad} FROM t")


def test_sweep13_closures():
    """Sweep-13 pins: the block-order runningDifference...FirstValue
    variant and the interval-tuple subtractInterval twin fail fast
    with the same guidance as their handled siblings."""
    with pytest.raises(UnsupportedClickHouseSQL,
                       match="block-order-dependent"):
        translate_clickhouse_sql(
            "SELECT runningDifferenceStartingWithFirstValue(x) FROM t")
    with pytest.raises(UnsupportedClickHouseSQL,
                       match="interval TUPLES"):
        translate_clickhouse_sql(
            "SELECT subtractInterval(toIntervalDay(1), "
            "toIntervalHour(2)) FROM t")


def test_sweep14_closures(spark):
    """Sweep-14 pins: hasSubsequence walks the haystack in order
    (empty needle matches, exhausted haystack doesn't), the
    CaseInsensitive/UTF8 variants alias through lower()/the base,
    index-returning multiMatch variants give 1-based indices (0 /
    empty array when nothing matches), accurateCastOrZero yields the
    type's zero value, and fuzzy matching fails fast."""
    row = spark.sql(translate_clickhouse_sql(
        "SELECT hasSubsequence('garbage', 'gab') AS a, "
        "hasSubsequence('garbage', 'eg') AS b, "
        "hasSubsequence('garbage', '') AS c, "
        "hasSubsequence('', 'x') AS d, "
        "hasSubsequenceCaseInsensitive('GarBage', 'gab') AS e, "
        "hasSubsequenceUTF8('héllo wörld', 'hw') AS f2, "
        "multiMatchAnyIndex('hello', ['x[yz]', 'l+o$', 'h.']) AS i1, "
        "multiMatchAllIndices('hello', ['x[yz]', 'l+o$', 'h.']) AS "
        "i2, multiMatchAnyIndex('hello', ['xx']) AS i3, "
        "multiMatchAllIndices('hello', ['xx']) AS i4, "
        "accurateCastOrZero('12x', 'Int64') AS z1, "
        "accurateCastOrZero('7', 'Int32') AS z2, "
        "accurateCastOrZero('x', 'Date') AS z3"
    )).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e, row.f2) == (
        True, False, True, False, True, True)
    assert row.i1 == 2 and row.i2 == [2, 3]
    assert row.i3 == 0 and row.i4 == []
    assert row.z1 == 0 and row.z2 == 7 and str(row.z3) == "1970-01-01"
    with pytest.raises(UnsupportedClickHouseSQL, match="fuzzy"):
        translate_clickhouse_sql(
            "SELECT multiFuzzyMatchAny(s, 2, ['ab']) FROM t")


def test_sweep15_closures(spark):
    """Sweep-15 pins: SQL-compat aggregate aliases pass through to
    Spark's identical built-ins as registered self-entries; the
    snake-case approx_top_* aliases fail fast like topK; the matrix
    aggregates fail fast; nothingUInt64 is the typed default; and the
    combinator guard now catches -ArgMin/-ArgMax on ANY handled base,
    not just the fixed base list."""
    row = spark.sql(translate_clickhouse_sql(
        "SELECT BIT_AND(x) AS ba, BIT_OR(x) AS bo, BIT_XOR(x) AS bx, "
        "STDDEV_POP(x) AS sp, VAR_SAMP(x) AS vs, "
        "nothingUInt64(x) AS nu, nothingNull(x) AS nn FROM "
        "(SELECT 6 AS x UNION ALL SELECT 3)"
    )).collect()[0]
    assert (row.ba, row.bo, row.bx) == (2, 7, 5)
    assert row.sp == 1.5 and row.vs == 4.5
    assert row.nu == 0 and row.nn is None
    for bad, frag in (
        ("approx_top_k(x)", "heavy-hitters"),
        ("approx_top_sum(x, w)", "heavy-hitters"),
        ("covarPopMatrix(f, f)", "matrix-valued"),
        ("quantileExactArgMin(x)", "combinator stack"),
        ("quantileTimingArgMax(x)", "combinator stack"),
    ):
        with pytest.raises(UnsupportedClickHouseSQL, match=frag):
            translate_clickhouse_sql(f"SELECT {bad} FROM t")


def test_sweep17_table_functions(spark):
    """Sweep-17 pins: generate_series/generateSeries compile to an
    inclusive explode(sequence()) subquery with ClickHouse's
    generate_series column name; the values() table function's
    schema-string form becomes a named VALUES subquery (bare-scalar
    single-column rows wrap); system.one is the 1-row dual while the
    other system.* tables fail fast — and Spark's own
    ``FROM VALUES ... AS t(x)`` spelling passes through untouched."""
    assert [r[0] for r in spark.sql(translate_clickhouse_sql(
        "SELECT generate_series FROM generate_series(2, 5)"
    )).collect()] == [2, 3, 4, 5]
    assert [r[0] for r in spark.sql(translate_clickhouse_sql(
        "SELECT generate_series FROM generateSeries(1, 7, 3)"
    )).collect()] == [1, 4, 7]
    rows = spark.sql(translate_clickhouse_sql(
        "SELECT x, y FROM values('x Int64, y String', (1, 'a'), "
        "(2, 'b')) ORDER BY x"
    )).collect()
    assert [(r.x, r.y) for r in rows] == [(1, "a"), (2, "b")]
    assert sorted(r.k for r in spark.sql(translate_clickhouse_sql(
        "SELECT k FROM values('k Int64', 1, 2, 3)"
    )).collect()) == [1, 2, 3]
    assert spark.sql(translate_clickhouse_sql(
        "SELECT dummy FROM system.one"
    )).collect()[0].dummy == 0
    passthrough = translate_clickhouse_sql(
        "SELECT * FROM VALUES (1), (2) AS vt(x)")
    assert sorted(r.x for r in spark.sql(passthrough).collect()) == [1, 2]
    with pytest.raises(UnsupportedClickHouseSQL, match="UNBOUNDED"):
        translate_clickhouse_sql("SELECT * FROM system.numbers LIMIT 5")
    with pytest.raises(UnsupportedClickHouseSQL, match="introspection"):
        translate_clickhouse_sql("SELECT * FROM system.parts")


def test_sweep18_closures(spark):
    """Sweep-18 pins: chr aliases char (multi-code concat), coalesce
    is a registered same-name passthrough, and the map value-side
    twins (mapContainsValue / mapContainsValueLike /
    mapExtractValueLike) compile over map_values/map_filter."""
    row = spark.sql(translate_clickhouse_sql(
        "SELECT chr(72) AS c1, chr(72, 105) AS c2, "
        "coalesce(NULL, 7) AS co, "
        "mapContainsValue(map('a', 10, 'b', 20), 20) AS mv, "
        "mapContainsValue(map('a', 10), 99) AS mv0, "
        "mapContainsValueLike(map('a', '10', 'b', 'x'), '1%') AS ml, "
        "mapKeys(mapExtractValueLike(map('a', '10', 'b', 'x'), '1%')) "
        "AS mk"
    )).collect()[0]
    assert row.c1 == "H" and row.c2 == "Hi" and row.co == 7
    assert row.mv is True and row.mv0 is False and row.ml is True
    assert row.mk == ["a"]


def test_dialect_md_battery_count_matches():
    """docs/DIALECT.md cites the probe-battery size; the number is
    asserted against ``len(leak_probe.PROBES)`` so the docs can't
    drift from the battery again (VERDICT r13 "What's wrong" #3)."""
    import re as _re
    import sys as _sys
    from pathlib import Path as _Path
    _sys.path.insert(0, str(
        _Path(__file__).resolve().parent.parent / "scripts"))
    import leak_probe as _lp
    root = _Path(__file__).resolve().parent.parent
    for doc_path in (root / "docs" / "DIALECT.md",
                     root / "README.md"):
        doc = doc_path.read_text()
        cited = {int(m) for m in _re.findall(
            r"(\d+)[ -](?:probe|spelling)", doc)}
        stale = {n for n in cited if 400 < n != len(_lp.PROBES)}
        assert not stale, (
            f"{doc_path.name} cites battery size(s) {sorted(stale)} "
            f"but the battery is {len(_lp.PROBES)} probes"
        )


def test_r13_probe_sweep_values(spark):
    """Value pins for the round-13 probe-sweep compiles (sweeps 3-4):
    NULL propagation in max2/min2, the hasTokenOrNull NULL contract,
    Or-Default parse fallbacks, negative-length left/right, bitwise
    aggregates, and the snowflake bit layout."""
    row = spark.sql(translate_clickhouse_sql(
        "SELECT positiveModulo(-7, 3) AS pm, max2(1, NULL) AS m2n, "
        "max2(2.5, 3) AS m2, hasTokenOrNull('a tok b', 'a b') AS hn, "
        "hasTokenOrNull('a tok b', 'tok') AS hy, "
        "toInt64OrDefault('x') AS d0, toFloat64OrDefault('x', 0.5) "
        "AS d5, toUInt8OrZero('7') AS u8, "
        "left('abc', -1) AS lneg, right('abc', -1) AS rneg, "
        "stringCompare('a', 'b') AS sc, "
        "accurateCastOrNull('12x', 'Int64') AS acn"
    )).collect()[0]
    assert row.pm == 2 and row.m2n is None and row.m2 == 3.0
    assert row.hn is None and row.hy is True
    assert row.d0 == 0 and row.d5 == 0.5 and row.u8 == 7
    assert row.lneg == "ab" and row.rneg == "bc" and row.sc == -1
    assert row.acn is None
    agg = spark.sql(translate_clickhouse_sql(
        "SELECT groupBitAnd(x) AS ba, groupBitOr(x) AS bo, "
        "groupBitXor(x) AS bx FROM "
        "(SELECT 6 AS x UNION ALL SELECT 3)"
    )).collect()[0]
    assert (agg.ba, agg.bo, agg.bx) == (2, 7, 5)
    snow = spark.sql(translate_clickhouse_sql(
        "SELECT toUnixTimestamp64Milli(snowflakeToDateTime64("
        "dateTimeToSnowflake(makeDateTime(2024, 1, 2, 3, 4, 5)))) "
        "AS ms"
    )).collect()[0]
    assert snow.ms == 1704164645000


def test_advice_r12_fixes(spark):
    """Round-12 ADVICE closures (landed round 13): (1)
    arrayReduce('sum'/'avg') on an
    EMPTY array returns 0 / NaN like ClickHouse instead of throwing
    under Spark's default ANSI mode (INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    / DIVIDE_BY_ZERO); (2) EXCEPT ALL / INTERSECT ALL fail fast
    (ClickHouse ALL = filtering semantics, Spark ALL = bag-multiset);
    (3) '[...]' array literals in scalar WITH parse as ONE entry;
    (4) scalar-WITH names colliding with body aliases fail fast."""
    row = spark.sql(translate_clickhouse_sql(
        "SELECT arrayReduce('sum', arrayFilter(x -> x > 9, [1, 2])) "
        "AS s, arrayReduce('avg', arrayFilter(x -> x > 9, [1, 2])) "
        "AS a"
    )).collect()[0]
    assert row.s == 0
    assert row.a != row.a  # NaN
    row2 = spark.sql(translate_clickhouse_sql(
        "SELECT arrayReduce('sum', [1, 2, 3]) AS s, "
        "arrayReduce('avg', [1, 2, 3]) AS a"
    )).collect()[0]
    assert row2.s == 6 and row2.a == 2.0
    # array-literal scalar WITH is one entry and runs end-to-end
    row3 = spark.sql(translate_clickhouse_sql(
        "WITH [1, 2, 3] AS ks SELECT arrayReduce('sum', ks) AS s"
    )).collect()[0]
    assert row3.s == 6
    with pytest.raises(UnsupportedClickHouseSQL, match="filtering"):
        translate_clickhouse_sql(
            "SELECT a FROM t EXCEPT ALL SELECT a FROM u")
    with pytest.raises(UnsupportedClickHouseSQL, match="collides"):
        translate_clickhouse_sql(
            "WITH 2 AS n SELECT a AS n FROM t ORDER BY n")


def test_sweep9_exotic_aggregate_tail():
    """Round-12 sweep 9: median<suffix> = quantile<suffix>(0.5), the
    *Stable numerics map to the same statistics, *MappedArrays alias
    the *Map aggregates, groupConcatIf; the remaining exotica fail
    fast with pointers."""
    for sql, frag in [
        ("SELECT medianExact(x) FROM t", "percentile(x, 0.5)"),
        ("SELECT medianTiming(x) FROM t", "percentile_approx"),
        ("SELECT varPopStable(x) FROM t", "var_pop(x)"),
        ("SELECT stddevSampStable(x) FROM t", "stddev_samp(x)"),
        ("SELECT corrStable(a, b) FROM t", "corr(a, b)"),
        ("SELECT sumMappedArrays(k, v) FROM t", "zip_with"),
        ("SELECT groupConcatIf(x, c) FROM t",
         "collect_list(if(c, x, NULL))"),
    ]:
        assert frag in translate_clickhouse_sql(sql), sql
    for sql, hint in [
        ("SELECT arrayROCAUC(a, b) FROM t", "q_model_auc"),
        ("SELECT arrayAUCPR(a, b) FROM t", "q_model_auc"),
        ("SELECT maxIntersectionsPosition(a, b) FROM t",
         "q_max_intersections"),
        ("SELECT estimateCompressionRatio(x) FROM t", "storage"),
        ("SELECT distinctJSONPaths(j) FROM t", "Dynamic"),
        ("SELECT groupArrayIntersectIf(a, c) FROM t", "explode"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=hint):
            translate_clickhouse_sql(sql)
