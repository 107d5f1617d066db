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
        ("SELECT * FROM events FINAL", "keep-latest"),
        ("SELECT * FROM events SAMPLE 0.1", "hash sampling"),
        ("SELECT * FROM events LIMIT 3 BY user_id", "top-k"),
        ("SELECT topK(5)(event_type) FROM events", "heavy-hitters"),
    ]:
        with pytest.raises(UnsupportedClickHouseSQL, match=hint):
            translate_clickhouse_sql(sql)


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
