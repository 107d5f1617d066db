"""Exec-level probe battery: every COMPILED leak-probe spelling must
also ANALYZE AND RUN on a real SparkSession.

``scripts/leak_probe.py`` pins the translate level (compiled or
fail-fast, never silent passthrough).  This module pins the next
level down: a compile that Spark's analyzer rejects (wrong arity,
unresolvable function, type error) or that throws at execution (ANSI
cast/index errors) is a broken translation hiding behind a green
translate-level probe — the round-12/13 lesson that "translate-level
green ≠ runs" (ANSI, NTZ, and resolver arity all bite at runtime).

Each compiled probe's SQL runs against a 3-row dummy view ``t``
whose columns carry the types the probe corpus assumes.  Probes
whose failure is a PLACEHOLDER artifact — a window function probed
without OVER, a binary column fed to a string-typed compile — are
allowlisted BY NAME with a justification; everything else must run.

Run directly for a human-readable report::

    python scripts/exec_probe.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import leak_probe  # noqa: E402

# Typed dummy relation backing every probe argument spelling.
DUMMY_VIEW_SQL = """
CREATE OR REPLACE TEMP VIEW t AS
SELECT * FROM VALUES
  ('hello world', 'alpha', 'beta', 'gamma', 'note', 'msg one',
   'cat', 'grp', 'head', 'pfx', 'zed',
   3L, 7L, 2L, 5L, 4L, 2L, 3L, 11L, 13L, 8L,
   DATE '2024-01-02', DATE '2024-02-03',
   CAST(12.50 AS DECIMAL(10, 2)), CAST(3.25 AS DECIMAL(10, 2)),
   TIMESTAMP '2024-01-02 03:04:05',
   TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-03 00:00:00',
   array(1L, 2L, 3L), array(2L, 3L, 4L),
   'f47ac10b-58cc-4372-a567-0e02b2c3d479',
   X'0102', X'0304', X'0506',
   '{"k": 1, "a": [1, 2]}', '{"k": 2}',
   map('k1', 1L, 'k2', 2L), map('k1', 10L), map('k2', 20L),
   named_struct('col1', 1L, 'col2', 2L),
   named_struct('col1', 3L, 'col2', 4L),
   'tok', 'u1', 'k', 'sum', 'attr', 'SGD',
   INTERVAL '1' DAY, INTERVAL '2' HOUR,
   'a,b,c', 'v1'),
  ('second row text', 'aleph', 'bet', 'gimel', 'memo', 'msg two',
   'dog', 'grp', 'tail', 'sfx', 'zee',
   9L, 1L, 6L, 2L, 8L, 5L, 7L, 17L, 19L, 4L,
   DATE '2024-03-04', DATE '2024-04-05',
   CAST(7.75 AS DECIMAL(10, 2)), CAST(1.50 AS DECIMAL(10, 2)),
   TIMESTAMP '2024-05-06 07:08:09',
   TIMESTAMP '2024-05-01 00:00:00', TIMESTAMP '2024-05-07 00:00:00',
   array(5L, 6L), array(6L, 7L),
   '00000000-0000-0000-0000-000000000000',
   X'0708', X'090A', X'0B0C',
   '{"k": 3}', '{"k": 4}',
   map('k3', 3L), map('k4', 40L), map('k5', 50L),
   named_struct('col1', 5L, 'col2', 6L),
   named_struct('col1', 7L, 'col2', 8L),
   'word', 'u2', 'k', 'avg', 'attr2', 'SGD',
   INTERVAL '3' DAY, INTERVAL '4' HOUR,
   'd,e', 'v2'),
  ('third', 'third a', 'third b', 'third c', 'third d', 'third e',
   'cat', 'grp2', 'head', 'pfx', 'zed',
   2L, 4L, 1L, 9L, 3L, 6L, 2L, 23L, 29L, 16L,
   DATE '2024-06-07', DATE '2024-07-08',
   CAST(0.25 AS DECIMAL(10, 2)), CAST(9.00 AS DECIMAL(10, 2)),
   TIMESTAMP '2024-09-10 11:12:13',
   TIMESTAMP '2024-09-01 00:00:00', TIMESTAMP '2024-09-11 00:00:00',
   array(1L), array(9L),
   'f47ac10b-58cc-4372-a567-0e02b2c3d479',
   X'0D0E', X'0F10', X'1112',
   '[1, 2, 3]', '{}',
   map('k1', 5L), map('k6', 60L), map('k7', 70L),
   named_struct('col1', 9L, 'col2', 10L),
   named_struct('col1', 11L, 'col2', 12L),
   'tok', 'u1', 'k2', 'min', 'attr', 'SGD',
   INTERVAL '5' DAY, INTERVAL '6' HOUR,
   'f', 'v1')
AS t(s, s1, s2, st, txt, msg,
     c, g, head, p, z,
     x, y, x2, y2, w, w2, v, k1, k2, n,
     d, dd,
     d1, d2,
     ts, t1, t2,
     a, a2,
     u,
     b, b1, b2,
     j, j2,
     m, m1, m2,
     tp, tp2,
     tok, uid, k, agg_name, attr, opt,
     i, i2,
     list, vv)
"""

# Exec-variant SQL for probes whose battery arguments are typed for
# the TRANSLATE level only (single-letter placeholder columns, or
# deliberately-malformed inputs that ClickHouse itself would reject
# at runtime).  The override exercises the same spelling's HAPPY path
# with typed literals — the compile under test is identical.
EXEC_OVERRIDES: dict[str, str] = {
    # table functions are FROM-position constructs — the battery's
    # SELECT-position probe is translate-level only; exec them where
    # ClickHouse allows them (count() keeps classify()'s SELECT-name(
    # anchor on a registered passthrough)
    "generate_series_tf":
        "SELECT count(generate_series) FROM generate_series(1, 10)",
    "generateSeries_tf":
        "SELECT count(generate_series) FROM generateSeries(1, 10, 2)",
    "values_tf": "SELECT count(k) FROM values('k Int64', (1), (2))",
    "numbers_tf": "SELECT count(number) FROM numbers(10)",
    # strict-parse conversions: ClickHouse also throws on malformed
    # input, so the happy path is the runtime contract to pin
    "toInt8": "SELECT toInt8('42') FROM t",
    "toInt16": "SELECT toInt16('42') FROM t",
    "toInt32": "SELECT toInt32('42') FROM t",
    "toInt64": "SELECT toInt64('42') FROM t",
    "toUInt8": "SELECT toUInt8('42') FROM t",
    "toUInt16": "SELECT toUInt16('42') FROM t",
    "toUInt32": "SELECT toUInt32('42') FROM t",
    "toUInt64": "SELECT toUInt64('42') FROM t",
    "toFloat32": "SELECT toFloat32('4.5') FROM t",
    "toFloat64": "SELECT toFloat64('4.5') FROM t",
    "toDate": "SELECT toDate('2024-01-02') FROM t",
    "toDate32": "SELECT toDate32('2024-01-02') FROM t",
    "toDateTime": "SELECT toDateTime('2024-01-02 03:04:05') FROM t",
    "toDateTime32":
        "SELECT toDateTime32('2024-01-02 03:04:05') FROM t",
    "toDateTime64":
        "SELECT toDateTime64('2024-01-02 03:04:05', 3) FROM t",
    "toDecimal32": "SELECT toDecimal32('1.25', 3) FROM t",
    "toDecimal64": "SELECT toDecimal64('1.25', 3) FROM t",
    "toDecimal128": "SELECT toDecimal128('1.25', 3) FROM t",
    "parseDateTime":
        "SELECT parseDateTime('2024-01-02', '%Y-%m-%d') FROM t",
    "str_to_date":
        "SELECT str_to_date('2024-01-02', '%Y-%m-%d') FROM t",
    "parseDateTimeInJodaSyntax":
        "SELECT parseDateTimeInJodaSyntax('2024-01-02', "
        "'yyyy-MM-dd') FROM t",
    "toModifiedJulianDay":
        "SELECT toModifiedJulianDay('2024-01-02') FROM t",
    "IPv4StringToNum": "SELECT IPv4StringToNum('1.2.3.4') FROM t",
    "toIPv4": "SELECT toIPv4('1.2.3.4') FROM t",
    "isIPAddressInRange":
        "SELECT isIPAddressInRange('10.1.2.3', '10.0.0.0/8') FROM t",
    # a REAL v7 UUID (48-bit ms timestamp in 2024); the corpus's v4
    # placeholder decodes to year 10488, which ClickHouse would also
    # return as garbage — Python's datetime just can't REPRESENT it
    "UUIDv7ToDateTime":
        "SELECT UUIDv7ToDateTime("
        "'018f3b4a-5c00-7abc-8def-0123456789ab') FROM t",
    # boolean-argument spellings probed with non-boolean placeholders
    "and": "SELECT and(x > 1, y > 2) FROM t",
    "or": "SELECT or(x > 1, y > 2) FROM t",
    "not": "SELECT not(x > 1) FROM t",
    "xor": "SELECT xor(x > 1, y > 2) FROM t",
    "argMinIf": "SELECT argMinIf(x, y, x > 1) FROM t",
    "medianIf": "SELECT medianIf(x, x > 1) FROM t",
    "retention": "SELECT retention(x > 1, y > 2) FROM t",
    # window functions need their OVER clause at runtime
    "rank": "SELECT rank() OVER (ORDER BY x) FROM t",
    "dense_rank": "SELECT dense_rank() OVER (ORDER BY x) FROM t",
    "row_number": "SELECT row_number() OVER (ORDER BY x) FROM t",
    # string spellings probed with placeholder (a, b) column names
    "editDistance": "SELECT editDistance('abc', 'abd') FROM t",
    "levenshteinDistance":
        "SELECT levenshteinDistance('abc', 'abd') FROM t",
    "stringCompare": "SELECT stringCompare('abc', 'abd') FROM t",
    "stringJaccardIndex":
        "SELECT stringJaccardIndex('abc', 'bcd') FROM t",
    # array/map spellings probed with placeholder scalars
    "L1Distance": "SELECT L1Distance([1.0, 2.0], [2.0, 4.0]) FROM t",
    "L2Distance": "SELECT L2Distance([1.0, 2.0], [2.0, 4.0]) FROM t",
    "L2SquaredDistance":
        "SELECT L2SquaredDistance([1.0, 2.0], [2.0, 4.0]) FROM t",
    "LinfDistance":
        "SELECT LinfDistance([1.0, 2.0], [2.0, 4.0]) FROM t",
    "LpDistance":
        "SELECT LpDistance([1.0, 2.0], [2.0, 4.0], 3) FROM t",
    "cosineDistance":
        "SELECT cosineDistance([1.0, 2.0], [2.0, 4.0]) FROM t",
    "dotProduct": "SELECT dotProduct([1.0, 2.0], [2.0, 4.0]) FROM t",
    "arrayDotProduct":
        "SELECT arrayDotProduct([1.0, 2.0], [2.0, 4.0]) FROM t",
    "arrayIntersect": "SELECT arrayIntersect(a, a2) FROM t",
    "arrayUnion": "SELECT arrayUnion(a, a2) FROM t",
    "arraySymmetricDifference":
        "SELECT arraySymmetricDifference(a, a2) FROM t",
    "arrayJaccardIndex": "SELECT arrayJaccardIndex(a, a2) FROM t",
    "arrayZipUnaligned": "SELECT arrayZipUnaligned(a, a2) FROM t",
    "arrayFlatten": "SELECT arrayFlatten([[1, 2], [3]]) FROM t",
    "arrayFold":
        "SELECT arrayFold((acc, av) -> acc + av, [1, 2, 3], "
        "toInt64(0)) FROM t",
    "hasAll": "SELECT hasAll(a, a2) FROM t",
    "hasAny": "SELECT hasAny(a, a2) FROM t",
    "hasSubstr": "SELECT hasSubstr(a, a2) FROM t",
    "mapFromArrays":
        "SELECT mapFromArrays(['k1', 'k2'], [1, 2]) FROM t",
    "maxMap": "SELECT maxMap([1, 2], [10, 20]) FROM t",
    "uniqThetaUnion": "SELECT uniqThetaUnion(a, a2) FROM t",
    # the JSON serializer covers complex types (scalars are a
    # documented delta — Spark's to_json has no scalar form)
    "toJSONString": "SELECT toJSONString(m) FROM t",
    # AES needs a 16/24/32-byte key at runtime
    "encrypt":
        "SELECT encrypt('aes-128-ecb', s, '0123456789abcdef') FROM t",
    "decrypt":
        "SELECT decrypt('aes-128-ecb', encrypt('aes-128-ecb', s, "
        "'0123456789abcdef'), '0123456789abcdef') FROM t",
    # valid transport for the strict decoder
    "base64Decode": "SELECT base64Decode(base64Encode(s)) FROM t",
    # regression probed with placeholder (a, b) columns
    "simpleLinearRegression":
        "SELECT simpleLinearRegression(x, y) FROM t",
    # date arithmetic probed with placeholder (a, b) columns
    "age": "SELECT age('day', t1, t2) FROM t",
    "date_diff": "SELECT date_diff('day', t1, t2) FROM t",
    # the -Merge combinators fold a -State column: build one inline
    "uniqThetaMerge":
        "SELECT uniqThetaMerge(st) FROM "
        "(SELECT uniqThetaState(x) AS st FROM t)",
    "uniqHLL12Merge":
        "SELECT uniqHLL12Merge(st) FROM "
        "(SELECT uniqHLL12State(x) AS st FROM t)",
}

# Compiled probes whose EXECUTION failure is a placeholder artifact
# no override can express.  Every entry carries its justification;
# anything not listed here must analyze and run.
ALLOWED_EXEC_FAILURES: dict[str, str] = {}


def run_exec_battery(spark) -> dict[str, list[tuple[str, str]]]:
    spark.sql(DUMMY_VIEW_SQL)
    res: dict[str, list[tuple[str, str]]] = {
        "ran": [], "allowed": [], "FAILED": [],
    }
    for label, sql in leak_probe.PROBES.items():
        sql = EXEC_OVERRIDES.get(label, sql)
        status, detail = leak_probe.classify(label, sql)
        if status != "compiled":
            continue
        try:
            spark.sql(detail).collect()
            res["ran"].append((label, ""))
        except Exception as e:  # noqa: BLE001 — the failure IS the finding
            kind = type(e).__name__
            note = f"{kind}: {str(e)[:160]}"
            if label in ALLOWED_EXEC_FAILURES:
                res["allowed"].append((label, note))
            else:
                res["FAILED"].append((label, note))
    return res


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("exec_probe")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = run_exec_battery(spark)
    for label, note in res["FAILED"]:
        print(f"FAILED: {label} -> {note}")
    print(
        f"compiled-probes ran={len(res['ran'])} "
        f"allowed-artifacts={len(res['allowed'])} "
        f"failed={len(res['FAILED'])}"
    )
    return 1 if res["FAILED"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
