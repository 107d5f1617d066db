"""Event-sequence pattern matching — the ClickHouse ``sequenceMatch``
/ ``sequenceCount`` analytics functions, Spark-shaped.

ClickHouse matches a condition chain ``(?1).*(?2).*(?3)`` against each
user's time-ordered event stream.  Here each event maps to a one-char
symbol; per user the stream becomes (a) a symbol string for boolean
subsequence tests (``rlike 'v.*c.*p'``) and (b) a code array folded
through a counting automaton for the non-overlapping match count:

    acc' = acc + 1  iff  code == (acc mod L) + 1

with L pattern steps — positional base-L encoding, so stage L-1
completing carries straight into the count digit and the final count
is ``acc div L``.  ClickHouse's sequenceCount scans left-to-right and
restarts after each completed match; the automaton is exactly that
scan.  Pure integer fold — any engine replays it bit-for-bit.

One groupBy per user (a hash aggregate over collect_list) is the only
shuffle; per-user streams are bounded (sessions/users, not the corpus),
matching ClickHouse's own per-key memory model.  Time-window
constraints (``(?t < N)``) would thread timestamps through the same
fold via a struct accumulator; not needed for the corpus queries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_symbol_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    symbol: Column,
    out_col: str = "seq",
) -> DataFrame:
    """Per-key time-ordered symbol string: collect (order..., symbol)
    structs, array_sort (deterministic total order — include a
    tie-break column), project the symbol, join to one string."""
    packed = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order_cols], symbol.alias("_sym")
            )
        )
    )
    return df.groupBy(*key_cols).agg(
        F.array_join(
            F.transform(packed, lambda s: s["_sym"]), ""
        ).alias(out_col)
    )


def _code_of(c: Column, steps: Sequence[str]) -> Column:
    """Step i's symbol becomes code i+1, everything else 0."""
    expr = F.lit(0).cast("long")
    for i, s in enumerate(steps):
        expr = F.when(c == F.lit(s), F.lit(i + 1).cast("long")).otherwise(expr)
    return expr


def sequence_count(seq: Column, steps: Sequence[str]) -> Column:
    """Non-overlapping left-to-right completions of ``steps`` within the
    symbol string — ClickHouse ``sequenceCount('(?1).*(?2)...')``."""
    length = len(steps)
    codes = F.filter(
        F.transform(F.split(seq, ""), lambda c: _code_of(c, steps)),
        lambda x: x > 0,
    )
    acc = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda a, x: a
        + F.when(x == F.pmod(a, F.lit(length)) + 1, 1).otherwise(0),
    )
    return F.floor(acc / F.lit(length)).cast("long")


def sequence_match(seq: Column, steps: Sequence[str]) -> Column:
    """Boolean subsequence test — ClickHouse ``sequenceMatch``.  The
    regex form ``s0.*s1.*…`` over the symbol string is the literal
    transliteration of the condition chain."""
    pattern = ".*".join(steps)
    return seq.rlike(pattern)
