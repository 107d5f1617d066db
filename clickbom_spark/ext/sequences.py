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


_WF_NEG = -(10**18)  # "unset" sentinel, far below any epoch-µs value


def window_funnel_level(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_us: Column,
    tie: Column,
    level: Column,
    n_levels: int,
    window_us: int,
    out_col: str = "funnel_level",
    mode: str = "default",
) -> DataFrame:
    """ClickHouse ``windowFunnel(window)(ts, cond1..condL)``: per key,
    the maximum chain depth where step i+1 occurs at-or-after step i
    and within ``window_us`` of the chain's FIRST event.

    ``mode='strict_order'`` adds ClickHouse's interleaving rule: an
    event matching NO condition (``level`` 0) kills every in-flight
    chain (the A→B→D→C example — the search for A→B→C stops at D); a
    fresh chain may start afterwards.  Level-0 events must then be
    KEPT in the fold, so per-key state covers all events, exactly the
    cost ClickHouse pays.

    ``mode='strict_deduplication'`` / ``mode='strict_increase'`` need
    the per-level (chain-first, last-step) PAIR state ClickHouse
    itself keeps (public AggregateFunctionWindowFunnel:
    ``events_timestamp[i] = {first_ts, this_ts}``), so they route to
    :func:`_window_funnel_pairs`:

    * strict_deduplication — an event matching condition ``j >= 2``
      whose level-``j`` slot is ALREADY SET interrupts further
      processing; the depth achieved so far is the final answer
      (repeated level-1 events just restart chains, mirroring the
      source's unconditional first-slot overwrite).
    * strict_increase — step ``j`` only advances when the previous
      step's LAST event time is STRICTLY before this event
      (equal-timestamp chains stall, exactly the source's
      ``events_timestamp[j-1]->second < timestamp`` check).

    Greedy fold over the time-ordered stream (later chain starts are
    never worse — they leave more window for future steps), so the
    state is just the best (latest) chain-start time per achieved
    level:

        level 1 event at t:  s1 = max(s1, t)
        level i event at t:  if s_{i-1} >= t - window: s_i = max(s_i, s_{i-1})

    Monotone (s_i set implies s_{i-1} set), so the final depth is the
    count of set levels.  Pure integer fold over a per-key sorted
    array — deterministic under the (ts, tie) total order and
    replayable in any engine with a list reduce.  Events with
    ``level`` 0 are dropped before the collect, so per-key state is
    bounded by the matching events only.
    """
    if mode not in (
        "default", "strict_order", "strict_deduplication",
        "strict_increase",
    ):
        raise ValueError(f"unknown windowFunnel mode: {mode!r}")
    src = df.select(
        *[F.col(c) for c in key_cols],
        ts_us.alias("_t"),
        tie.alias("_tb"),
        level.cast("int").alias("_l"),
    )
    if mode != "strict_order":
        src = src.where(F.col("_l") > 0)
    if mode in ("strict_deduplication", "strict_increase"):
        return _window_funnel_pairs(
            src, key_cols, n_levels, window_us, out_col, mode
        )
    packed = F.array_sort(
        F.collect_list(F.struct(F.col("_t").alias("t"),
                                F.col("_tb").alias("tb"),
                                F.col("_l").alias("l")))
    )
    # strict_order carries one extra slot: the best depth achieved by
    # any chain BEFORE an interruption (levels reached still count —
    # the interruption only stops deepening).
    seed = F.array(
        *[F.lit(_WF_NEG).cast("long") for _ in range(n_levels)],
        *([F.lit(0).cast("long")] if mode == "strict_order" else []),
    )

    def _depth_of(acc: Column) -> Column:
        d = None
        for k in range(1, n_levels + 1):
            b = F.when(
                F.element_at(acc, k) > F.lit(_WF_NEG), 1
            ).otherwise(0)
            d = b if d is None else d + b
        return d.cast("long")

    def step(acc: Column, x: Column) -> Column:
        slots = []
        slots.append(
            F.when(
                x["l"] == 1, F.greatest(F.element_at(acc, 1), x["t"])
            ).otherwise(F.element_at(acc, 1))
        )
        for k in range(2, n_levels + 1):
            prev = F.element_at(acc, k - 1)
            cur = F.element_at(acc, k)
            slots.append(
                F.when(
                    (x["l"] == k) & (prev >= x["t"] - F.lit(window_us)),
                    F.greatest(cur, prev),
                ).otherwise(cur)
            )
        if mode != "strict_order":
            return F.array(*slots)
        best = F.greatest(F.element_at(acc, n_levels + 1),
                          _depth_of(acc))
        kill = x["l"] == 0
        return F.array(
            *[
                F.when(kill, F.lit(_WF_NEG).cast("long")).otherwise(s)
                for s in slots
            ],
            F.when(kill, best).otherwise(
                F.element_at(acc, n_levels + 1)),
        )

    state = F.aggregate(packed, seed, step)
    depth = _depth_of(state)
    if mode == "strict_order":
        depth = F.greatest(depth, F.element_at(state, n_levels + 1))
    return src.groupBy(*key_cols).agg(
        depth.cast("long").alias(out_col)
    )


def _window_funnel_pairs(
    src: DataFrame,
    key_cols: Sequence[str],
    n_levels: int,
    window_us: int,
    out_col: str,
    mode: str,
) -> DataFrame:
    """windowFunnel fold with ClickHouse's OWN per-level state: one
    ``(chain_first_ts, last_step_ts)`` pair per level, last-write-wins
    (the source overwrites unconditionally whenever the time check
    passes — equivalent to keep-max because the previous level's first
    timestamp is non-decreasing over the scan).  The pair carries the
    information the compressed best-start fold drops: ``last_step_ts``
    anchors strict_increase's strictly-before check, and slot
    OCCUPANCY anchors strict_deduplication's interruption rule.

    State layout (``2·n_levels + 1`` bigints): ``[f1, l1, …, fn, ln,
    frozen]`` where ``frozen`` is -1 while scanning and the final
    depth once strict_deduplication interrupts (strict_increase never
    freezes).  Level-0 rows are dropped upstream — neither mode
    reacts to non-matching events.  Pure integer fold over the
    per-key (ts, tie)-sorted array: deterministic, engine-portable,
    replayed verbatim by the DuckDB list_reduce oracles in
    queries/staged_r11.py."""
    packed = F.array_sort(
        F.collect_list(F.struct(F.col("_t").alias("t"),
                                F.col("_tb").alias("tb"),
                                F.col("_l").alias("l")))
    )
    seed = F.array(
        *[F.lit(_WF_NEG).cast("long") for _ in range(2 * n_levels)],
        F.lit(-1).cast("long"),
    )
    frozen_at = 2 * n_levels + 1

    def _f(acc, k):  # chain-first slot of level k (1-based)
        return F.element_at(acc, 2 * k - 1)

    def _last(acc, k):  # last-step slot of level k
        return F.element_at(acc, 2 * k)

    def _depth(acc: Column) -> Column:
        d = None
        for k in range(1, n_levels + 1):
            b = F.when(_f(acc, k) > F.lit(_WF_NEG), 1).otherwise(0)
            d = b if d is None else d + b
        return d.cast("long")

    def step(acc: Column, x: Column) -> Column:
        frozen = F.element_at(acc, frozen_at)
        if mode == "strict_deduplication":
            # static per-level slot checks (mirrors the DuckDB oracle,
            # where a non-constant list index inside the fold lambda
            # hits a vectorization bug in 1.0)
            stop = F.lit(False)
            for k in range(2, n_levels + 1):
                stop = stop | ((x["l"] == k) & (_f(acc, k) > F.lit(_WF_NEG)))
        else:
            stop = F.lit(False)
        slots = []
        for k in range(1, n_levels + 1):
            if k == 1:
                hit = x["l"] == 1
                new_f, new_l = x["t"], x["t"]
            else:
                hit = (
                    (x["l"] == k)
                    & (_f(acc, k - 1) > F.lit(_WF_NEG))
                    & (x["t"] <= _f(acc, k - 1) + F.lit(window_us))
                )
                if mode == "strict_increase":
                    hit = hit & (_last(acc, k - 1) < x["t"])
                new_f, new_l = _f(acc, k - 1), x["t"]
            keep_f, keep_l = _f(acc, k), _last(acc, k)
            advance = hit & ~stop
            slots.append(F.when(advance, new_f).otherwise(keep_f))
            slots.append(F.when(advance, new_l).otherwise(keep_l))
        # ClickHouse returns the DUPLICATE's condition number on an
        # interruption (AggregateFunctionWindowFunnel early-returns
        # events_list[i].second), which can be SMALLER than the depth
        # already achieved — e.g. A B C then a duplicate B yields 2
        new_frozen = (
            F.when(stop, x["l"].cast("long")).otherwise(frozen)
            if mode == "strict_deduplication" else frozen
        )
        updated = F.array(*slots, new_frozen)
        # once interrupted, the scan is over: state never changes again
        return F.when(frozen >= 0, acc).otherwise(updated)

    state = F.aggregate(packed, seed, step)
    depth = F.when(
        F.element_at(state, frozen_at) >= 0,
        F.element_at(state, frozen_at),
    ).otherwise(_depth(state))
    return src.groupBy(*key_cols).agg(
        depth.cast("long").alias(out_col)
    )


def sequence_match(seq: Column, steps: Sequence[str]) -> Column:
    """Boolean subsequence test — ClickHouse ``sequenceMatch``.  The
    regex form ``s0.*s1.*…`` over the symbol string is the literal
    transliteration of the condition chain."""
    pattern = ".*".join(steps)
    return seq.rlike(pattern)
