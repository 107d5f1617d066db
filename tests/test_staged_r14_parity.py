"""Oracle parity for the round-14 staged wave (built AHEAD during
round 11, the same two-rounds-out pipeline the r12 wave followed;
held OUT of REGISTRY until round-14 activation — see staged_r14.py
module doc).  Mirrors the driver's CORRECTNESS gate at sf0.001/sf0.01
via the shared canon/run_oracle harness; ``scripts/strict_parity.py
--staged`` widens the sweep to sf0.1 with dtype-strict hashing (run
it before EVERY activation)."""

from __future__ import annotations

import pytest

from clickbom_spark.queries import REGISTRY
from clickbom_spark.queries.staged_r12 import STAGED_R12
from clickbom_spark.queries.staged_r13 import STAGED_R13
from clickbom_spark.queries.staged_r14 import STAGED_R14
from tests.conftest import SF_CORRECT
from tests.test_parity import canon, run_oracle

ORACLE_STAGED = sorted(n for n, s in STAGED_R14.items() if s.oracle)
ROWS_ONLY_STAGED = sorted(n for n, s in STAGED_R14.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_STAGED)
def test_staged_r14_oracle_parity(spark, name):
    import pandas as pd

    spec = STAGED_R14[name]
    got = canon(spec.fn(spark, SF_CORRECT).toPandas())
    want = canon(run_oracle(spec.oracle, SF_CORRECT))
    assert list(got.columns) == list(want.columns), (
        f"{name} columns: {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_staged_r14_activated_into_registry():
    """Round-14 activation: every staged r14 name must now be IN
    REGISTRY and bound to the SAME QuerySpec object — activation was
    REGISTRY.update(STAGED_R14), not a re-wrap.  (Pre-activation this
    test was the disjointness guard; the wave stays disjoint from the
    earlier r12/r13 waves by construction — asserted below — and the
    pending r15+ waves assert their own disjointness in their
    files.)"""
    missing = set(STAGED_R14) - set(REGISTRY)
    assert not missing, f"staged r14 names not activated: {missing}"
    assert not (set(STAGED_R14) & (set(STAGED_R12) | set(STAGED_R13)))
    for name, spec in STAGED_R14.items():
        assert REGISTRY[name] is spec, f"{name} was shadowed on activation"
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
        assert spec.name == name


def test_staged_r14_every_query_has_oracle():
    assert not ROWS_ONLY_STAGED


def test_staged_r14_wave_size():
    # 23 built during round 11 + the four round-13 additions (oracle
    # round-trips for the r13 approximate-spelling compiles:
    # quantileGK, the snowflake ID family, negative-length left/right
    # + stringCompare, and the QUALIFY clause compile — VERDICT r12
    # next-round #8b) + the ALTER-migration pull-forward (#8c, net
    # zero with the q_word_length_distribution demotion)
    assert len(STAGED_R14) == 27
