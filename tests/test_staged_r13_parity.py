"""Oracle parity for the round-13 staged wave (built during round 11;
held OUT of REGISTRY until round-13 activation — see staged_r13.py
module doc).  Mirrors the driver's CORRECTNESS gate at sf0.001/sf0.01
via the shared canon/run_oracle harness; ``scripts/strict_parity.py
--staged`` widens the sweep to sf0.1 with dtype-strict hashing (run
it before EVERY activation — round-10 lesson a323ad0: pytest's
check_dtype=False hides int32-vs-int64 drift the driver's hash
catches)."""

from __future__ import annotations

import pytest

from clickbom_spark.queries import REGISTRY
from clickbom_spark.queries.staged_r12 import STAGED_R12
from clickbom_spark.queries.staged_r13 import STAGED_R13
from tests.conftest import SF_CORRECT
from tests.test_parity import canon, run_oracle

ORACLE_STAGED = sorted(n for n, s in STAGED_R13.items() if s.oracle)
ROWS_ONLY_STAGED = sorted(n for n, s in STAGED_R13.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_STAGED)
def test_staged_r13_oracle_parity(spark, name):
    import pandas as pd

    spec = STAGED_R13[name]
    got = canon(spec.fn(spark, SF_CORRECT).toPandas())
    want = canon(run_oracle(spec.oracle, SF_CORRECT))
    assert list(got.columns) == list(want.columns), (
        f"{name} columns: {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_staged_r13_activated_into_registry():
    """Round-13 activation: every staged r13 name must now be IN
    REGISTRY and bound to the SAME QuerySpec object — activation was
    REGISTRY.update(STAGED_R13), not a re-wrap.  (Pre-activation this
    test was the disjointness guard; the wave stays disjoint from the
    earlier r12 wave by construction — asserted below — and the
    pending r14+ waves assert their own disjointness in their
    files.)"""
    missing = set(STAGED_R13) - set(REGISTRY)
    assert not missing, f"staged r13 names not activated: {missing}"
    assert not (set(STAGED_R13) & set(STAGED_R12))
    for name, spec in STAGED_R13.items():
        assert REGISTRY[name] is spec, f"{name} was shadowed on activation"
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
        assert spec.name == name


def test_staged_r13_every_query_has_oracle():
    """Round-7 lesson (VERDICT r7 item 2): deliberately-oracle-less
    queries burn driver verification slots.  The r13 wave ships fully
    oracle-backed."""
    assert not ROWS_ONLY_STAGED


def test_staged_r13_wave_size():
    assert len(STAGED_R13) == 23
