"""Oracle parity for the round-12 staged wave (built AHEAD during
round 10; held OUT of REGISTRY until round-12 activation — see
staged_r12.py module doc).  Mirrors the driver's CORRECTNESS gate at
sf0.001/sf0.01 via the shared canon/run_oracle harness."""

from __future__ import annotations

import pytest

from clickbom_spark.queries import REGISTRY
from clickbom_spark.queries.staged_r11 import STAGED_R11
from clickbom_spark.queries.staged_r12 import STAGED_R12
from tests.conftest import SF_CORRECT
from tests.test_parity import canon, run_oracle

ORACLE_STAGED = sorted(n for n, s in STAGED_R12.items() if s.oracle)
ROWS_ONLY_STAGED = sorted(n for n, s in STAGED_R12.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_STAGED)
def test_staged_r12_oracle_parity(spark, name):
    import pandas as pd

    spec = STAGED_R12[name]
    got = canon(spec.fn(spark, SF_CORRECT).toPandas())
    want = canon(run_oracle(spec.oracle, SF_CORRECT))
    assert list(got.columns) == list(want.columns), (
        f"{name} columns: {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_staged_r12_activated_into_registry():
    """Round-12 activation: every staged r12 name must now be IN
    REGISTRY and bound to the SAME QuerySpec object — activation was
    REGISTRY.update(STAGED_R12), not a re-wrap.  (Pre-activation this
    test was the disjointness guard; the r11 wave stays disjoint by
    construction and is asserted in its own file.)"""
    missing = set(STAGED_R12) - set(REGISTRY)
    assert not missing, f"staged r12 names not activated: {missing}"
    assert not (set(STAGED_R12) & set(STAGED_R11))
    for name, spec in STAGED_R12.items():
        assert REGISTRY[name] is spec, f"{name} was shadowed on activation"
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
        assert spec.name == name


def test_staged_r12_every_query_has_oracle():
    assert not ROWS_ONLY_STAGED
