"""Oracle parity for the round-17 staged wave (built during round 12
— the pipeline runs FIVE waves deep after the r16 build; held OUT of
REGISTRY until round-17 activation — see staged_r17.py module doc).
Mirrors the driver's CORRECTNESS gate at sf0.001/sf0.01 via the
shared canon/run_oracle harness; ``scripts/strict_parity.py
--staged`` widens the sweep to sf0.1 with dtype-strict hashing (run
it before EVERY activation)."""

from __future__ import annotations

import pytest

from clickbom_spark.queries import REGISTRY
from clickbom_spark.queries.staged_r13 import STAGED_R13
from clickbom_spark.queries.staged_r14 import STAGED_R14
from clickbom_spark.queries.staged_r15 import STAGED_R15
from clickbom_spark.queries.staged_r16 import STAGED_R16
from clickbom_spark.queries.staged_r17 import STAGED_R17
from tests.conftest import SF_CORRECT
from tests.test_parity import canon, run_oracle

# This wave is NOT yet activated in the registry (it ships in a
# future round): its parity battery is future-wave insurance, not
# active-surface certification, so it runs in the slow lane.
pytestmark = pytest.mark.slow

ORACLE_STAGED = sorted(n for n, s in STAGED_R17.items() if s.oracle)
ROWS_ONLY_STAGED = sorted(n for n, s in STAGED_R17.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_STAGED)
def test_staged_r17_oracle_parity(spark, name):
    import pandas as pd

    spec = STAGED_R17[name]
    got = canon(spec.fn(spark, SF_CORRECT).toPandas())
    want = canon(run_oracle(spec.oracle, SF_CORRECT))
    assert list(got.columns) == list(want.columns), (
        f"{name} columns: {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_staged_r17_disjoint():
    """The holdout must not shadow live registry names OR the pending
    r13/r14/r15/r16 waves — all activations are pure
    REGISTRY.updates."""
    clash = set(STAGED_R17) & (
        set(REGISTRY) | set(STAGED_R13) | set(STAGED_R14)
        | set(STAGED_R15) | set(STAGED_R16)
    )
    assert not clash, f"staged r17 names collide: {clash}"
    for name, spec in STAGED_R17.items():
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
        assert spec.name == name


def test_staged_r17_every_query_has_oracle():
    assert not ROWS_ONLY_STAGED


def test_staged_r17_wave_size():
    assert len(STAGED_R17) == 23
