"""Oracle parity for the round-11 staged wave (held OUT of REGISTRY
until round-11 activation — see staged_r11.py module doc).  Mirrors
the driver's CORRECTNESS gate at sf0.001/sf0.01 via the shared
canon/run_oracle harness; scripts/strict_parity.py --staged widens the
sweep to sf0.1."""

from __future__ import annotations

import pytest

from clickbom_spark.queries import REGISTRY
from clickbom_spark.queries.staged_r11 import STAGED_R11
from tests.conftest import SF_CORRECT
from tests.test_parity import canon, run_oracle

ORACLE_STAGED = sorted(n for n, s in STAGED_R11.items() if s.oracle)
ROWS_ONLY_STAGED = sorted(n for n, s in STAGED_R11.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_STAGED)
def test_staged_r11_oracle_parity(spark, name):
    import pandas as pd

    spec = STAGED_R11[name]
    got = canon(spec.fn(spark, SF_CORRECT).toPandas())
    want = canon(run_oracle(spec.oracle, SF_CORRECT))
    assert list(got.columns) == list(want.columns), (
        f"{name} columns: {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_staged_r11_activated_identically():
    """Round 11 activated the wave: every staged name must be live in
    REGISTRY and bound to the SAME QuerySpec object — activation was
    REGISTRY.update(STAGED_R11), not a re-wrap."""
    missing = set(STAGED_R11) - set(REGISTRY)
    assert not missing, f"staged r11 names not activated: {missing}"
    for name, spec in STAGED_R11.items():
        assert REGISTRY[name] is spec, f"{name} was shadowed on activation"
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
        assert spec.name == name


def test_staged_r11_every_query_has_oracle():
    """Round-7 lesson (VERDICT r7 item 2): deliberately-oracle-less
    queries burn driver verification slots.  The r11 wave ships fully
    oracle-backed."""
    assert not ROWS_ONLY_STAGED
