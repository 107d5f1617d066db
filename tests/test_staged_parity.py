"""Oracle parity for the STAGED (round-6 wave) queries.

Same harness as tests/test_parity.py, but parametrized over
clickbom_spark.queries.staged.STAGED — these queries are held out of
the live REGISTRY until the next round's driver wave, yet must already
pass the identical DuckDB comparison so activation is a no-risk flip.
"""

from __future__ import annotations

import pytest

from clickbom_spark.queries.staged import STAGED
from tests.conftest import SF_CORRECT
from tests.test_parity import canon, run_oracle

ORACLE_STAGED = sorted(n for n, s in STAGED.items() if s.oracle)
ROWS_ONLY_STAGED = sorted(n for n, s in STAGED.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_STAGED)
def test_staged_oracle_parity(spark, name):
    spec = STAGED[name]
    got = canon(spec.fn(spark, SF_CORRECT).toPandas())
    want = canon(run_oracle(spec.oracle, SF_CORRECT))
    assert list(got.columns) == list(want.columns), (
        f"{name} columns: {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} != {len(want)}"
    try:
        import pandas as pd

        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=True
        )
    except AssertionError:
        diff = got.compare(want) if got.shape == want.shape else None
        raise AssertionError(f"{name} value mismatch:\n{diff}")


@pytest.mark.parametrize("name", ROWS_ONLY_STAGED)
def test_staged_rows_only(spark, name):
    spec = STAGED[name]
    df = spec.fn(spark, SF_CORRECT)
    assert df.count() >= 0
    assert df.schema.fieldNames()


def test_staged_names_disjoint_from_registry():
    from clickbom_spark.queries import REGISTRY

    overlap = set(STAGED) & set(REGISTRY)
    assert not overlap, f"staged names collide with live registry: {overlap}"


def test_staged_activation_dry_run():
    """The documented round-6 flip — REGISTRY.update(STAGED) — must
    yield a registry that still satisfies the driver contract: unique
    names, callable fns, oracle strings where present, and stable
    iteration (no name shadowing)."""
    from clickbom_spark.queries import REGISTRY

    merged = dict(REGISTRY)
    before = len(merged)
    merged.update(STAGED)
    assert len(merged) == before + len(STAGED)
    for name, spec in merged.items():
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
        assert spec.name == name


def test_quantile_sketch_query_reports_tight_bounds(spark):
    """The rows-only sketch query's self-reported invariants must
    actually hold: weight conservation and rank error within the KLL
    guarantee band at k=256."""
    rows = STAGED["q_quantile_sketch"].fn(spark, SF_CORRECT).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["weight_conserved"] is True
        assert r["rank_err"] < 0.02, (r["prob"], r["rank_err"])
