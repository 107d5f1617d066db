"""Oracle parity for the STAGED round-7 wave — the exact driver
comparison (row count, column names, order-insensitive exact values)
over clickbom_spark.queries.staged_r7.STAGED_R7, which is held out of
the live REGISTRY until round 7's activation flip."""

from __future__ import annotations

import pytest

from clickbom_spark.queries import REGISTRY
from clickbom_spark.queries.staged_r7 import STAGED_R7
from tests.conftest import SF_CORRECT
from tests.test_parity import canon, run_oracle

ORACLE_STAGED = sorted(n for n, s in STAGED_R7.items() if s.oracle)
ROWS_ONLY_STAGED = sorted(n for n, s in STAGED_R7.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_STAGED)
def test_staged_r7_oracle_parity(spark, name):
    import pandas as pd

    spec = STAGED_R7[name]
    got = canon(spec.fn(spark, SF_CORRECT).toPandas())
    want = canon(run_oracle(spec.oracle, SF_CORRECT))
    assert list(got.columns) == list(want.columns), (
        f"{name} columns: {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", ROWS_ONLY_STAGED)
def test_staged_r7_rows_only(spark, name):
    df = STAGED_R7[name].fn(spark, SF_CORRECT)
    assert df.count() >= 0
    assert df.schema.fieldNames()


def test_staged_r7_names_disjoint_from_registry():
    overlap = set(STAGED_R7) & set(REGISTRY)
    assert not overlap, f"r7 staged names collide with live registry: {overlap}"


def test_staged_r7_activation_dry_run():
    merged = dict(REGISTRY)
    before = len(merged)
    merged.update(STAGED_R7)
    assert len(merged) == before + len(STAGED_R7)
    for name, spec in merged.items():
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
        assert spec.name == name
