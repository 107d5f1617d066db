"""Regression pin for the EXEC-level probe battery.

``tests/test_leak_probe.py`` pins the translate level (every public
spelling compiles or fails fast).  This file pins the next level
down: every COMPILED probe must also analyze AND run on a live
SparkSession — a compile Spark's analyzer rejects (arity, resolver,
type error) or that throws at execution (ANSI cast/index) is a broken
translation hiding behind a green translate-level probe.  The
round-14 exec sweep caught two real ones this way
(simpleLinearRegression missing DOUBLE casts for regr_slope;
quantileGK silently accepting a fractional accuracy parameter).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import exec_probe  # noqa: E402
import pytest


@pytest.mark.slow
def test_exec_battery_runs_clean(spark):
    res = exec_probe.run_exec_battery(spark)
    assert not res["FAILED"], res["FAILED"]
    # the battery stays meaningful: the compiled majority executes,
    # and the allowlist never silently swallows new failures
    assert len(res["ran"]) > 500
    assert set(l for l, _ in res["allowed"]) == set(
        exec_probe.ALLOWED_EXEC_FAILURES
    ) or not res["allowed"]


def test_exec_overrides_reference_real_probes():
    """Every override must shadow an existing probe label — a typo'd
    key would silently leave the original failing probe in place."""
    import leak_probe

    unknown = set(exec_probe.EXEC_OVERRIDES) - set(leak_probe.PROBES)
    assert not unknown, unknown
