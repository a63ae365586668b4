"""Driver-canon hazard screen over the FULL declared corpus.

Every declared query's output schema must survive the driver's pandas
canonicalization (no complex-typed columns, timestamps inside the
datetime64[ns] range) — the round-1 ``agg_misc`` /
``scd2_merge_history`` failure modes, screened in CI so they can never
resurface on a never-before-sampled query (VERDICT r2 #7)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from tests.conftest import SF_SMALL  # noqa: E402


def test_all_declared_queries_are_canon_safe(spark):
    from audit_canon import audit

    violations = audit(spark, SF_SMALL)
    assert not violations, "\n".join(violations)
