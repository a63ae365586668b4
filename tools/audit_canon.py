"""Audit every declared query's OUTPUT schema for driver-canon safety.

The driver canonicalizes results through pandas (``sort_values`` over
all columns, then a value hash). Two classes of output break that
pipeline even when the values are correct:

- complex-typed columns (array/map/struct): unhashable in pandas'
  lexsort → hard error (the round-1 ``agg_misc`` failure);
- timestamps outside pandas' datetime64[ns] range
  (1677-09-21 .. 2262-04-11): OutOfBoundsDatetime (the round-1
  ``scd2_merge_history`` failure).

This tool builds each query's DataFrame at the given sf_dir, inspects
the schema (no job run unless a timestamp column needs a min/max
probe), and prints every violation. Exit 1 if any.

Also importable: ``audit(spark, sf_dir)`` returns the violation list,
and ``tests/test_canon_audit.py`` runs it over the full corpus so a
canon hazard fails CI before the driver ever samples the query.

Usage: python tools/audit_canon.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

PD_MIN = datetime.datetime(1677, 9, 22)
PD_MAX = datetime.datetime(2262, 4, 10)


def audit(spark, sf_dir: str, only: set[str] | None = None) -> list[str]:
    """Return one violation string per canon hazard (empty = clean)."""
    from gcp_etl_spark.queries import load_all

    violations: list[str] = []
    for name, spec in sorted(load_all().items()):
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            violations.append(f"ERR  {name}: build failed: {exc}")
            continue
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols:
            violations.append(f"FAIL {name}: complex output columns {complex_cols}")
        ts_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
        ]
        if ts_cols:
            aggs = []
            for c in ts_cols:
                aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
            row = df.agg(*aggs).collect()[0]
            for c in ts_cols:
                lo, hi = row[f"min_{c}"], row[f"max_{c}"]
                for v in (lo, hi):
                    if v is not None and not (
                        PD_MIN <= v.replace(tzinfo=None) <= PD_MAX
                    ):
                        violations.append(
                            f"FAIL {name}: timestamp {c} out of pandas range: {v}"
                        )
    return violations


def main() -> int:
    from gcp_etl_spark.session import get_spark

    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")
    )
    only = set(sys.argv[2:])
    violations = audit(get_spark(), sf_dir, only or None)
    for v in violations:
        print(v)
    print(f"{'CLEAN' if not violations else 'VIOLATIONS'}: {len(violations)}")
    return 1 if violations else 0


if __name__ == "__main__":
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    raise SystemExit(main())
