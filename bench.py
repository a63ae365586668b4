"""Benchmark harness — runs the declared query corpus at sf0.1.

Prints ONE SHORT JSON line (last on stdout) the driver can parse:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "sf": 0.1, "n_queries": N, "queries": {<top-5 slowest>}}
The full per-query timing map goes to BENCH_DETAIL.json next to this
file (round 1 lesson: a ~5 KB single line with all 135 timings was
truncated by the driver's tail capture → "parsed": null).

Execution is forced through the ``noop`` datasource writer (full plan
runs on the executors, nothing is collected to the driver), which is
the honest way to time a distributed plan. Each query is timed after a
one-query warmup of the JVM/codegen paths.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_ONLY (comma list).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gcp_etl_spark.queries import load_all
from gcp_etl_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _dump_detail(sf: float, timings: dict, failures: list) -> None:
    """Write the full per-query timing map. Called incrementally (every
    20 queries) as well as at the end, so an externally-imposed wall
    timeout still leaves a usable partial detail file."""
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "declared_query_suite_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "sf": sf,
                "queries": timings,
                "failures": failures,
            },
            f,
            indent=1,
            sort_keys=True,
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    only = {
        s for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s
    }

    specs = load_all()
    spark = get_spark("bench")

    # warmup: JVM, codegen, parquet footers (failure-tolerant — a bad
    # warmup must not suppress the BENCH line)
    try:
        force(specs["q1_pricing_summary"].fn(spark, sf_dir))
    except Exception as e:  # noqa: BLE001
        print(f"# bench warmup failed: {e}", file=sys.stderr)

    # measured: gc every 4th query => suite ~17s SLOWER than every
    # query (heap/codegen pressure degrades the tail); keep 1
    gc_every = int(os.environ.get("SPARK_GRAFT_BENCH_GC_EVERY", "1"))
    restart_every = int(
        os.environ.get("SPARK_GRAFT_BENCH_RESTART_EVERY", "100")
    )
    timings: dict[str, float] = {}
    failures: list[str] = []
    for i, (name, spec) in enumerate(sorted(specs.items())):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            force(spec.fn(spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 - one bad query must not kill BENCH
            failures.append(name)
            print(f"# bench FAILURE {name}: {e}", file=sys.stderr)
        # isolate queries from each other: drop cached relations every
        # query, nudge the JVM periodically — 150 plans in one heap
        # otherwise degrade the tail of the suite by 2-4x (measured),
        # but a synchronous full GC per query costs more than it saves
        spark.catalog.clearCache()
        # clearCache only covers the SQL cache manager; localCheckpoint
        # blocks (iterative queries: connected components, PageRank)
        # live as raw persistent RDDs and would otherwise pile up in
        # unified memory, squeezing execution memory for every later
        # query's sorts/aggregations
        try:
            for jrdd in (
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                jrdd.unpersist(False)
        except Exception:  # noqa: BLE001 - cleanup must never kill bench
            pass
        if (i + 1) % gc_every == 0:
            spark.sparkContext._jvm.System.gc()
        if (i + 1) % 20 == 0:
            _dump_detail(sf, timings, failures)
            # cumulative parseable headline: if an external wall
            # timeout kills the run, the driver's "last JSON line"
            # parse still gets a partial-but-valid result instead of
            # nothing (the round-1 failure mode)
            print(
                json.dumps(
                    {
                        "metric": "declared_query_suite_wall",
                        "value": round(sum(timings.values()), 3),
                        "unit": "sec",
                        "sf": sf,
                        "n_queries": len(timings),
                        "partial": True,
                        "queries": dict(
                            sorted(timings.items(), key=lambda kv: -kv[1])[:3]
                        ),
                    }
                ),
                flush=True,
            )
        # Accumulated plans/codegen classes in one long-lived JVM
        # degrade the suite tail (one 294-query run timed 402 s where
        # the same queries isolated sum to far less; another blew past
        # 590 s) — a periodic clean session bounds that drift.
        if restart_every and (i + 1) % restart_every == 0:
            spark.stop()
            spark = get_spark("bench")

    total = round(sum(timings.values()), 3)
    _dump_detail(sf, timings, failures)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    )
    # keep this line SHORT (driver tail-capture truncates long lines)
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "queries": slowest,
                **({"n_failures": len(failures)} if failures else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
