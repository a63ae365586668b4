"""Two-phase connected-components round growth on adversarial chains.

The algorithm's 100 TB claim is O(log n) rounds on long-diameter
graphs (where min-label propagation pays O(diameter)). This measures
ROUNDS and wall time on path graphs of 256 / 1024 / 4096 nodes and
records them under ``cc_chain_grid`` in BENCH_SCALE.json;
tests/test_scale_bench.py pins the logarithmic growth.

Run: python tools/bench_cc_chain.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gcp_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    from gcp_etl_spark.llm.cluster import connected_components

    spark = get_spark("bench-cc-chain", cpus=8, shuffle_partitions=8)
    grid: dict = {"fixture": "path graph (diameter = n-1)", "chains": {}}
    for n in (256, 1024, 4096):
        e = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long"
        )
        stats: dict = {}
        t0 = time.time()
        out = connected_components(e, algorithm="two-phase", stats=stats)
        rows = out.collect()
        sec = round(time.time() - t0, 2)
        assert len(rows) == n and all(r["comp"] == 0 for r in rows)
        grid["chains"][f"n{n}"] = {
            "rounds": stats["rounds"], "sec": sec
        }
        print(n, json.dumps(grid["chains"][f"n{n}"]))

    path = os.path.join(REPO, "BENCH_SCALE.json")
    prior = json.load(open(path)) if os.path.exists(path) else {}
    prior["cc_chain_grid"] = grid
    with open(path, "w") as f:
        json.dump(prior, f, indent=1, sort_keys=False)
    print(json.dumps({"cc_chain_grid": "written"}))


if __name__ == "__main__":
    main()
