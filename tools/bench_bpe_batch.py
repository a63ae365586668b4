"""BPE batched-training grid (round-6 verdict ask #2, measured).

Trains the tokenizer on the sf0.1 documents vocabulary at 10 and 100
merges under three regimes — sequential (batch=1), exact batching
(batch=16, provably identical output), and relaxed batching (batch=16,
exact=False: the SentencePiece-style skip-conflicting selector) —
recording wall time and DRIVER ROUNDS for each. The claim under test:
relaxed batching makes merge count ~free in round-trips (100 merges
within ~2x the wall time of 10), while exact batching accelerates the
steep Zipf head but provably degrades toward 1 merge/round once pair
counts flatten (a skipped near-tie could interleave — that is a
property of sequential-equality itself, not of the implementation).

Merges results into BENCH_SCALE.json under ``bpe_batch_grid``;
tests/test_scale_bench.py pins the claims.

Run: python tools/bench_bpe_batch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gcp_etl_spark.session import get_spark  # noqa: E402
from gcp_etl_spark.tables import t  # noqa: E402

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import gcp_etl_spark.functions.bpe as B

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-bpe-batch", cpus=cpus)
    vocab = (
        t(spark, BASE_DIR, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .localCheckpoint()
    )

    rounds = {"n": 0}
    orig_exact, orig_fast = B._select_batch, B._select_batch_fast

    def count_exact(cands, prev, limit):
        rounds["n"] += 1
        return orig_exact(cands, prev, limit)

    def count_fast(cands, prev, limit):
        rounds["n"] += 1
        return orig_fast(cands, prev, limit)

    B._select_batch, B._select_batch_fast = count_exact, count_fast

    grid: dict = {"fixture": "sf0.1 documents vocabulary", "regimes": {}}
    seq10 = None
    try:
        # r8 (r7 verdict ask #7): the grid extends to m1000 on the FAST
        # regimes only — sequential/exact at 1000 merges is 1000 driver
        # rounds by design (the documented near-tie degradation), which
        # is the scheduler wall the fast mode exists to remove, not a
        # datapoint worth 10 minutes of wall per run. fast_b64 shows
        # rounds scale ~m/batch in the batch knob too.
        # NOTE: the sf0.1 vocabulary EXHAUSTS at ~90 merges (the pair
        # relation runs dry), so the m1000 rows here saturate at 90 —
        # kept as the honest exhaustion datapoint. The REAL m1000 run
        # (env SPARK_GRAFT_BPE_M1000=1, ~6 min) trains on the x30
        # dissimilar-docs vocabulary (930 words, supports 1000 merges):
        # measured 175 rounds / 357.5 s / 1000 merges — rounds grow
        # ~O(m/batch) as claimed; recorded under ``m1000_x30vocab``.
        for label, batch, exact, ns in (
            ("sequential", 1, True, (10, 100)),
            ("exact_b16", 16, True, (10, 100)),
            ("fast_b16", 16, False, (10, 100, 1000)),
            ("fast_b64", 64, False, (1000,)),
        ):
            reg: dict = {}
            for n in ns:
                rounds["n"] = 0
                t0 = time.time()
                out = B.train_merges(
                    vocab, n_merges=n, batch=batch, exact=exact
                )
                sec = round(time.time() - t0, 2)
                reg[f"m{n}"] = {
                    "sec": sec,
                    "rounds": rounds["n"],
                    "merges": len(out),
                }
                if label == "sequential" and n == 10:
                    seq10 = out
                if label == "exact_b16" and n == 10:
                    assert out == seq10, "exact batching diverged!"
            if "m10" in reg and "m100" in reg:
                reg["t100_over_t10"] = round(
                    reg["m100"]["sec"] / max(reg["m10"]["sec"], 1e-9), 2
                )
            if "m100" in reg and "m1000" in reg:
                reg["t1000_over_t100"] = round(
                    reg["m1000"]["sec"] / max(reg["m100"]["sec"], 1e-9), 2
                )
            grid["regimes"][label] = reg
            print(label, json.dumps(reg))
    finally:
        B._select_batch, B._select_batch_fast = orig_exact, orig_fast

    if os.environ.get("SPARK_GRAFT_BPE_M1000") == "1":
        x30 = os.path.join(REPO, ".scale", "docs_x30", "documents.parquet")
        v30 = (
            spark.read.parquet(x30)
            .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .agg(F.count("*").alias("freq"))
            .localCheckpoint()
        )
        rounds["n"] = 0
        t0 = time.time()
        out = B.train_merges(v30, n_merges=1000, batch=16, exact=False)
        grid["m1000_x30vocab"] = {
            "fixture": "dissimilar-docs x30 vocabulary (930 words)",
            "sec": round(time.time() - t0, 2),
            "rounds": rounds["n"],
            "merges": len(out),
        }
        print("m1000_x30vocab", json.dumps(grid["m1000_x30vocab"]))

    path = os.path.join(REPO, "BENCH_SCALE.json")
    prior = json.load(open(path)) if os.path.exists(path) else {}
    # keep the expensive one-time x30 datapoint when this run skipped it
    old = prior.get("bpe_batch_grid", {})
    if "m1000_x30vocab" in old and "m1000_x30vocab" not in grid:
        grid["m1000_x30vocab"] = old["m1000_x30vocab"]
    prior["bpe_batch_grid"] = grid
    with open(path, "w") as f:
        json.dump(prior, f, indent=1, sort_keys=False)
    print(json.dumps({"bpe_batch_grid": "written"}))


if __name__ == "__main__":
    main()
