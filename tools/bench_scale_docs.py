"""Exact-similarity scale grid — one more decade (round-3 VERDICT #4).

The newest exact similarity joins (prefix-filter / containment /
substring-spans) had a single 10x datapoint in BENCH_SCALE.json, and
that fixture's near-dup-clique planting grows the TRUE pair set
~quadratically with the multiplier (every base doc becomes an m-way
clique), which conflates output growth with algorithmic scaling.

This grid uses the ``--dissimilar-docs`` fixture (tools/gen_scale.py):
replica words carry a per-replica tag, so cross-replica similarity is
ZERO and the true pair set is exactly m independent copies of the base
structure — output grows LINEARLY, and the timing exponent measures
pure corpus-size scaling of the algorithm. Grid: mult 1 (the driver's
sf0.1 documents), 10, 30, 100 (= "sf10", 500k docs).

For each query and scale we run the plan once via .count() (executes
the full plan AND yields the output pair count in one pass) and fit
the scaling exponent by least squares over log(mult) -> log(sec).
Results merge into BENCH_SCALE.json under ``exact_similarity_grid``;
tests/test_scale_bench.py pins the claims.

Run:  python tools/bench_scale_docs.py          (builds fixtures on demand)
Env:  SPARK_GRAFT_DOCS_MULTS=10,30,100 to override the grid.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_ROOT = os.path.join(REPO, ".scale")

QUERIES = ("dedup_prefix_filter", "dedup_containment", "dedup_substring_spans")

# round-4 text/dedup additions (r4 VERDICT ask #6): dedup_weighted_jaccard
# emits PAIRS (linear on the dissimilar fixture, same contract as the
# exact-similarity trio); the two text aggregates emit bounded top-k /
# per-bigram relations, so only the TIME exponent is the claim there.
TEXT_QUERIES = (
    "dedup_weighted_jaccard",
    "text_rake_keywords",
    "text_char_bigram_entropy",
)
TEXT_PAIR_QUERIES = {"dedup_weighted_jaccard"}

# round-6 additions that read ONLY the documents table: DSIR importance
# weights (hashed-bigram LLR), temperature mixture sampling, and the
# iterative BPE merge trainer. All emit bounded relations (top-50 /
# quota picks / 10 merges), so the TIME exponent is the claim.
R6_QUERIES = (
    "dsir_importance_weights",
    "mix_temperature_sampling",
    "bpe_train_merges",
    # late-round-6 docs-only additions: one-pass weighted top-k, the
    # two-pass global-rank shuffle order, and the fused 5-stage
    # curation pipeline — all bounded-output, TIME exponent is the claim
    "sample_weighted_reservoir",
    "prep_training_order",
    "pipeline_curation_e2e",
)

# semantic (embedding-space) dedup, on the dissimilar-EMBEDDINGS
# fixture: per-replica ORTHOGONAL transforms preserve intra-replica
# cosine structure exactly while cross-replica similarity collapses to
# noise, so true near-dup pairs grow linearly with the multiplier and
# the time exponent measures pure corpus-size scaling of the adaptive-
# planes LSH + chunked rescore (r5 VERDICT ask #3's datapoint).
# r7: mine_bitext_margin_ann joins the grid — its claim is the
# sub-quadratic candidate stream (sqrt(n) coarse cells, nprobe=3)
EMB_QUERIES = ("dedup_semantic", "mine_bitext_margin_ann")


def _fixture_dir(mult: int) -> str:
    return os.path.join(SCALE_ROOT, f"docs_x{mult}")


def _emb_fixture_dir(mult: int) -> str:
    return os.path.join(SCALE_ROOT, f"emb_x{mult}")


def ensure_emb_fixtures(mults: list[int]) -> None:
    from tools.gen_scale import generate

    for m in mults:
        out = _emb_fixture_dir(m)
        if os.path.exists(os.path.join(out, "embeddings.parquet")):
            continue
        print(f"building emb-only fixture x{m} -> {out}", file=sys.stderr)
        generate(
            BASE_DIR, out, m, tables=["embeddings"], dissimilar_emb=True
        )


def ensure_fixtures(mults: list[int]) -> None:
    from tools.gen_scale import generate

    for m in mults:
        out = _fixture_dir(m)
        if os.path.exists(os.path.join(out, "documents.parquet")):
            continue
        print(f"building docs-only fixture x{m} -> {out}", file=sys.stderr)
        generate(BASE_DIR, out, m, tables=["documents"], dissimilar_docs=True)


def _cleanup(spark) -> None:
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def _fit_exponent(points: list[tuple[int, float]]) -> float:
    """Least-squares slope of log(sec) vs log(mult)."""
    xs = [math.log10(m) for m, _ in points]
    ys = [math.log10(max(s, 1e-3)) for _, s in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return round(num / den, 2) if den else 0.0


def run_grid(
    spark,
    specs,
    queries: tuple[str, ...],
    mults: list[int],
    pair_queries: set[str] | frozenset[str],
    fixture_dir=_fixture_dir,
) -> dict[str, dict]:
    """Time each query across the multiplier grid; record the fitted
    time exponent, and — for pair-emitting queries — the linear
    true-pair contract of the dissimilar fixture."""
    import time as _time

    grid: dict[str, dict] = {}
    for name in queries:
        fn = specs[name].fn
        fn(spark, BASE_DIR).count()  # warmup (codegen/JIT/footers)
        _cleanup(spark)
        rows: dict[str, dict] = {}
        points: list[tuple[int, float]] = []
        pair_points: list[tuple[int, int]] = []
        for m in [1] + mults:
            d = BASE_DIR if m == 1 else fixture_dir(m)
            t0 = _time.time()
            n_out = fn(spark, d).count()
            dt = round(_time.time() - t0, 2)
            _cleanup(spark)
            rows[f"x{m}"] = {"sec": dt, "out_rows": n_out}
            points.append((m, dt))
            pair_points.append((m, n_out))
            print(f"{name} x{m}: {dt}s, {n_out} rows", file=sys.stderr)
        rec: dict = {
            "scales": rows,
            "time_exponent": _fit_exponent(points),
        }
        if name in pair_queries:
            base_pairs = pair_points[0][1]
            top_m, top_pairs = pair_points[-1]
            rec["pairs_exponent"] = _fit_exponent(
                [(m, float(p)) for m, p in pair_points]
            )
            # dissimilar fixture => true pairs = m x base pairs exactly
            rec["pairs_linear"] = top_pairs == top_m * base_pairs
            rec["sec_per_1k_pairs_x1"] = round(
                1000 * points[0][1] / max(base_pairs, 1), 3
            )
            rec[f"sec_per_1k_pairs_x{top_m}"] = round(
                1000 * points[-1][1] / max(top_pairs, 1), 3
            )
        grid[name] = rec
    return grid


def main() -> None:
    mults = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_DOCS_MULTS", "10,30,100").split(",")
    ]
    only_pre = os.environ.get("SPARK_GRAFT_DOCS_GRID", "both")
    if only_pre != "emb":
        ensure_fixtures(mults)
    if only_pre in ("both", "emb"):
        ensure_emb_fixtures(mults)

    from gcp_etl_spark.queries import load_all
    from gcp_etl_spark.session import get_spark

    specs = load_all()
    spark = get_spark("bench_scale_docs")
    only = os.environ.get("SPARK_GRAFT_DOCS_GRID", "both")

    out_path = os.path.join(REPO, "BENCH_SCALE.json")
    prior = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)

    headline: dict = {"metric": "docs_scale_grids", "max_mult": mults[-1]}
    if only in ("both", "exact"):
        grid = run_grid(spark, specs, QUERIES, mults, frozenset(QUERIES))
        # exact-similarity trio: all three emit pairs; keep the legacy
        # key name so round-over-round diffs stay aligned
        for rec in grid.values():
            for srow in rec["scales"].values():
                srow["out_pairs"] = srow.pop("out_rows")
        prior["exact_similarity_grid"] = {
            "fixture": "dissimilar-docs (linear true-pair growth), docs only",
            "base_docs": 5000,
            "mults": [1] + mults,
            "queries": grid,
        }
        headline["exact_time_exponents"] = {
            q: grid[q]["time_exponent"] for q in QUERIES
        }
    if only in ("both", "text", "r6"):
        pass
    if only in ("both", "r6"):
        rgrid = run_grid(spark, specs, R6_QUERIES, mults, frozenset())
        prior["r6_grid"] = {
            "fixture": "dissimilar-docs (linear true-pair growth), docs only",
            "base_docs": 5000,
            "mults": [1] + mults,
            "queries": rgrid,
        }
        headline["r6_time_exponents"] = {
            q: rgrid[q]["time_exponent"] for q in R6_QUERIES
        }
    if only in ("both", "r8"):
        # r8: token-level exact-substring dedup. The grid runs the
        # DF-CAPPED variant (the declared 100 TB path — the uncapped
        # twin's match matrix is Σ_g df_g², quadratic on boilerplate).
        # NOT registered as a pair query: the replica word-tags add ~2
        # BPE tokens per word, which SHIFTS the effective token-span
        # threshold inside replicas (a base span just under 32 tokens
        # qualifies once tagged), so output density is not
        # multiplier-invariant here; the TIME exponent is the claim.
        r8q = ("dedup_substring_tokens_dfcap",)
        r8grid = run_grid(spark, specs, r8q, mults, frozenset())
        prior["substring_tokens_docs_grid"] = {
            "fixture": "dissimilar-docs, docs only (tag-inflated token "
            "counts: out_rows not multiplier-invariant by design note)",
            "base_docs": 5000,
            "mults": [1] + mults,
            "queries": r8grid,
        }
        headline["r8_time_exponents"] = {
            q: r8grid[q]["time_exponent"] for q in r8q
        }
    if only in ("both", "r10"):
        # r10: unigram-LM EM tokenizer training. On the dissimilar-docs
        # fixture every replica's words carry a distinct tag, so the
        # DISTINCT-WORD vocabulary itself grows ~linearly with the
        # multiplier — the WORST case for a vocab-relation trainer
        # (real corpora grow ~corpus^0.5 by Heaps' law), making the
        # measured exponent an upper bound on the Heaps-world one.
        # Bounded output (top-30 pieces): the TIME exponent is the claim.
        r10q = ("train_unigram_lm",)
        r10grid = run_grid(spark, specs, r10q, mults, frozenset())
        prior["unigram_docs_grid"] = {
            "fixture": "dissimilar-docs, docs only (tag-distinct vocab "
            "grows ~linearly — worst case vs Heaps; exponent is an "
            "upper bound)",
            "base_docs": 5000,
            "mults": [1] + mults,
            "queries": r10grid,
        }
        headline["r10_time_exponents"] = {
            q: r10grid[q]["time_exponent"] for q in r10q
        }
    if only in ("both", "emb"):
        from gcp_etl_spark.llm.semdedup import adaptive_planes

        egrid = run_grid(
            spark,
            specs,
            EMB_QUERIES,
            mults,
            frozenset(),
            fixture_dir=_emb_fixture_dir,
        )
        import pyarrow.parquet as _pq

        base_vecs = _pq.read_metadata(
            os.path.join(BASE_DIR, "embeddings.parquet")
        ).num_rows
        for rec in egrid.values():
            rec["adaptive_planes"] = {
                f"x{m}": adaptive_planes(base_vecs * m) for m in [1] + mults
            }
        prior["semantic_emb_grid"] = {
            "fixture": (
                "dissimilar-embeddings (per-replica orthogonal transform, "
                "linear true-pair growth), embeddings only"
            ),
            "base_vecs": base_vecs,
            "mults": [1] + mults,
            "queries": egrid,
        }
        headline["emb_time_exponents"] = {
            q: egrid[q]["time_exponent"] for q in EMB_QUERIES
        }
    if only in ("both", "text"):
        tgrid = run_grid(
            spark, specs, TEXT_QUERIES, mults, TEXT_PAIR_QUERIES
        )
        prior["r4_text_grid"] = {
            "fixture": "dissimilar-docs (linear true-pair growth), docs only",
            "base_docs": 5000,
            "mults": [1] + mults,
            "queries": tgrid,
        }
        headline["text_time_exponents"] = {
            q: tgrid[q]["time_exponent"] for q in TEXT_QUERIES
        }

    with open(out_path, "w") as f:
        json.dump(prior, f, indent=1, sort_keys=False)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
