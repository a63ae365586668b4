"""Deduplication operators: exact, MinHash+LSH, SimHash.

Scale design (the whole point of these over naive pairwise):
- exact dedup = hash aggregation on the normalized text (one shuffle).
- MinHash+LSH: shingle → 64 min-hashes → band into b buckets → pairs
  are generated ONLY within (band, band_hash) buckets, so the candidate
  set is ~linear in input for realistic similarity distributions,
  never the O(n²) cross join.
- SimHash: 64-bit signature per doc; Hamming-≤k candidates found by
  splitting the signature into k+1 bands (pigeonhole: any pair within
  Hamming k agrees exactly on ≥1 band) and equi-joining per band.
- All hashing uses Spark's xxhash64 (deterministic, JVM-side); no
  Python in the hot path except the optional SimHash signature UDF,
  which is Arrow-batched.

Background: public MinHash/LSH literature (Broder '97; MMDS ch.3) and
the SimHash paper (Charikar '02) — algorithms only, implementation is
original DataFrame composition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcp_etl_spark.functions.text import normalize_text, tokens
from gcp_etl_spark.operators.barrier import barrier


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal — ``dropDuplicates`` (hash groupBy
    under the hood; one shuffle on the dedup key)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def _shingles(text: Column, k: int) -> Column:
    """k-word shingles from normalized text → array<string>."""
    toks = tokens(normalize_text(text))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def _min_perm_udf(num_perm: int):
    """Arrow-batch MinHash: the shingle STRING was hashed JVM-side
    (xxhash64 → 8-byte base); the ``num_perm`` permutations are the
    classic universal-hash family h_i(x) = a_i·x + b_i over uint64
    (wrapping), computed for a whole batch as ONE numpy outer product
    + min — no explode of |docs|·|shingles| rows, no num_perm-buffer
    groupBy shuffle (measured ~1.3× end-to-end vs explode+min-agg)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def cst(tag: str, i: int) -> int:
        return int.from_bytes(
            hashlib.md5(f"{tag}:{i}".encode()).digest()[:8], "little"
        )

    a = np.array([cst("a", i) | 1 for i in range(num_perm)], dtype=np.uint64)
    b = np.array([cst("b", i) for i in range(num_perm)], dtype=np.uint64)

    @pandas_udf("array<long>")
    def min_perm(col):  # (pd.Series of array<long>) -> pd.Series
        out = []
        for hb in col:
            h = np.asarray(hb, dtype=np.int64).astype(np.uint64)
            m = (h[:, None] * a[None, :] + b[None, :]).min(axis=0)
            out.append(m.astype(np.int64))
        return pd.Series(out)

    return min_perm


def _hashed_shingles(df: DataFrame, id_col: str, text_col: str, shingle_k: int):
    """(id, hb array<long>) — stable 64-bit hash of each distinct
    k-shingle, computed per Arrow batch in Python.

    Shingle semantics are identical to the JVM ``_shingles``
    (lowercase → whitespace tokens → k-gram join with " " → distinct;
    short docs collapse to one whole-doc shingle), but evaluated as
    plain Python string ops + blake2b instead of the nested
    transform/slice/concat_ws higher-order expression — Spark
    evaluates HOF lambdas per element in the interpreter, and that
    expression was the dominant cost of the whole near-dup pipeline
    (2.8s of 6.6s at sf0.1, plus a large Janino compile). The hash
    values themselves are internal: signatures and the Jaccard
    verification both consume this column, so any stable injective-ish
    64-bit hash yields identical final (id_a, id_b, jaccard) rows.

    testdata tables are single parquet files → a bare scan is one
    partition; repartition on the doc id so shingling runs on all
    cores."""
    from hashlib import blake2b

    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    k = shingle_k

    @pandas_udf("array<long>")
    def sh_hash(col):  # (pd.Series of str) -> pd.Series of array<long>
        out = []
        for txt in col:
            toks = (txt or "").lower().split()
            if len(toks) >= k:
                sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
            else:
                sh = {" ".join(toks)}
            out.append(
                np.fromiter(
                    (
                        int.from_bytes(
                            blake2b(s.encode(), digest_size=8).digest(), "little"
                        )
                        - (1 << 63)
                        for s in sh
                    ),
                    dtype=np.int64,
                    count=len(sh),
                )
            )
        return pd.Series(out)

    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, id_col).select(
        F.col(id_col).alias("id"), sh_hash(text_col).alias("hb")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig array<long>) — MinHash signature per document.

    FUSED Python pass (r12 resume, guide §4.1 cross the boundary
    once): shingle-hash + permutation-min run in ONE pandas UDF, so a
    document's text crosses the JVM↔Python boundary once and the
    intermediate per-doc shingle-hash array never ships back to the
    JVM (the old shape was two chained ArrowEval stages). Identical
    values by construction: same shingle set, same blake2b base hash,
    same a_i·x + b_i permutation family, same min — the standalone
    ``_hashed_shingles`` / ``_min_perm_udf`` stay exported for the
    operators that consume shingle hashes directly."""
    import hashlib
    from hashlib import blake2b

    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def cst(tag: str, i: int) -> int:
        return int.from_bytes(
            hashlib.md5(f"{tag}:{i}".encode()).digest()[:8], "little"
        )

    a = np.array(
        [cst("a", i) | 1 for i in range(num_perm)], dtype=np.uint64
    )
    b = np.array([cst("b", i) for i in range(num_perm)], dtype=np.uint64)
    k = shingle_k

    @pandas_udf("array<long>")
    def sig_of_text(col):  # (pd.Series of str) -> pd.Series
        out = []
        for txt in col:
            toks = (txt or "").lower().split()
            if len(toks) >= k:
                sh = {
                    " ".join(toks[i : i + k])
                    for i in range(len(toks) - k + 1)
                }
            else:
                sh = {" ".join(toks)}
            # EXACT replica of the two-step pipeline's value path:
            # _hashed_shingles stores h0 - 2^63 as int64, and
            # _min_perm_udf reinterprets via astype(uint64) — which is
            # h0 XOR 2^63, not h0. Reproduce both steps bit-for-bit.
            h = np.fromiter(
                (
                    int.from_bytes(
                        blake2b(s.encode(), digest_size=8).digest(),
                        "little",
                    )
                    - (1 << 63)
                    for s in sh
                ),
                dtype=np.int64,
                count=len(sh),
            ).astype(np.uint64)
            m = (h[:, None] * a[None, :] + b[None, :]).min(axis=0)
            out.append(m.astype(np.int64))
        return pd.Series(out)

    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, id_col).select(
        F.col(id_col).alias(id_col), sig_of_text(text_col).alias("sig")
    )


def signature_buckets(
    sig: DataFrame, id_col: str, num_perm: int, bands: int
) -> DataFrame:
    """(id, band, bh) — LSH band buckets of a (id, sig array<long>)
    signature relation: xxhash64 over each ``r = num_perm/bands`` row
    band. This relation is what a persistent dedup service stores
    between ingestion runs (16 rows x 24 B per doc at the defaults) —
    new batches bucket-join against it without rehashing the corpus."""
    assert num_perm % bands == 0
    r = num_perm // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col("sig")[b * r + i] for i in range(r)]).alias("bh"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", "bk.band", "bk.bh")


def estimate_jaccard(sig_a: Column, sig_b: Column, num_perm: int) -> Column:
    """Signature-estimated Jaccard: the fraction of agreeing minhash
    components — an unbiased estimator with se ~= sqrt(t(1-t)/num_perm)
    (~0.057 at t=0.7, 64 perms). Ships 512 B per doc instead of the
    full shingle set, which is the only viable rescore at 100 TB."""
    return F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v)
    ) / F.lit(num_perm)


def _band_candidates(sig: DataFrame, id_col: str, bands: int, r: int) -> DataFrame:
    """LSH band-bucket self-join over a (id, sig) signature relation:
    hash each ``r``-row band of the signature, bucket-join on
    (band, bucket-hash), and emit distinct ordered candidate pairs
    (id_a < id_b). This is the step that keeps near-dup detection
    ~linear — only same-bucket pairs are ever enumerated."""
    buckets = signature_buckets(sig, id_col, bands * r, bands)

    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Pre-verification LSH candidate pairs (id_a, id_b) — the exact
    relation `minhash_near_duplicates` verifies. Exposed so scale
    harnesses can measure candidate growth directly (the 100 TB
    design claim is that this count stays ~linear in corpus size)."""
    assert num_perm % bands == 0
    sig = minhash_signatures(df, id_col, text_col, num_perm, shingle_k)
    return _band_candidates(sig, id_col, bands, num_perm // bands)


def minhash_estimate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """(id_a, id_b, est_jaccard) with id_a < id_b — LSH candidates
    scored by SIGNATURE-estimated Jaccard only (no exact shingle
    rescore). The estimate-only variant is the batch dual of the
    streaming incremental dedup (streaming/dedup_stream.py): both
    sides score candidates from the same fixed-width signatures, so
    streamed micro-batches reproduce this relation exactly however the
    stream is batched (asserted in tests/test_streaming.py).

    100 TB: candidate enumeration is the banded bucket join (~linear);
    scoring ships 512 B per side per candidate — document size never
    rides a shuffle. Exact-Jaccard confirmation of survivors, when
    wanted, is a downstream batch job over this (much smaller) pair
    relation (minhash_near_duplicates's verify stage).

    ``materialize`` (cache-lifetime policy — the r6-leak / r7-wall
    trade): True (default, right for long-lived sessions and the
    streaming sink) runs the pipeline eagerly inside this call over a
    SQL-persisted signature cache and releases the cache before
    returning — nothing is parked in the session CacheManager, at the
    cost of one materialization job on the critical path. False (the
    one-shot registered-query shape: build plan → driver collects →
    plan dropped) returns the LAZY plan with the signature relation
    behind a lazy ``localCheckpoint`` instead of ``persist`` — still
    computed once per action across its three consumers, but the
    blocks are RDD-level (no session-lifetime CacheManager entry; the
    ContextCleaner frees them when the plan is dropped), so the
    caller's single action pays no extra materialization pass."""
    assert num_perm % bands == 0
    sig = minhash_signatures(df, id_col, text_col, num_perm, shingle_k)
    sig = sig.select(F.col(id_col).alias("id"), "sig")
    sig = sig.persist() if materialize else sig.transform(barrier)
    cand = _band_candidates(sig, "id", bands, num_perm // bands)
    pairs = (
        cand.join(
            sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .withColumn(
            "est_jaccard",
            F.round(estimate_jaccard(F.col("sig_a"), F.col("sig_b"), num_perm), 4),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    if materialize:
        # materialize the (small, above-threshold) pair relation while
        # the signature cache is hot, then RELEASE the cache — the r6
        # ADVICE leak: returning a lazy plan over a persisted sig meant
        # every call parked a signature relation in the session
        # CacheManager for the rest of the session
        pairs = pairs.transform(barrier, eager=True)
        sig.unpersist()
    return pairs


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    estimate_first: bool = False,
) -> DataFrame:
    """Candidate pairs via LSH banding, verified by exact shingle
    Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold.

    band rows r = num_perm/bands; candidate prob at similarity s is
    1-(1-s^r)^bands (S-curve centered ~ (1/bands)^(1/r)).

    100 TB shuffle-size note: the exact-verify join ships each
    candidate's full hashed-shingle set (array<long>, ~8 bytes x
    #shingles ~= the document size itself) through TWO shuffles.
    Banding keeps the candidate count ~linear, so this is bounded but
    heavy: ~2 x corpus-bytes of shuffle in the worst case.
    ``estimate_first=True`` inserts a signature-level pre-filter —
    the minhash signature is a fixed ``num_perm x 8`` bytes (512 B at
    64 perms) regardless of document size, and the component-match
    fraction is an unbiased Jaccard estimator (se ~= sqrt(t(1-t)/
    num_perm) ~= 0.057 at t=0.7) — so only pairs estimated above
    ``threshold - 0.15`` (~2.6 se, <1% miss at the boundary) ride the
    full-shingle shuffles. At 100 TB run with estimate_first=True.
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    # Shingle-hash each doc ONCE and reuse the (id, hb) intermediate:
    # it feeds the signature stage AND both sides of the verification
    # join, and the interpreted-HOF shingle expression is the dominant
    # cost (measured 2.8s of the 6.6s pipeline at sf0.1) — without
    # reuse it is recomputed and its large codegen unit appears three
    # times in the plan. A lazy localCheckpoint (not SQL persist):
    # blocks are computed once at the caller's action and are RDD-
    # level, so nothing parks in the session CacheManager after the
    # plan is dropped (persist-without-unpersist here was the same
    # session-lifetime leak the r6 ADVICE flagged in estimate_pairs).
    base = _hashed_shingles(df, id_col, text_col, shingle_k).transform(barrier)
    sig = base.select(
        F.col("id").alias(id_col), _min_perm_udf(num_perm)("hb").alias("sig")
    )

    cand = _band_candidates(sig, id_col, bands, r)

    if estimate_first:
        # signature-estimate pre-filter: tiny fixed-width payload
        # (num_perm longs) instead of full shingle arrays
        sg = sig.select(F.col(id_col).alias("id"), "sig")
        est = (
            cand.join(
                sg.withColumnRenamed("id", "id_a").withColumnRenamed("sig", "sig_a"),
                "id_a",
            )
            .join(
                sg.withColumnRenamed("id", "id_b").withColumnRenamed("sig", "sig_b"),
                "id_b",
            )
            .withColumn(
                "est_j",
                estimate_jaccard(F.col("sig_a"), F.col("sig_b"), num_perm),
            )
        )
        cand = est.filter(F.col("est_j") >= threshold - 0.15).select(
            "id_a", "id_b"
        )

    # exact verification on the hashed shingle sets (same persisted
    # intermediate — xxhash64 is injective on this corpus up to a
    # ~1e-8 birthday-collision probability, and recall vs brute-force
    # string Jaccard is asserted in tests).
    sh = base.select("id", F.array_distinct("hb").alias("sh"))
    verified = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def minhash_incremental(
    corpus: DataFrame | None,
    batch: DataFrame | None,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    full: DataFrame | None = None,
    batch_pred=None,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus: (batch_id,
    corpus_id, jaccard) pairs with jaccard >= threshold.

    The incremental shape of training-data ingestion: candidates are
    batch-buckets JOIN corpus-buckets only — corpus x corpus pairs are
    never enumerated, so daily cost is O(|batch| + matched buckets)
    however large the historical corpus grows. When both sides are
    slices of one table, pass ``full`` plus ``batch_pred`` (a
    Column-predicate over the id) instead of materializing two scans —
    the shingle-hash pipeline then runs once. At 100 TB the corpus
    (band, bh) bucket table is the thing you persist between runs:
    computing it here is a one-time backfill, after which each
    ingestion only hashes its own batch.
    """
    assert num_perm % bands == 0
    if (full is None) != (batch_pred is None):
        raise ValueError(
            "minhash_incremental: pass BOTH full and batch_pred for the "
            "single-table split, or NEITHER (with corpus + batch)"
        )
    if full is None and (corpus is None or batch is None):
        raise ValueError(
            "minhash_incremental: corpus and batch are required when "
            "full/batch_pred are not given"
        )
    r = num_perm // bands
    if full is not None and batch_pred is not None:
        # corpus and batch are slices of ONE table (``full``, split by
        # ``batch_pred`` over the id): shingle-hash the combined scan
        # once and split the hashed intermediate, instead of running
        # the scan + Arrow hashing pipeline twice. Lazy localCheckpoint
        # (not SQL persist): reuse without a session-lifetime
        # CacheManager entry — see minhash_near_duplicates.
        all_b = _hashed_shingles(
            full, id_col, text_col, shingle_k
        ).transform(barrier)
        bb = all_b.filter(batch_pred(F.col("id")))
        cb = all_b.filter(~batch_pred(F.col("id")))
    else:
        cb = _hashed_shingles(
            corpus, id_col, text_col, shingle_k
        ).transform(barrier)
        bb = _hashed_shingles(
            batch, id_col, text_col, shingle_k
        ).transform(barrier)

    def sig_buckets(base, out_id):
        sig = base.select("id", _min_perm_udf(num_perm)("hb").alias("sig"))
        return signature_buckets(sig, "id", num_perm, bands).withColumnRenamed(
            "id", out_id
        )

    cand = (
        sig_buckets(bb, "batch_id")
        .join(sig_buckets(cb, "corpus_id"), ["band", "bh"])
        .select("batch_id", "corpus_id")
        .distinct()
    )
    shb = bb.select(
        F.col("id").alias("batch_id"), F.array_distinct("hb").alias("sh_b")
    )
    shc = cb.select(
        F.col("id").alias("corpus_id"), F.array_distinct("hb").alias("sh_c")
    )
    return (
        cand.join(shb, "batch_id")
        .join(shc, "corpus_id")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_b", "sh_c"))
                / F.size(F.array_union("sh_b", "sh_c")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, sig long) — 64-bit count-weighted SimHash signature per
    document, one numpy pass per Arrow batch (token blake2b hash →
    64-bit matrix → vote matmul → bit pack). Shared by the fixed-
    radius near-dup operator and the radius operating curve."""
    from hashlib import blake2b

    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def simsig(col):  # (pd.Series of str) -> pd.Series of long
        shifts = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(col), dtype=np.uint64)
        for idx, txt in enumerate(col):
            toks = (txt or "").lower().split()
            if not toks:
                continue
            uniq, counts = np.unique(
                np.asarray(toks, dtype=object), return_counts=True
            )
            h = np.fromiter(
                (
                    int.from_bytes(
                        blake2b(s.encode(), digest_size=8).digest(), "little"
                    )
                    for s in uniq
                ),
                dtype=np.uint64,
                count=len(uniq),
            )
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = counts.astype(np.int64) @ (2 * bits - 1)
            out[idx] = np.bitwise_or.reduce(
                (votes > 0).astype(np.uint64) << shifts, dtype=np.uint64
            )
        return pd.Series(out.view(np.int64))

    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, id_col).select(
        F.col(id_col).alias("id"), simsig(text_col).alias("sig")
    )


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash with Hamming distance ≤ k.

    Signature: per token hash, each of the 64 bits votes ±1 (weighted
    by occurrence count); the sign of the per-bit sum is the signature
    bit. Candidates: split the 64 bits into (k+1) bands — any pair
    within Hamming k matches exactly on at least one band (pigeonhole)
    — equi-join per band, then verify the true Hamming distance with
    bit_count(xor).

    The signature is computed per Arrow batch in numpy (token hash →
    64-bit matrix → count-weighted vote matmul → bit pack). The
    earlier all-JVM formulation (explode + a 64-conditional-sum
    groupBy + 64 shift/or terms) spent most of its time compiling and
    evaluating those 128 generated expressions (3.3s → 1.4s at sf0.1).
    The token hash is internal to the operator — signatures only meet
    the banding join and each other's xor.
    """
    nbands = max_hamming + 1
    width = 64 // nbands
    # lazy localCheckpoint (r12 resume, guide §1.2/§4): the signature
    # relation feeds both band-join sides — without the barrier the
    # per-batch numpy signature UDF re-ran once per side (8 Python
    # nodes in the plan); with it the corpus crosses the Python
    # boundary once. 8 B/doc materialized.
    sig = simhash_signatures(df, id_col, text_col).transform(barrier)

    bands = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(sig >> {b * width}) & {(1 << width) - 1}"
                        ).alias("piece"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.piece")

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def banding_operating_curve(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands_list: tuple[int, ...] = (4, 8, 16, 32),
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash BANDING OPERATING CURVE (r9 verdict ask #4): measured
    precision/recall of the LSH candidate stage vs the exact-Jaccard
    truth set, at every (bands, rows) split of ONE fixed
    ``num_perm``-component signature — the curve a 100 TB operator
    actually tunes (the engine ships bands=16 as its default; this
    query shows what that choice trades).

    One row per banding: (bands, rows_per_band, n_candidates, n_true,
    true_positives, precision, recall, s_half) where s_half =
    (1/b)^(1/r) is the theoretical S-curve midpoint — the similarity
    at which a pair has a 50% candidate probability.

    Candidate sets are NESTED along the curve: a band of r rows
    colliding implies both its r/2-row halves collide, so every
    bands=b candidate is a bands=2b candidate — recall is
    deterministically non-decreasing in ``bands`` (pinned in
    tests/test_r10.py together with the recall-vs-exact floor).

    Scale: signatures computed ONCE and persisted; each banding is
    one bucket self-join + one broadcast-truth membership join + one
    tiny agg. The exact truth set is the fixture-scale luxury — at
    100 TB you would compute it on a fixed sample and read the same
    curve off the sample (the estimator is unbiased per pair)."""
    sig = minhash_signatures(df, id_col, text_col, num_perm, shingle_k)
    sig = sig.persist()

    # exact truth via SHINGLE-POSTINGS join (only pairs with nonzero
    # intersection are ever enumerated — near-linear on a near-dup
    # corpus, where the naive all-pairs cross join is quadratic in
    # docs and was 25 s at 500 docs): |A∩B| from the postings
    # self-join, |A∪B| = |A| + |B| − |A∩B| from the per-doc sizes
    # lazy localCheckpoint (r12, guide §1.2): the posting relation
    # feeds the size aggregate plus both truth-join sides — without
    # the barrier the optimizer re-expanded the scan → shingle →
    # explode subtree into all 3 consumers; with it the shingle
    # pipeline runs once (same fix as _ngram_jaccard_pairs)
    post = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(_shingles(F.col(text_col), shingle_k))
        ).alias("g"),
    ).transform(barrier)
    sz = (
        post.groupBy("id")
        .agg(F.count("*").alias("n"))
        .transform(barrier)
    )
    pa = post.select(F.col("id").alias("id_a"), "g")
    pb = post.select(F.col("id").alias("id_b"), "g")
    inter = (
        pa.join(pb, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    truth = (
        inter.join(
            sz.select(F.col("id").alias("id_a"), F.col("n").alias("na")),
            "id_a",
        )
        .join(
            sz.select(F.col("id").alias("id_b"), F.col("n").alias("nb")),
            "id_b",
        )
        .filter(
            F.col("i").cast("double")
            / (F.col("na") + F.col("nb") - F.col("i"))
            >= threshold
        )
        .select("id_a", "id_b")
        .persist()
    )

    spark = df.sparkSession
    # Candidate sets are NESTED (a colliding band implies both its
    # halves collide), so ONE bucket self-join at the FINEST banding
    # (max bands = shortest rows-per-band) covers every coarser
    # banding's candidates; per-pair membership in each coarser set is
    # then pure signature algebra — fold the 64-bit agreement vector by
    # halving (lv1[j] = bands-32 band j collides, lv2 = bands-16, ...)
    # and a banding collides iff its level has any true. This replaces
    # the old per-banding loop's 4 bucket self-joins + 4 truth joins +
    # 4 aggregates (guide §2.4 remove shuffles outright / §3 join
    # count) with 1 join + 2 signature lookups + 1 truth join + 1 agg.
    # Membership is decided by TRUE slice equality, which the bucket
    # hash only approximates (equal slices always hash equal, so no
    # candidate is lost; a 2^-64 xxhash collision can no longer inject
    # a spurious pair).
    bands_sorted = sorted(bands_list)
    bmax = max(bands_sorted)
    assert all(num_perm % b == 0 for b in bands_sorted)
    cand = _band_candidates(sig, id_col, bmax, num_perm // bmax)
    sa = sig.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")
    )
    agree = F.zip_with("sig_a", "sig_b", lambda x, y: x == y)
    flagged = cand.join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b", agree.alias("lv")
    )

    def _halve(arr, n_out):
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_out - 1)),
            lambda j: F.get(arr, j * 2) & F.get(arr, j * 2 + 1),
        )

    levels: dict[int, Column] = {}
    lv = F.col("lv")
    width = num_perm
    while width > 1:
        lv = _halve(lv, width // 2)
        width //= 2
        levels[width] = lv  # `width` bands of num_perm/width rows
    flags = flagged.select(
        "id_a",
        "id_b",
        *[
            F.exists(levels[b], lambda x: x).alias(f"c{b}")
            for b in bands_sorted
        ],
    )
    wide = (
        flags.join(
            truth.withColumn("is_true", F.lit(1)),
            ["id_a", "id_b"],
            "left",
        )
        .agg(
            *[
                s
                for b in bands_sorted
                for s in (
                    F.sum(F.col(f"c{b}").cast("long"))
                    .cast("long")
                    .alias(f"n_{b}"),
                    F.sum(
                        F.when(
                            F.col(f"c{b}"),
                            F.coalesce(F.col("is_true"), F.lit(0)),
                        ).otherwise(0)
                    )
                    .cast("long")
                    .alias(f"tp_{b}"),
                )
            ]
        )
        .crossJoin(truth.agg(F.count("*").cast("long").alias("n_true")))
    )
    out = wide.select(
        F.expr(
            "stack({n}, {args})".format(
                n=len(bands_sorted),
                args=", ".join(
                    f"int({b}), int({num_perm // b}), n_{b}, tp_{b}"
                    for b in bands_sorted
                ),
            )
        ).alias("bands", "rows_per_band", "n_candidates", "true_positives"),
        "n_true",
    )
    return (
        out.select(
            "bands",
            "rows_per_band",
            "n_candidates",
            "n_true",
            "true_positives",
            F.round(
                F.when(
                    F.col("n_candidates") > 0,
                    F.col("true_positives") / F.col("n_candidates").cast("double"),
                ).otherwise(0.0),
                6,
            ).alias("precision"),
            F.round(
                F.when(
                    F.col("n_true") > 0,
                    F.col("true_positives") / F.col("n_true").cast("double"),
                ).otherwise(0.0),
                6,
            ).alias("recall"),
            F.round(
                F.pow(
                    1.0 / F.col("bands"),
                    1.0 / F.col("rows_per_band"),
                ),
                6,
            ).alias("s_half"),
        )
        .orderBy("bands")
    )


def simhash_radius_curve(
    df: DataFrame,
    id_col: str,
    text_col: str,
    radii: tuple[int, ...] = (1, 2, 3, 5),
) -> DataFrame:
    """SimHash HAMMING-RADIUS OPERATING CURVE — the SimHash sibling of
    ``banding_operating_curve``: one fixed 64-bit signature relation,
    swept over candidate radii k. Each k runs the pigeonhole banding
    (k+1 bands of 64//(k+1) bits — any pair within Hamming k matches
    at least one band exactly) and the exact bit_count(xor) verify;
    the row reports the band-stage candidate count next to the
    verified pair count, i.e. how much the verify stage pays as the
    radius loosens.

    Verified pair sets are NESTED in k by definition (hamming <= 1 ⊆
    hamming <= 2 ...), so n_verified is deterministically monotone —
    pinned in tests together with banding losslessness (the banded
    verified set equals brute-force all-pairs hamming at fixture
    scale).

    Scale: signatures computed ONCE and persisted (8 B/doc); each
    radius is one band equi-join + one xor verify."""
    sig = simhash_signatures(df, id_col, text_col).persist()
    out = None
    for k in radii:
        nbands = k + 1
        width = 64 // nbands
        bands = sig.select(
            "id",
            "sig",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.expr(
                                f"(sig >> {b * width}) & {(1 << width) - 1}"
                            ).alias("piece"),
                        )
                        for b in range(nbands)
                    ]
                )
            ).alias("bk"),
        ).select("id", "sig", "bk.band", "bk.piece")
        a, b = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.piece") == F.col("b.piece"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.sig").alias("sig_a"),
                F.col("b.sig").alias("sig_b"),
            )
            .distinct()
        )
        stats = cand.agg(
            F.lit(k).alias("radius"),
            F.lit(nbands).alias("n_bands"),
            F.lit(width).alias("band_bits"),
            F.count("*").cast("long").alias("n_candidates"),
            F.sum(
                F.when(
                    F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
                    <= k,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_verified"),
        )
        out = stats if out is None else out.unionByName(stats)
    return out.select(
        "radius",
        "n_bands",
        "band_bits",
        "n_candidates",
        "n_verified",
        F.round(
            F.when(
                F.col("n_candidates") > 0,
                F.col("n_verified") / F.col("n_candidates").cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("verify_yield"),
    ).orderBy("radius")
