"""Training-data preparation operators (SURVEY.md §2C —
LLM-data-pipeline surface): document chunking, benchmark
decontamination, repetition-based quality filtering, dedup
survivorship, and token-budget sequence packing.

Together with the dedup/cluster operators in ``llm_ops.py`` these
cover a pretraining corpus pipeline end to end: quality scoring →
near-dup pairs → clusters → keep-best survivorship → benchmark
decontamination → model-window chunking → fixed-budget packing.
Everything is JVM column expressions, explode + hash-agg, or window
running sums — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t

# Chunk geometry: 64-token windows advancing 48 tokens (16-token
# overlap) — the overlap preserves cross-boundary context exactly like
# a tokenizer's sliding window; constants mirrored in the oracle.
_CHUNK_W = 64
_CHUNK_S = 48


@query(
    "text_chunk_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(trim(lower(text)), ' '), x -> x <> '')
               AS tokens
      FROM documents
    ), sized AS (
      SELECT doc_id, tokens, len(tokens) AS n,
             CASE WHEN len(tokens) <= {_CHUNK_W} THEN 1
                  ELSE (len(tokens) - {_CHUNK_W} + {_CHUNK_S} - 1)
                       // {_CHUNK_S} + 1 END AS n_chunks
      FROM toks WHERE len(tokens) > 0
    ), chunks AS (
      SELECT doc_id, n, i AS chunk_idx,
             list_slice(tokens, i * {_CHUNK_S} + 1,
                        i * {_CHUNK_S} + {_CHUNK_W}) AS ctoks
      FROM sized, unnest(range(n_chunks)) AS u(i)
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(ctoks) AS INT) AS n_chunk_toks,
           md5(array_to_string(ctoks, ' ')) AS chunk_md5
    FROM chunks
    """,
    tags=("text", "llm", "chunk"),
)
def text_chunk_overlap(spark, sf_dir):
    """Overlapping document chunking: 64-token windows, stride 48.

    The whole op is one map stage — ``sequence`` builds the chunk
    index list, ``explode`` fans out, ``slice`` carves the window —
    so it pipelines inside the scan with NO shuffle at any scale;
    output partitioning inherits the input's. Chunk text is emitted
    as an md5 (the driver canon forbids long free-text columns less
    than it forbids arrays, but the hash also keeps the comparison
    payload fixed-width)."""
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism  # single-file scan
    )
    toks = F.filter(
        F.split(F.trim(F.lower("text")), " "), lambda x: x != F.lit("")
    )
    sized = d.select("doc_id", toks.alias("tokens")).filter(
        F.size("tokens") > 0
    )
    sized = sized.withColumn(
        "n_chunks",
        F.when(F.size("tokens") <= _CHUNK_W, F.lit(1)).otherwise(
            F.expr(
                f"(size(tokens) - {_CHUNK_W} + {_CHUNK_S} - 1)"
                f" div {_CHUNK_S} + 1"
            ).cast("int")
        ),
    )
    chunks = sized.select(
        "doc_id",
        "tokens",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
            "chunk_idx"
        ),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.slice(
            "tokens", F.col("chunk_idx") * _CHUNK_S + 1, _CHUNK_W
        ).alias("ctoks"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("ctoks").alias("n_chunk_toks"),
        F.md5(F.concat_ws(" ", "ctoks")).alias("chunk_md5"),
    )


@query(
    "decontaminate_ngram_overlap",
    oracle="""
    WITH w AS (SELECT doc_id,
                      list_filter(string_split(trim(lower(text)), ' '),
                                  x -> x <> '') AS ws
               FROM documents),
    g AS (SELECT DISTINCT doc_id,
                 ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
          FROM w, unnest(range(len(ws)-2)) AS u(i)),
    eval_grams AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0),
    train AS (SELECT doc_id, gram FROM g WHERE doc_id % 37 <> 0),
    sz AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY 1),
    hits AS (SELECT doc_id, count(*) AS n_overlap
             FROM train JOIN eval_grams USING (gram) GROUP BY 1)
    SELECT doc_id, CAST(n_overlap AS BIGINT) AS n_overlap,
           CAST(n_grams AS BIGINT) AS n_grams,
           n_overlap / n_grams AS overlap_ratio
    FROM hits JOIN sz USING (doc_id)
    WHERE n_overlap / n_grams >= 0.2
    """,
    tags=("text", "llm", "decontaminate", "join"),
)
def decontaminate_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: flag training documents whose word
    trigrams overlap an evaluation set (here: doc_id % 37 == 0 plays
    the benchmark) at >= 20% of their distinct trigrams.

    Scale shape: the eval side is a BENCHMARK — thousands of
    documents, not billions — so its distinct-gram set is broadcast
    and the 100 TB train side is never shuffled for the probe; the
    only shuffles are the per-doc distinct + counts, keyed by
    (doc_id, gram). This is the standard n-gram decontamination from
    the GPT-3/PaLM appendices, expressed as a broadcast semi-probe."""
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism  # single-file scan
    )
    ws = F.filter(
        F.split(F.trim(F.lower("text")), " "), lambda x: x != F.lit("")
    )

    def grams(sub):
        return sub.select("doc_id", ws.alias("ws")).select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 3),"
                    " i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2]))"
                )
            ).alias("gram"),
        ).distinct()

    # gram the two sides from their own filtered scans: the eval side
    # only ever shingles its 1/37 slice (a benchmark is small by
    # construction), instead of filtering a full-corpus gram pipeline
    # computed twice (broadcast job + probe job)
    eval_grams = (
        grams(d.filter(F.col("doc_id") % 37 == 0)).select("gram").distinct()
    )
    train = grams(d.filter(F.col("doc_id") % 37 != 0))
    sz = train.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        hits.join(sz, "doc_id")
        .select(
            "doc_id",
            "n_overlap",
            "n_grams",
            (F.col("n_overlap") / F.col("n_grams")).alias("overlap_ratio"),
        )
        .filter(F.col("overlap_ratio") >= 0.2)
    )


@query(
    "text_repetition_ratio",
    oracle="""
    WITH w AS (SELECT doc_id,
                      list_filter(string_split(trim(lower(text)), ' '),
                                  x -> x <> '') AS ws
               FROM documents),
    g AS (SELECT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
          FROM w, unnest(range(len(ws)-2)) AS u(i)),
    per AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
    agg AS (SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_grams,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(max(c) AS BIGINT) AS top_count
            FROM per GROUP BY 1)
    SELECT doc_id, n_grams, n_distinct,
           1.0 - n_distinct / n_grams AS dup_gram_ratio,
           top_count / n_grams AS top_gram_frac
    FROM agg
    """,
    tags=("text", "llm", "quality"),
)
def text_repetition_ratio(spark, sf_dir):
    """Gopher-style repetition quality rule: per document, the
    fraction of word trigrams that are duplicates
    (1 - distinct/total) and the share of the single most frequent
    trigram. Boilerplate/template pages score high on both.

    Two hash aggs — (doc_id, gram) then doc_id — both map-side
    combinable; the shuffled payload is counts, never text. The
    int/int divisions are bit-exact in IEEE double on both engines."""
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism  # single-file scan
    )
    ws = F.filter(
        F.split(F.trim(F.lower("text")), " "), lambda x: x != F.lit("")
    )
    per = (
        d.select("doc_id", ws.alias("ws"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 3),"
                    " i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2]))"
                )
            ).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
    )
    agg = per.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_count"),
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        (F.lit(1.0) - F.col("n_distinct") / F.col("n_grams")).alias(
            "dup_gram_ratio"
        ),
        (F.col("top_count") / F.col("n_grams")).alias("top_gram_frac"),
    )


@query(
    "dedup_survivorship",
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
    lab AS (SELECT n AS node, min(m) AS comp FROM reach GROUP BY n),
    ranked AS (
      SELECT lab.comp, lab.node, d.n_chars,
             row_number() OVER (PARTITION BY lab.comp
                                ORDER BY d.n_chars DESC, lab.node) AS rn
      FROM lab JOIN documents d ON d.doc_id = lab.node
    )
    SELECT comp,
           CAST(max(CASE WHEN rn = 1 THEN node END) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM ranked GROUP BY comp
    """,
    tags=("llm", "dedup", "cluster", "survivorship"),
)
def dedup_survivorship(spark, sf_dir):
    """The dedup DECISION stage: per near-dup cluster (connected
    components over the exact trigram-Jaccard edges), keep the
    highest-quality document (quality = n_chars here, any scoring
    column works; ties break on doc_id) and count the drops — the
    mapping a pipeline applies as an anti-join before training.

    Scale shape: clusters come from the distributed CC operator; the
    keeper pick is one row_number window partitioned by cluster —
    cluster-sized partitions, never corpus-sized."""
    from pyspark.sql import Window

    from gcp_etl_spark.llm.cluster import connected_components
    from gcp_etl_spark.queries.llm_ops import _ngram_jaccard_pairs

    pairs = _ngram_jaccard_pairs(spark, sf_dir, df_cap=None)
    cc = connected_components(pairs, src="id_a", dst="id_b")
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = cc.join(d, cc.node == d.doc_id).select(
        "comp", "node", "n_chars"
    )
    w = Window.partitionBy("comp").orderBy(
        F.desc("n_chars"), F.col("node")
    )
    ranked = ranked.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("comp").agg(
        F.max(F.when(F.col("rn") == 1, F.col("node"))).alias("keep_id"),
        F.count("*").alias("n_docs"),
        (F.count("*") - 1).alias("n_dropped"),
    )


# Sequence-packing geometry: greedy document packing into fixed
# token-budget training bins (mirrored in the oracle).
_PACK_BUDGET = 512


@query(
    "pack_sequences_budget",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(trim(lower(text)), ' '),
                             x -> x <> '')) AS n_toks
      FROM documents
    ),
    runs AS (
      SELECT doc_id, lang, n_toks,
             sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_toks
               AS cum_before
      FROM toks
    )
    SELECT lang, CAST(cum_before // {_PACK_BUDGET} AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM runs
    GROUP BY 1, 2
    """,
    tags=("llm", "packing", "window"),
)
def pack_sequences_budget(spark, sf_dir):
    """Sequence packing: assign documents (per language, in stable
    doc_id order) to fixed 512-token training bins by the running
    token count — the pretraining prep step that turns a deduped
    corpus into fixed-length batches. bin = floor(tokens_before /
    budget), the deterministic closed form of greedy packing.

    Scale shape: one window running sum per language partition (the
    natural sharding key of a multilingual corpus) and one hash agg;
    token counts ride the shuffle, text never does. At 100 TB the
    per-language partitions sub-shard by the same value-bucket
    two-level prefix scan as operators/range_frame.py."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(
            F.filter(
                F.split(F.trim(F.lower("text")), " "),
                lambda x: x != F.lit(""),
            )
        ).alias("n_toks"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = toks.withColumn(
        "cum_before", F.sum("n_toks").over(w) - F.col("n_toks")
    )
    return (
        runs.withColumn(
            "bin",
            F.floor(F.col("cum_before") / _PACK_BUDGET).cast("long"),
        )
        .groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )
