"""Training-data pipeline prep & data-quality operators (round-4).

Fills the remaining prep gaps a 100 TB curation pipeline hits daily:
sub-document (sentence-level) exact dedup, deterministic stratified
sampling, composite quality scoring, freshness/uniqueness DQ audits,
embedding scalar quantization, and exact cosine range search. Each is
a DuckDB-oracle-gated declared query; the scale notes on each explain
why the plan survives a 1000-executor cluster.

All NS extensions — the reference's data surface has none of these
(SURVEY.md §2A)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.operators.quantiles import exact_quantiles
from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t


@query(
    "dedup_paragraph_exact",
    oracle="""
    WITH norm AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS s
      FROM documents
    ), sent AS (
      SELECT DISTINCT doc_id, md5(sraw) AS h
      FROM (SELECT doc_id, unnest(string_split(s, '. ')) AS sraw FROM norm)
      WHERE sraw <> ''
    ), df AS (
      SELECT h, count(*) AS docs FROM sent GROUP BY 1
    ), per_doc AS (
      SELECT s.doc_id,
             count(*) AS n_sents,
             count(*) FILTER (df.docs > 1) AS n_dup_sents
      FROM sent s JOIN df ON df.h = s.h
      GROUP BY 1
    )
    SELECT doc_id, CAST(n_sents AS BIGINT) AS n_sents,
           CAST(n_dup_sents AS BIGINT) AS n_dup_sents,
           round(n_dup_sents * 1.0 / n_sents, 6) AS dup_ratio
    FROM per_doc WHERE n_dup_sents > 0
    """,
    tags=("llm", "dedup", "documents"),
)
def dedup_paragraph_exact(spark, sf_dir):
    """SUB-DOCUMENT exact dedup: split each normalized document into
    sentences ('. ' boundaries), hash each distinct sentence, and
    report per-doc how many of its sentences also appear in at least
    one OTHER document — the sentence-level boilerplate/quote detector
    that whole-doc hashing misses entirely.

    Scale: only (doc_id, sentence_md5) pairs shuffle (never sentence
    text); the document-frequency relation is vocabulary-sized and the
    per-doc rollup is one hash aggregate. This is the C4/RefinedWeb
    'repeated line removal' shape expressed relationally."""
    par = spark.sparkContext.defaultParallelism
    d = t(spark, sf_dir, "documents").repartition(par)
    # single-file doc scan -> 2 input splits; fan out to every core
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    sent = (
        d.select("doc_id", F.explode(F.split(norm, r"\. ")).alias("sraw"))
        .filter(F.col("sraw") != "")
        .select("doc_id", F.md5("sraw").alias("h"))
        .distinct()
    )
    df = sent.groupBy("h").agg(F.count("*").alias("docs"))
    per = (
        sent.join(df, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sents"),
            F.count(F.when(F.col("docs") > 1, 1)).alias("n_dup_sents"),
        )
        .filter(F.col("n_dup_sents") > 0)
    )
    return per.select(
        "doc_id",
        F.col("n_sents").cast("long").alias("n_sents"),
        F.col("n_dup_sents").cast("long").alias("n_dup_sents"),
        F.round(F.col("n_dup_sents") * 1.0 / F.col("n_sents"), 6).alias(
            "dup_ratio"
        ),
    )


@query(
    "sample_stratified_exact",
    oracle="""
    WITH ranked AS (
      SELECT lang, source, doc_id,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             count(*) OVER (PARTITION BY lang, source) AS n_total
      FROM documents
    ), taken AS (
      SELECT lang, source, n_total, doc_id
      FROM ranked WHERE rn <= ceil(0.1 * n_total)
    )
    SELECT lang, source,
           CAST(max(n_total) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_taken,
           CAST(sum(doc_id) AS BIGINT) AS taken_id_sum
    FROM taken GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("sampling", "scale-pattern", "documents"),
)
def sample_stratified_exact(spark, sf_dir):
    """DETERMINISTIC stratified sampling: exactly ceil(10% of stratum)
    documents per (lang, source) stratum, chosen by md5(doc_id) order —
    a content-independent, rerun-stable pseudo-random order (the
    standard hash-ordering trick for reproducible samples with NO rand()
    nondeterminism across retries/partitionings). Emits per-stratum
    take counts plus the taken-id sum as the sample fingerprint.

    Scale: the rank window partitions by stratum (parallel across
    strata; within-stratum sort is the unavoidable cost of EXACT
    per-stratum quotas — for approximate quotas use sample_weighted_
    priority). No driver collect, no rand()."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("lang", "source")
    ranked = d.select(
        "lang",
        "source",
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n_total"),
    )
    taken = ranked.filter(
        F.col("rn") <= F.ceil(0.1 * F.col("n_total"))
    )
    return (
        taken.groupBy("lang", "source")
        .agg(
            F.max("n_total").cast("long").alias("n_total"),
            F.count("*").cast("long").alias("n_taken"),
            F.sum("doc_id").cast("long").alias("taken_id_sum"),
        )
        .orderBy("lang", "source")
    )


@query(
    "quality_composite_score",
    oracle="""
    WITH feat AS (
      SELECT doc_id, source,
             len(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ',
                 'g'), ' ')) AS n_words,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0
               / greatest(length(text), 1) AS punct_ratio,
             len(list_filter(string_split(regexp_replace(trim(lower(text)),
                 '\\s+', ' ', 'g'), ' '),
                 w -> w IN ('the','a','an','and','or','of','to','in','is',
                            'it','that','for','on','with','as'))) * 1.0
               / greatest(len(string_split(regexp_replace(trim(lower(text)),
                 '\\s+', ' ', 'g'), ' ')), 1) AS stop_ratio
      FROM documents
    ), scored AS (
      SELECT source,
             0.4 * least(n_words / 50.0, 1.0)
             + 0.3 * (1 - least(punct_ratio / 0.2, 1.0))
             + 0.3 * least(stop_ratio / 0.4, 1.0) AS score
      FROM feat
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(score), 6) AS mean_score,
           round(quantile_cont(score, 0.5), 6) AS median_score,
           round(min(score), 6) AS min_score,
           round(max(score), 6) AS max_score
    FROM scored GROUP BY 1 ORDER BY 1
    """,
    tags=("llm", "quality", "documents"),
)
def quality_composite_score(spark, sf_dir):
    """COMPOSITE quality score per document — the Gopher/C4-style
    heuristic ensemble as one expression: saturating length credit
    (n_words/50 capped), punctuation-density penalty, stopword-ratio
    credit (the classic 'real prose contains function words' signal) —
    weighted 0.4/0.3/0.3 into [0,1]; reported as per-source
    distribution stats (mean/median/min/max).

    Scale: pure per-row expressions (one projection, zero shuffles
    until the per-source rollup); the stopword list is a 15-element
    literal array — no join. The exact per-source median comes from
    ``operators.exact_quantiles`` (two-pass range-partitioned rank)
    because per-doc scores are unbounded-distinct — the ``percentile``
    aggregate would concentrate a value map of every distinct score on
    one reducer."""
    par = spark.sparkContext.defaultParallelism
    d = t(spark, sf_dir, "documents").repartition(par)
    # single-file doc scan -> 2 input splits; fan out to every core
    stop = [
        "the", "a", "an", "and", "or", "of", "to", "in", "is",
        "it", "that", "for", "on", "with", "as",
    ]
    ws = F.split(
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " "
    )
    n_words = F.size(ws)
    punct = (
        F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
        * 1.0
        / F.greatest(F.length("text"), F.lit(1))
    )
    stops = F.size(
        F.filter(ws, lambda w: w.isin(stop))
    ) * 1.0 / F.greatest(n_words, F.lit(1))
    score = (
        0.4 * F.least(n_words / 50.0, F.lit(1.0))
        + 0.3 * (1 - F.least(punct / 0.2, F.lit(1.0)))
        + 0.3 * F.least(stops / 0.4, F.lit(1.0))
    )
    scored = d.select("source", score.alias("score"))
    med = exact_quantiles(scored, "score", {"__med": 0.5}, group_cols=["source"])
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
        .join(F.broadcast(med), "source")
        .select(
            "source",
            "n_docs",
            "mean_score",
            F.round(F.col("__med"), 6).alias("median_score"),
            "min_score",
            "max_score",
        )
        .orderBy("source")
    )


@query(
    "dq_freshness_lag",
    oracle="""
    WITH g AS (SELECT max(ts) AS gmax FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           max(ts) AS latest,
           round((epoch_us((SELECT gmax FROM g)) - epoch_us(max(ts)))
                 / 3600000000.0, 4) AS lag_hours,
           CAST(count(*) FILTER (
             epoch_us(ts) >= epoch_us((SELECT gmax FROM g))
                             - 7 * 24 * 3600000000) AS BIGINT)
             AS n_last_7d
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("dq", "freshness", "events"),
)
def dq_freshness_lag(spark, sf_dir):
    """FRESHNESS audit per event type: latest arrival, its lag behind
    the globally freshest event (hours), and trailing-7-day volume —
    the staleness monitor that catches a dead upstream producer whose
    partition silently stopped filling.

    Scale: one aggregation pass with a broadcast 1-row global-max;
    conditional trailing-window counts ride the same pass (no second
    scan, no window function)."""
    e = t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    g = e.agg(F.max("us").alias("gmax"))
    return (
        e.crossJoin(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("ts").alias("latest"),
            F.round(
                (F.first("gmax") - F.max("us")) / 3600000000.0, 4
            ).alias("lag_hours"),
            F.count(
                F.when(
                    F.col("us")
                    >= F.col("gmax") - F.lit(7 * 24 * 3600000000),
                    1,
                )
            ).cast("long").alias("n_last_7d"),
        )
        .orderBy("event_type")
    )


@query(
    "dq_uniqueness_profile",
    oracle="""
    WITH un AS (
      SELECT 'o_orderkey' AS col, CAST(o_orderkey AS VARCHAR) AS val FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', o_orderstatus FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
    ), base AS (
      SELECT col, count(*) AS n_rows,
             count(val) AS n_nonnull,
             count(DISTINCT val) AS n_distinct
      FROM un GROUP BY 1
    ), topf AS (
      SELECT col, max(c) AS top_freq
      FROM (SELECT col, val, count(*) AS c FROM un
            WHERE val IS NOT NULL GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT b.col, CAST(b.n_rows AS BIGINT) AS n_rows,
           CAST(b.n_rows - b.n_nonnull AS BIGINT) AS n_nulls,
           CAST(b.n_distinct AS BIGINT) AS n_distinct,
           round(b.n_distinct * 1.0 / b.n_rows, 6) AS uniqueness,
           CAST(t.top_freq AS BIGINT) AS top_freq
    FROM base b JOIN topf t ON t.col = b.col
    ORDER BY b.col
    """,
    tags=("dq", "profiling", "orders"),
)
def dq_uniqueness_profile(spark, sf_dir):
    """PER-COLUMN uniqueness/null/mode profile of the orders table —
    the one-pass column profiler behind key discovery ('is o_orderkey
    actually unique?') and categorical-cardinality audits. Columns are
    unpivoted via ``stack`` into (col, val) rows; distinct counting on
    the injective string cast is cardinality-faithful for every type.

    Scale: the unpivot is a zero-shuffle projection (rows x 4); the
    profile is two hash aggregates — per (col, val), then per col —
    both map-side combining. The mode count never materializes the
    value list, only the max group count."""
    o = t(spark, sf_dir, "orders")
    un = o.selectExpr(
        "stack(4, "
        "'o_orderkey', cast(o_orderkey as string), "
        "'o_custkey', cast(o_custkey as string), "
        "'o_orderstatus', o_orderstatus, "
        "'o_orderpriority', o_orderpriority) as (col, val)"
    )
    base = un.groupBy("col").agg(
        F.count("*").alias("n_rows"),
        F.count("val").alias("n_nonnull"),
        F.countDistinct("val").alias("n_distinct"),
    )
    topf = (
        un.filter(F.col("val").isNotNull())
        .groupBy("col", "val")
        .agg(F.count("*").alias("c"))
        .groupBy("col")
        .agg(F.max("c").alias("top_freq"))
    )
    return (
        base.join(topf, "col")
        .select(
            "col",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_rows") - F.col("n_nonnull")).cast("long").alias(
                "n_nulls"
            ),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.round(
                F.col("n_distinct") * 1.0 / F.col("n_rows"), 6
            ).alias("uniqueness"),
            F.col("top_freq").cast("long").alias("top_freq"),
        )
        .orderBy("col")
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH flat AS (
      SELECT generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), rng AS (
      SELECT dim, min(v) AS mn, max(v) AS mx,
             (max(v) - min(v)) / 255.0 AS scale
      FROM flat GROUP BY 1
    ), err AS (
      SELECT f.dim, r.mn, r.mx,
             avg(pow(f.v - (r.mn + round((f.v - r.mn) / r.scale)
                            * r.scale), 2)) AS mse
      FROM flat f JOIN rng r ON r.dim = f.dim
      GROUP BY 1, 2, 3
    )
    SELECT dim, round(mn, 6) AS dim_min, round(mx, 6) AS dim_max,
           round(mse, 10) AS mse
    FROM err ORDER BY dim
    """,
    tags=("llm", "embedding", "quantization"),
)
def embedding_quantize_int8(spark, sf_dir):
    """SCALAR (per-dimension) int8 QUANTIZATION of the embedding
    corpus — the 4x memory-compression baseline under PQ: per-dim
    min/max range, 255-step uniform code, and the per-dim
    reconstruction MSE that tells you which dimensions survive 8-bit
    storage (the standard pre-check before shipping an int8 ANN
    index).

    Scale: posexplode streams (dim, value) pairs; per-dim ranges are
    a 64-group map-side-combining aggregate, broadcast back for the
    error pass — two scans, no driver math, no vector materializes
    whole. Float values are cast to double BEFORE any arithmetic
    (bit-exact widening on both engines)."""
    e = t(spark, sf_dir, "embeddings")
    flat = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim0", "v"
        )
    ).select((F.col("dim0") + 1).alias("dim"), "v")
    rng = flat.groupBy("dim").agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        ((F.max("v") - F.min("v")) / 255.0).alias("scale"),
    )
    code = F.round((F.col("v") - F.col("mn")) / F.col("scale"))
    dequant = F.col("mn") + code * F.col("scale")
    return (
        flat.join(F.broadcast(rng), "dim")
        .groupBy("dim", "mn", "mx")
        .agg(F.avg((F.col("v") - dequant) ** 2).alias("mse"))
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.round("mn", 6).alias("dim_min"),
            F.round("mx", 6).alias("dim_max"),
            F.round("mse", 10).alias("mse"),
        )
        .orderBy("dim")
    )


@query(
    "ann_range_search",
    oracle="""
    WITH q AS (
      SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 8
    ), c AS (
      SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv
      FROM embeddings
    )
    SELECT q_id, n_id,
           round(list_dot_product(qv, nv)
                 / (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(nv, nv))), 4) AS cos
    FROM q JOIN c ON q_id <> n_id
    WHERE round(list_dot_product(qv, nv)
                / (sqrt(list_dot_product(qv, qv))
                   * sqrt(list_dot_product(nv, nv))), 4) >= 0.8
    """,
    tags=("llm", "similarity", "embeddings"),
)
def ann_range_search(spark, sf_dir):
    """Exact cosine RANGE search (radius query): every corpus vector
    within cosine >= 0.8 of each probe — the 'find everything this
    similar' dual of top-k (dedup wants a radius, not a count). The
    threshold compares the ROUNDED cosine on both engines, so the
    decision boundary is identical.

    Scale: broadcast probes x streamed corpus scan (corpus never
    shuffles); at cluster scale the same expression rides the
    LSH/IVF candidate streams instead of the full scan. Elements are
    cast float->double before arithmetic (exact widening, identical
    on both engines)."""
    from gcp_etl_spark.llm.similarity import cosine

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
    )
    cos = F.round(cosine(F.col("qv"), F.col("nv")), 4)
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cos.alias("cos"))
        .filter(F.col("cos") >= 0.8)
    )


@query(
    "corpus_mix_rebalance",
    oracle="""
    WITH cnt AS (
      SELECT source, count(*) AS n FROM documents GROUP BY 1
    ), tot AS (SELECT sum(n) AS tn, count(*) AS k FROM cnt)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(n * 1.0 / (SELECT tn FROM tot), 6) AS actual_share,
           round(1.0 / (SELECT k FROM tot), 6) AS target_share,
           round((1.0 / (SELECT k FROM tot)) / (n * 1.0 / (SELECT tn FROM tot)), 6)
             AS sampling_weight,
           CAST(round(n * least((1.0 / (SELECT k FROM tot))
                      / (n * 1.0 / (SELECT tn FROM tot)), 1.0), 0) AS BIGINT)
             AS docs_after_downsample
    FROM cnt ORDER BY source
    """,
    tags=("llm", "sampling", "documents"),
)
def corpus_mix_rebalance(spark, sf_dir):
    """CORPUS MIXTURE REBALANCING plan: per-source sampling weights
    that move the corpus to a target mixture (uniform across sources
    here) — weight = target_share / actual_share, with the
    down-sample-only projection (weights capped at 1; up-weighting is
    a repeat factor for the loader). This is the planning query behind
    every 'we want 30% code, 20% web...' training-mix spec.

    Scale: one count aggregate to a |sources|-row relation; all the
    mixture algebra happens there."""
    d = t(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count("*").alias("n"))
    tot = cnt.agg(F.sum("n").alias("tn"), F.count("*").alias("k"))
    j = cnt.crossJoin(F.broadcast(tot))
    actual = F.col("n") * 1.0 / F.col("tn")
    target = 1.0 / F.col("k")
    w = target / actual
    return j.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round(actual, 6).alias("actual_share"),
        F.round(target, 6).alias("target_share"),
        F.round(w, 6).alias("sampling_weight"),
        F.round(F.col("n") * F.least(w, F.lit(1.0)), 0)
        .cast("long")
        .alias("docs_after_downsample"),
    ).orderBy("source")


@query(
    "events_inactivity_churn",
    oracle="""
    WITH last_seen AS (
      SELECT user_id, max(epoch_us(ts)) AS last_us, count(*) AS n_events
      FROM events GROUP BY 1
    ), g AS (SELECT max(epoch_us(ts)) AS gmax FROM events)
    SELECT CASE
             WHEN (SELECT gmax FROM g) - last_us <= 3 * 86400000000 THEN 'active_3d'
             WHEN (SELECT gmax FROM g) - last_us <= 7 * 86400000000 THEN 'lapsing_7d'
             WHEN (SELECT gmax FROM g) - last_us <= 14 * 86400000000 THEN 'dormant_14d'
             ELSE 'churned'
           END AS cohort,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(avg((((SELECT gmax FROM g) - last_us) / 86400000000.0)), 4)
             AS avg_days_inactive
    FROM last_seen GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "churn", "events"),
)
def events_inactivity_churn(spark, sf_dir):
    """INACTIVITY-BASED churn cohorts: users bucketed by days since
    their last event relative to the corpus watermark (active ≤3d /
    lapsing ≤7d / dormant ≤14d / churned) with per-cohort volume and
    mean inactivity — the retention-ops counterpart of
    retention_cohorts (which tracks acquisition-cohort survival).

    Scale: one per-user max/count aggregate, broadcast watermark,
    4-row rollup."""
    e = t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    last = e.groupBy("user_id").agg(
        F.max("us").alias("last_us"), F.count("*").alias("n_events")
    )
    g = e.agg(F.max("us").alias("gmax"))
    day_us = 86400000000
    j = last.crossJoin(F.broadcast(g))
    gap = F.col("gmax") - F.col("last_us")
    cohort = (
        F.when(gap <= 3 * day_us, "active_3d")
        .when(gap <= 7 * day_us, "lapsing_7d")
        .when(gap <= 14 * day_us, "dormant_14d")
        .otherwise("churned")
    )
    return (
        j.groupBy(cohort.alias("cohort"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(F.avg(gap / (day_us * 1.0)), 4).alias(
                "avg_days_inactive"
            ),
        )
        .orderBy("cohort")
    )


@query(
    "orders_backlog_aging",
    oracle="""
    WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS d FROM orders
                WHERE o_orderstatus = 'O')
    SELECT CASE
             WHEN date_diff('day', CAST(o_orderdate AS DATE),
                            (SELECT d FROM mx)) <= 30 THEN 'a_0_30d'
             WHEN date_diff('day', CAST(o_orderdate AS DATE),
                            (SELECT d FROM mx)) <= 90 THEN 'b_31_90d'
             WHEN date_diff('day', CAST(o_orderdate AS DATE),
                            (SELECT d FROM mx)) <= 365 THEN 'c_91_365d'
             ELSE 'd_over_1y'
           END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_open,
           round(sum(o_totalprice), 2) AS open_value,
           round(avg(date_diff('day', CAST(o_orderdate AS DATE),
                               (SELECT d FROM mx))), 2) AS avg_age_days
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "dq", "orders"),
)
def orders_backlog_aging(spark, sf_dir):
    """OPEN-ORDER BACKLOG AGING: orders still open ('O') bucketed by
    age against the corpus max date (0-30 / 31-90 / 91-365 / >1y) with
    count, tied-up value, and mean age — the operations
    aging-report shape (receivables/backlog) on the order fact.

    Scale: status filter pushes to the scan; one broadcast max-date
    and a 4-row rollup."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("d"))
    j = o.crossJoin(F.broadcast(mx))
    age = F.datediff(F.col("d"), F.to_date("o_orderdate"))
    bucket = (
        F.when(age <= 30, "a_0_30d")
        .when(age <= 90, "b_31_90d")
        .when(age <= 365, "c_91_365d")
        .otherwise("d_over_1y")
    )
    return (
        j.groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_open"),
            F.round(F.sum("o_totalprice"), 2).alias("open_value"),
            F.round(F.avg(age), 2).alias("avg_age_days"),
        )
        .orderBy("age_bucket")
    )


@query(
    "embedding_dim_variance",
    oracle="""
    WITH flat AS (
      SELECT generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), s AS (
      SELECT dim, count(*) AS n, sum(v) AS s1, sum(v * v) AS s2
      FROM flat GROUP BY 1
    ), var_ AS (
      SELECT dim, s2 / n - (s1 / n) * (s1 / n) AS var FROM s
    ), ranked AS (
      SELECT dim, var,
             sum(var) OVER (ORDER BY var DESC, dim
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(var) OVER () AS tot,
             row_number() OVER (ORDER BY var DESC, dim) AS rk
      FROM var_
    )
    SELECT CAST(rk AS BIGINT) AS rank, CAST(dim AS BIGINT) AS dim,
           round(var, 10) AS variance,
           round(cum / tot, 6) AS cum_variance_share
    FROM ranked WHERE rk <= 16 ORDER BY rank
    """,
    tags=("llm", "embedding", "documents"),
)
def embedding_dim_variance(spark, sf_dir):
    """PER-DIMENSION VARIANCE spectrum of the embedding corpus: the
    top-16 highest-variance dimensions with their cumulative share of
    total variance — the axis-aligned (no-rotation) screening that
    tells you whether cheap dimension PRUNING suffices before paying
    for PCA (embedding_pca_project) or PQ.

    Scale: posexplode → 64-group power-sum aggregate; the ranking
    windows run over the 64-row variance relation."""
    e = t(spark, sf_dir, "embeddings")
    flat = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim0", "v"
        )
    ).select((F.col("dim0") + 1).alias("dim"), "v")
    s = flat.groupBy("dim").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    var = (
        F.col("s2") / F.col("n")
        - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
    ).alias("var")
    v = s.select("dim", var)
    wseq = Window.orderBy(F.desc("var"), "dim")
    ranked = v.select(
        "dim",
        "var",
        F.sum("var").over(
            wseq.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("var").over(
            Window.partitionBy()
        ).alias("tot"),
        F.row_number().over(wseq).alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= 16)
        .select(
            F.col("rk").cast("long").alias("rank"),
            F.col("dim").cast("long").alias("dim"),
            F.round("var", 10).alias("variance"),
            F.round(F.col("cum") / F.col("tot"), 6).alias(
                "cum_variance_share"
            ),
        )
        .orderBy("rank")
    )


@query(
    "analytics_conversion_latency",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_buy
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.t_view
      GROUP BY 1
    ), lat AS (
      SELECT (p.t_buy - v.t_view) / 3600000000.0 AS hours
      FROM p JOIN v ON v.user_id = p.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converters,
           round(quantile_cont(hours, 0.5), 4) AS p50_hours,
           round(quantile_cont(hours, 0.9), 4) AS p90_hours,
           round(quantile_cont(hours, 0.99), 4) AS p99_hours,
           round(avg(hours), 4) AS mean_hours
    FROM lat
    """,
    tags=("analytics", "funnel", "events"),
)
def analytics_conversion_latency(spark, sf_dir):
    """TIME-TO-CONVERT distribution: latency from a user's first view
    to their first subsequent purchase, summarized as exact
    p50/p90/p99/mean hours — the funnel-velocity metric
    funnel_3step's step counts don't expose (how LONG the funnel
    takes, not just who falls through).

    Scale: two min-aggregates with a broadcast survivor join
    (funnel_3step's shape); the latency relation has one row per
    converter — unbounded-distinct doubles — so the tail percentiles
    come from ``operators.exact_quantiles`` (two-pass rank), never the
    single-reducer ``percentile`` value map."""
    e = t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_buy"))
    )
    lat = p.join(F.broadcast(v), "user_id").select(
        ((F.col("t_buy") - F.col("t_view")) / 3600000000.0).alias("hours")
    )
    q = exact_quantiles(
        lat, "hours", {"__p50": 0.5, "__p90": 0.9, "__p99": 0.99}
    )
    return (
        lat.agg(
            F.count("*").cast("long").alias("n_converters"),
            F.round(F.avg("hours"), 4).alias("mean_hours"),
        )
        .crossJoin(F.broadcast(q))
        .select(
            "n_converters",
            F.round(F.col("__p50"), 4).alias("p50_hours"),
            F.round(F.col("__p90"), 4).alias("p90_hours"),
            F.round(F.col("__p99"), 4).alias("p99_hours"),
            "mean_hours",
        )
    )


@query(
    "privacy_k_anonymity",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey AS nation, c_mktsegment AS seg,
             count(*) AS grp_n,
             count(DISTINCT CAST(round(c_acctbal, -3) AS BIGINT))
               AS sensitive_diversity
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (grp_n < 5) AS BIGINT) AS groups_below_k5,
           CAST(coalesce(sum(grp_n) FILTER (grp_n < 5), 0) AS BIGINT)
             AS rows_at_risk,
           CAST(min(grp_n) AS BIGINT) AS min_group_size,
           CAST(count(*) FILTER (sensitive_diversity < 2) AS BIGINT)
             AS groups_below_l2
    FROM qi
    """,
    tags=("dq", "privacy", "customer"),
)
def privacy_k_anonymity(spark, sf_dir):
    """K-ANONYMITY / L-DIVERSITY audit over the (nation, segment)
    quasi-identifier: group sizes below k=5 re-identify individuals by
    attribute combination; groups whose bucketed account balance (the
    sensitive attribute, coarsened to $1000 bands) shows fewer than
    l=2 distinct values leak it even when k holds — the release
    pre-check a training-data pipeline runs before shipping any
    user-derived table.

    Scale: one hash aggregate to the QI-bounded group relation; all
    audit algebra runs there."""
    c = t(spark, sf_dir, "customer")
    qi = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(
        F.count("*").alias("grp_n"),
        F.countDistinct(
            F.round(F.col("c_acctbal"), -3).cast("long")
        ).alias("sensitive_diversity"),
    )
    return qi.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.count(F.when(F.col("grp_n") < 5, 1))
        .cast("long")
        .alias("groups_below_k5"),
        F.coalesce(
            F.sum(F.when(F.col("grp_n") < 5, F.col("grp_n"))), F.lit(0)
        )
        .cast("long")
        .alias("rows_at_risk"),
        F.min("grp_n").cast("long").alias("min_group_size"),
        F.count(F.when(F.col("sensitive_diversity") < 2, 1))
        .cast("long")
        .alias("groups_below_l2"),
    )


@query(
    "dq_near_duplicate_rows",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    )
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
           round(a.o_totalprice, 2) AS totalprice,
           CAST(date_diff('day', a.d, b.d) AS BIGINT) AS day_gap
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_totalprice = b.o_totalprice
     AND a.o_orderkey < b.o_orderkey
     AND abs(date_diff('day', a.d, b.d)) <= 1
    ORDER BY custkey, orderkey_a, orderkey_b
    """,
    tags=("dq", "dedup", "orders"),
)
def dq_near_duplicate_rows(spark, sf_dir):
    """NEAR-DUPLICATE ROW detector: same customer, identical total,
    order dates within one day — the double-submission / retry-ghost
    pattern exact row-dedup misses because the surrogate key and
    timestamp differ. The equi-join runs on (custkey, totalprice) —
    both sides hash-colocate, the day-gap residual filters after — so
    NO banded replication is needed (the equality columns already
    bound the candidates).

    Scale: one self-equi-join on high-cardinality keys; candidate
    groups are per-(customer, amount) and tiny. The per-key variant of
    snapshot_diff's table-level reconciliation."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("d"),
    )
    a = o.alias("a")
    b = o.alias("b")
    gap = F.datediff(F.col("b.d"), F.col("a.d"))
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_totalprice") == F.col("b.o_totalprice"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.abs(gap) <= 1),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("orderkey_a"),
            F.col("b.o_orderkey").alias("orderkey_b"),
            F.round("a.o_totalprice", 2).alias("totalprice"),
            gap.cast("long").alias("day_gap"),
        )
        .orderBy("custkey", "orderkey_a", "orderkey_b")
    )


@query(
    "dedup_cross_source_clones",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
      FROM documents
    ), clones AS (
      SELECT h, count(*) AS n_copies,
             count(DISTINCT source) AS n_sources,
             min(doc_id) AS keep_id
      FROM fp GROUP BY 1 HAVING count(DISTINCT source) > 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_clone_groups,
           CAST(coalesce(sum(n_copies), 0) AS BIGINT) AS n_docs_involved,
           CAST(coalesce(max(n_sources), 0) AS BIGINT) AS max_sources,
           CAST(coalesce(min(keep_id), -1) AS BIGINT) AS first_keep_id
    FROM clones
    """,
    tags=("llm", "dedup", "documents"),
)
def dedup_cross_source_clones(spark, sf_dir):
    """CROSS-SOURCE clone detection: normalized-content fingerprints
    that appear under MORE THAN ONE source — the syndication/mirror
    detector (within-source dups are usually re-crawls; cross-source
    dups are wire copy and scraped mirrors, the class that silently
    over-weights one document in a training mix). Summary row keeps
    the gate output bounded; the clone-group relation itself is the
    drop-list artifact.

    Scale: fingerprints shuffle, text doesn't (text_fingerprint's
    contract) with a two-level distinct-source aggregate on top."""
    d = t(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        F.md5(
            F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
        ).alias("h"),
    )
    clones = (
        fp.groupBy("h")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_sources") > 1)
    )
    return clones.agg(
        F.count("*").cast("long").alias("n_clone_groups"),
        F.coalesce(F.sum("n_copies"), F.lit(0))
        .cast("long")
        .alias("n_docs_involved"),
        F.coalesce(F.max("n_sources"), F.lit(0))
        .cast("long")
        .alias("max_sources"),
        F.coalesce(F.min("keep_id"), F.lit(-1))
        .cast("long")
        .alias("first_keep_id"),
    )


@query(
    "customer_negative_exposure",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(*) FILTER (c_acctbal < 0) AS BIGINT) AS n_negative,
           round(count(*) FILTER (c_acctbal < 0) * 1.0 / count(*), 6)
             AS negative_rate,
           round(coalesce(sum(c_acctbal) FILTER (c_acctbal < 0), 0), 2)
             AS exposure,
           round(coalesce(min(c_acctbal), 0), 2) AS worst_balance
    FROM customer GROUP BY 1 ORDER BY 1
    """,
    tags=("dq", "finance", "customer"),
)
def customer_negative_exposure(spark, sf_dir):
    """NEGATIVE-BALANCE EXPOSURE per segment: count, rate, summed
    exposure, and the worst single balance — the receivables-risk
    audit (which segment carries the credit risk, and is it
    concentrated in a few accounts or endemic).

    Scale: one conditional aggregate pass, |segments| output rows."""
    c = t(spark, sf_dir, "customer")
    neg = F.col("c_acctbal") < 0
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.count(F.when(neg, 1)).cast("long").alias("n_negative"),
            F.round(
                F.count(F.when(neg, 1)) * 1.0 / F.count("*"), 6
            ).alias("negative_rate"),
            F.round(
                F.coalesce(
                    F.sum(F.when(neg, F.col("c_acctbal"))), F.lit(0.0)
                ),
                2,
            ).alias("exposure"),
            F.round(F.coalesce(F.min("c_acctbal"), F.lit(0.0)), 2).alias(
                "worst_balance"
            ),
        )
        .orderBy("segment")
    )


@query(
    "dq_id_sequence_completeness",
    oracle="""
    WITH ids AS (
      SELECT o_orderkey AS id FROM orders
    ), s AS (
      SELECT count(*) AS n, min(id) AS lo, max(id) AS hi,
             count(DISTINCT id) AS n_distinct
      FROM ids
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(lo AS BIGINT) AS min_id, CAST(hi AS BIGINT) AS max_id,
           CAST(hi - lo + 1 - n_distinct AS BIGINT) AS missing_ids,
           CAST(n - n_distinct AS BIGINT) AS duplicate_ids,
           round(n_distinct * 1.0 / (hi - lo + 1), 6) AS density
    FROM s
    """,
    tags=("dq", "sequence", "orders"),
)
def dq_id_sequence_completeness(spark, sf_dir):
    """SURROGATE-KEY SEQUENCE audit: span vs distinct count of the
    order key — missing ids (holes mean upstream rows were dropped or
    a writer died mid-batch), duplicate ids (key collisions), and the
    fill density of the id space. The counting identity needs no
    islands pass: holes = span − distinct, dups = rows − distinct —
    one aggregation answers both.

    Scale: a single map-side-combining aggregate (distinct-count is
    the only shuffle); the id-space arithmetic is scalar."""
    o = t(spark, sf_dir, "orders")
    s = o.agg(
        F.count("*").alias("n"),
        F.min("o_orderkey").alias("lo"),
        F.max("o_orderkey").alias("hi"),
        F.countDistinct("o_orderkey").alias("nd"),
    )
    span = F.col("hi") - F.col("lo") + 1
    return s.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("lo").cast("long").alias("min_id"),
        F.col("hi").cast("long").alias("max_id"),
        (span - F.col("nd")).cast("long").alias("missing_ids"),
        (F.col("n") - F.col("nd")).cast("long").alias("duplicate_ids"),
        F.round(F.col("nd") * 1.0 / span, 6).alias("density"),
    )
