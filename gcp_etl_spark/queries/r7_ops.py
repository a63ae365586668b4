"""Round-7 operator additions (SURVEY.md §2H).

Opens with the round-6 verdict asks executed as first-class queries:
two-phase connected components (Kiveris large-star/small-star) as a
hash-verified clustering arm, ANN-shortlisted bitext mining (the dense
cross join demoted to oracle foil), batched BPE merge learning, and the
streaming ANN probe dual. Later sections widen the training-data
surface.

Cross-engine determinism policy: identical to r5/r6 (decimal sums or
>=6 dp rounding before any cross-engine compare; md5-hash uniforms for
every seeded draw).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t

# ------------------------------------------------ two-phase components

_CC_EXACT_ORACLE = """
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
"""


@query(
    "dedup_cluster_twophase",
    oracle=_CC_EXACT_ORACLE,
    tags=("llm", "dedup", "cluster", "scale"),
)
def dedup_cluster_twophase(spark, sf_dir):
    """Near-dup clusters over the exact trigram-Jaccard pair graph,
    computed by LARGE-STAR/SMALL-STAR alternation (Kiveris et al. 2014
    "Connected Components in MapReduce and Beyond", public) — the
    O(log n)-round distributed components algorithm, against the same
    recursive-transitive-closure oracle as ``dedup_cluster_exact``
    (min-label arm), so the two-phase ALGEBRA itself is hash-verified
    end-to-end, not just pytest-asserted.

    Scale: each phase is one groupBy(min) + one equi-join on the edge
    relation; unlike min-label propagation (O(diameter) rounds, the
    registered default — near-dup graphs are short-diameter), the
    star operations re-point whole chains at their neighborhood
    minimum each round, so an adversarial diameter-n path converges in
    O(log n) rounds (pinned: tests/test_r7.py, 255-hop chain, <=12
    rounds). This is the escape hatch the r6 verdict asked to make
    real (llm/cluster.py was citing the paper without implementing
    it)."""
    from gcp_etl_spark.llm.cluster import connected_components
    from gcp_etl_spark.queries.llm_ops import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    cc = connected_components(
        pairs, src="id_a", dst="id_b", algorithm="two-phase"
    )
    return cc.groupBy("comp").agg(F.count("*").alias("n_docs"))
