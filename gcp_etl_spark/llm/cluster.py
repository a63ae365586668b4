"""Connected components over near-duplicate pair edges.

Pair-level dedup (minhash/simhash) emits EDGES; what a training-data
pipeline acts on is the CLUSTER: keep one canonical doc per component,
drop the rest. This is min-label propagation on the undirected pair
graph, expressed as iterated DataFrame joins.

Scale notes: each round is one join + one groupBy on the edge list
(both AQE-managed shuffles); rounds converge in O(graph diameter),
and near-dup clusters are short-diameter stars/cliques in practice
(2-4 rounds). The driver loop only checks a scalar convergence count
per round, and lineage is cut with localCheckpoint so the plan does
not grow O(rounds). For adversarial long-chain graphs swap in
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond") — same join primitives, fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SMALL_GRAPH_EDGES = 500_000


def _components_local(pdf, a_col: str, b_col: str):
    """Union-find with path compression over a collected edge list —
    exact same contract as the distributed loop (comp = min reachable
    id). O(E α(E)) on one core; at the SMALL_GRAPH_EDGES ceiling this
    is well under a second, where the distributed loop pays ~0.5 s of
    job overhead PER ROUND times graph diameter."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pdf[a_col], pdf[b_col]):
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    roots = {n: find(n) for n in parent}
    for n, r in roots.items():
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return [(n, comp_min[r]) for n, r in roots.items()]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """(node, comp) — comp is the minimum node id reachable from node.

    ``edges`` is an undirected pair list (each pair once is fine).

    ADAPTIVE (r6): the edge count is already measured for partition
    sizing — when the graph is below ``small_graph_edges`` the
    components come from one driver-local union-find pass over the
    collected edge list instead of O(diameter) distributed rounds
    (each round = join + agg + checkpoint ≈ 0.5 s of fixed job
    overhead; a 2k-edge near-dup graph was paying ~7 s for what
    union-find does in milliseconds). The near-dup edge list is
    orders of magnitude smaller than the corpus, but NOT structurally
    bounded — above the threshold (500k edges ≈ 8 MB driver-side) the
    distributed min-label loop runs as before. Equality of the two
    paths is pinned by tests/test_r6.py::test_cc_local_equals_distributed.
    """
    # symmetrize in ONE pass over edges (a union of two selects would
    # recompute the upstream pair pipeline — minhash etc. — twice)
    sym0 = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .persist()
    )
    # size the LOOP's parallelism to the edge list, not the session
    # default: the near-dup graph is orders of magnitude smaller than
    # the corpus that produced it, and every iteration re-scans these
    # partitions — at 32 session partitions a 512-edge graph pays 32
    # task launches per job per round. ~50k edges/partition keeps
    # tasks meaningful; huge graphs keep full parallelism.
    n_edges = sym0.count()
    if n_edges <= small_graph_edges:
        pdf = sym0.toPandas()
        rows = _components_local(pdf, "a", "b")
        # schema parity with the distributed path (r6 ADVICE): the
        # node type is the WIDENED common type of both endpoint
        # columns (sym0's explode already coerced a/b through Spark's
        # own struct-element widening — e.g. int src + long dst → long
        # on both paths), and nullability follows those coerced fields
        # rather than being pinned False.
        a_f = next(f for f in sym0.schema.fields if f.name == "a")
        sym0.unpersist()
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("node", a_f.dataType, a_f.nullable),
                StructField("comp", a_f.dataType, a_f.nullable),
            ]
        )
        return edges.sparkSession.createDataFrame(rows, schema)
    par = edges.sparkSession.sparkContext.defaultParallelism
    n_parts = max(1, min(par, n_edges // 50_000 + 1))
    sym = sym0.coalesce(n_parts).persist()
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    sym0.unpersist()
    for _ in range(max_iter):
        # each node adopts min(own label, neighbours' labels)
        neigh = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
        )
        new = (
            labels.join(neigh, labels["node"] == neigh["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
                (F.col("ncomp") < F.col("comp")).alias("__chg"),
            )
        ).localCheckpoint()  # eager: truncates lineage, runs the round
        n_changed = new.filter(F.col("__chg")).count()
        labels = new.drop("__chg")
        if n_changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Cluster near-dup pairs; one row per multi-doc component:
    (comp = canonical/minimum doc id, n_docs)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.groupBy("comp").agg(F.count("*").alias("n_docs"))
