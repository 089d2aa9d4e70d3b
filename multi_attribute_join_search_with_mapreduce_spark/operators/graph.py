"""Near-duplicate clustering: connected components over LSH candidate
pairs, and the deduplicated (canonical) corpus derived from it.

The missing last step of the dedup pipeline: ``near_dup_candidates``
(textops.py) yields *pairs*, but a training corpus needs *clusters* —
transitively-linked groups collapsed to one canonical document. Pairs
(a,b) and (b,c) must drop two docs, not leave c behind because it never
paired with a directly.

Algorithm: min-label propagation expressed as DataFrame ops — each
round every node takes the minimum label among itself and its
neighbors (one shuffle join + one min-aggregate per round), converging
in graph-diameter rounds. Labels are seeded with the closed-
neighborhood min (one aggregate over the edge list, no join), which
buys the first propagation round at the price the old identity seed
already paid. Near-dup graphs are piles of near-cliques (LSH bands
link most members of a duplicate group directly), so the diameter is
tiny and 1-3 rounds settle it. The per-round ``.count()``
is a scalar convergence probe — orchestration, not data movement; the
iterative *data* path never touches the driver (the reference's
Seq_Search does its analogue with driver-side dicts,
Seq_Search.py:153-166 — this stays distributed).

100 TB notes: each round re-shuffles only (id, label) pairs — narrow
rows independent of document size. Persist new labels / unpersist old
keeps one generation in memory; on a real cluster add a periodic
``localCheckpoint`` to truncate lineage. For adversarial long-chain
graphs (not near-dup workloads) swap the propagation loop for
alternating large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond") — same DataFrame shape per round,
O(log n) rounds; with near-clique inputs the simple loop wins by
skipping the extra per-round join it needs.

DuckDB oracle: exact transitive closure via ``WITH RECURSIVE`` over
the same candidate SQL — min reachable id per node == the converged
propagation label, so the differential check proves the fixpoint, not
just the plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
    NEAR_DUP_SQL,
    decontaminate,
    decontaminate_sql,
    near_dup_candidates,
)
from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

# Candidate pairs at or above this estimated Jaccard become edges; the
# LSH banding already bounds candidates, the threshold drops accidental
# band collisions (est 0.25 in the fixture) from gluing real clusters.
_EDGE_THRESHOLD = 0.5

_MAX_ROUNDS = 20


def connected_components(edges: DataFrame, max_rounds: int = _MAX_ROUNDS) -> DataFrame:
    """(id, label) per node of an undirected graph given one-directional
    ``(src, dst)`` edges; label = min node id in the component.

    Pure DataFrame iteration — see module docstring for convergence and
    scale analysis.
    """
    sym = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    # Pin the symmetrized edge list: every propagation round joins it,
    # and without the persist each round re-derives the upstream edge
    # pipeline (for LSH input that's the whole shingle->minhash->band
    # computation, once per round).
    sym = sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).persist()
    # Seed each node's label with the min of its CLOSED neighborhood
    # (itself + direct neighbors) — one shuffle aggregate over sym, no
    # join. This is exactly what round one of the loop would compute
    # from self-labels, at the cost the old `distinct()` seed already
    # paid, so near-clique LSH components converge one full
    # join-propagate-count round earlier. (Seeding from LSH *band
    # buckets* instead would be wrong here: bucket pairs below the
    # est_jaccard edge threshold are not edges, and their min would
    # glue clusters the threshold separates.)
    generation = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_nbr"))
        .select("id", F.least(F.col("id"), F.col("_nbr")).alias("label"))
        .persist()
    )
    labels = generation
    for rnd in range(max_rounds):
        prop = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("label"), F.lit(0).alias("_own")
        )
        # One aggregate yields both the new label and the node's previous
        # label (the single _own=1 row per id), so convergence is a
        # filter over the already-persisted result instead of an extra
        # join against the old generation — one shuffle job less per
        # round.
        new_gen = (
            labels.withColumn("_own", F.lit(1))
            .unionByName(prop)
            .groupBy("id")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("_own") == 1, F.col("label"))).alias("_old"),
            )
        )
        # each round's plan embeds the previous generation several
        # times; periodic localCheckpoint keeps the logical plan
        # bounded over deep (high-diameter) iterations — the near-clique
        # common case breaks out before ever paying for one
        new_gen = new_gen.localCheckpoint() if rnd % 4 == 3 else new_gen.persist()
        changed = new_gen.filter(F.col("label") != F.col("_old")).count()
        # unpersist the exact cached handle (a projection's unpersist
        # would be a no-op and leak one generation per round)
        generation.unpersist()
        generation = new_gen
        labels = new_gen.select("id", "label")
        if changed == 0:
            break
    else:
        # silently returning a non-fixpoint would hand callers WRONG
        # cluster labels; diameter > max_rounds is exactly the workload
        # the alternating algorithm exists for
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(graph diameter exceeds the budget); use "
            "connected_components_alternating, which needs O(log n) rounds "
            "on any topology"
        )
    # labels was materialized by the convergence count; the edge cache
    # is no longer needed by its lineage.
    sym.unpersist()
    return labels


def _star_min(e: DataFrame) -> DataFrame:
    """Per node, the min over its closed out-neighborhood: m(u) =
    min({u} ∪ {v : (u,v) ∈ e})."""
    return (
        e.groupBy("src")
        .agg(F.min("dst").alias("_n"))
        .select("src", F.least(F.col("src"), F.col("_n")).alias("m"))
    )


def connected_components_alternating(
    edges: DataFrame, max_rounds: int = 2 * _MAX_ROUNDS
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log n) rounds on ANY graph shape, including the
    long-chain adversarial case where min-label propagation needs
    diameter rounds.

    Same contract as :func:`connected_components`: ``(id, label)`` per
    node appearing in ``edges``, label = component min.

    Per round: large-star hangs every node's larger neighbors off its
    closed-neighborhood min; small-star then hangs the smaller
    neighbors (and the node itself) off that min. Both are one
    aggregate + one join over the edge list — the same DataFrame shape
    per round as the propagation loop, but the edge list itself
    contracts toward per-component stars, so round count is
    logarithmic in component size rather than linear in diameter.
    Convergence is a (count, xxhash64-sum) checksum of the edge set —
    two scalars per round, data never touches the driver.

    Use this for unknown/adversarial graph topologies; near-dup LSH
    graphs are near-cliques where the simple seeded propagation loop
    wins by skipping the second per-round join (see module docstring).
    """
    from multi_attribute_join_search_with_mapreduce_spark.index import truncate_lineage

    # Checkpoint the INPUT edge list before anything branches off it:
    # `nodes` (kept for the final join — it must retain self-loop-only
    # ids the star rounds drop) and `cur` both consume it, and with a
    # lazy input the whole upstream edge pipeline (for semantic_dedup,
    # the Arrow cosine scorer) re-instantiates under each — the live
    # plan carried 4 ArrowEvalPython subtrees. Edge-list-sized, same
    # magnitude the loop already checkpoints every round.
    inp = truncate_lineage(
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
    )
    # all nodes, including self-loop-only ones the star rounds drop
    nodes = inp.select(F.col("src").alias("id")).union(
        inp.select(F.col("dst").alias("id"))
    ).distinct()
    # canonical (larger, smaller) orientation, self-loops out.
    # localCheckpoint (not persist): each round's plan references the
    # previous edge set ~8× (sym twice, the star join, both small-star
    # halves), so without lineage truncation the logical plan grows
    # 8^rounds and the DRIVER dies building plan trees long before any
    # executor moves data. Checkpoint blocks are reclaimed by the
    # ContextCleaner once the previous generation goes unreferenced.
    cur = (
        inp.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_rounds):
        sym = cur.union(cur.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        # large-star: ∀ v ∈ Γ(u), v > u: edge (v, m(u))
        large = (
            sym.join(_star_min(sym), "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )
        # small-star on the (larger → smaller) edges: ∀ v ∈ Γ⁻(u) ∪ {u}:
        # edge (v, m(u)); every emitted pair stays (larger, smaller)
        m_small = large.groupBy("src").agg(F.min("dst").alias("m"))
        halves = large.join(m_small, "src")
        new = (
            halves.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(halves.select("src", F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        # decimal sum: long hash values overflow an ANSI BIGINT sum
        sig_row = new.agg(
            F.count("*").alias("c"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).first()
        sig = (sig_row["c"], sig_row["h"])
        cur = new
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: cur is a star forest (child → component min)
    star = cur.select(F.col("src").alias("id"), F.col("dst").alias("label")).union(
        cur.select(F.col("dst").alias("id"), F.col("dst").alias("label"))
    ).distinct()
    # cur is checkpointed: the returned frame's lineage reads the
    # materialized blocks, not the iteration chain
    return nodes.join(star, "id", "left").select(
        "id", F.coalesce("label", "id").alias("label")
    )


# One near-dup candidate graph per (session, sf): seven consumers
# (dedup_clusters/canonical, pagerank, triangles, k-core, LPA,
# contamination BFS) share the MinHash → bands → pair-join pipeline
# instead of each rebuilding it — the same session-scoped persist
# pattern as index.cached_posting_index. Entries die with their
# session (weakref + stopped-session sweep).
#
# Measured effect at bench scale (sf0.1, min-of-2, local[32]): a WASH
# (~29s tier total either way) — the edge build is ~1.5s cold and the
# fixpoint queries are dominated by per-round scheduling, which the
# cache cannot touch. The cache is kept for the 100 TB shape, where
# the MinHash+band+pair-join build over the full corpus is the
# dominant cost and rebuilding it once per consumer (7x) would be the
# bug; at that scale this persist becomes a written-once shared table.
_EDGE_CACHE: dict[tuple[int, str], tuple] = {}


def _candidate_edges(spark: SparkSession, sf: str) -> DataFrame:
    from multi_attribute_join_search_with_mapreduce_spark.index import session_cached

    def _build() -> DataFrame:
        edges = (
            near_dup_candidates(spark, sf)
            .filter(F.col("est_jaccard") >= _EDGE_THRESHOLD)
            .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        )
        # truncate_lineage (eager), NOT persist+count: persist caches
        # the DATA but the returned frame still carries the whole
        # LSH-pipeline logical plan, and every fixpoint round embeds
        # that plan several times — at sf0.01 Catalyst re-analysis of
        # the carried lineage cost ~4s per consumer query on a 25-edge
        # graph (measured r6), dwarfing execution. Checkpointing
        # truncates the lineage to a scan of the materialized
        # partitions, so the per-round plans stay edge-sized. On a
        # cluster the helper upgrades to reliable checkpoint() — see
        # index.truncate_lineage for the durability contract.
        from multi_attribute_join_search_with_mapreduce_spark.index import truncate_lineage

        return truncate_lineage(edges)

    return session_cached(_EDGE_CACHE, spark, (sf,), _build)


def dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate cluster assignment: every document appearing in a
    qualifying candidate pair, its cluster id (min doc_id reachable),
    and the cluster size."""
    comp = connected_components(_candidate_edges(spark, sf)).select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    ).orderBy("doc_id")


def dedup_canonical(spark: SparkSession, sf: str) -> DataFrame:
    """The corpus after near-dup collapse: drop every clustered document
    except its cluster's canonical representative (min doc_id).

    The drop-set join is a left-anti on doc_id; no broadcast hint — at
    real scale the duplicate fraction can be a large share of the
    corpus (web crawls: 30%+), so the planner's size-based choice is
    the right one, not a forced driver-held table.
    """
    docs = load_table(spark, "documents", sf)
    drop = (
        dedup_clusters(spark, sf)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id")
    )
    return (
        docs.join(drop, "doc_id", "left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic (embedding-space) near-duplicate clusters: sign-bucket
    pruned cosine pairs (``embedding_near_dup``) as edges, transitively
    closed with the alternating large-star/small-star components — the
    O(log n)-round algorithm, driver-gated here on real pair data.

    Complements the text-side ``dedup_clusters`` (MinHash/LSH lexical
    near-dups): embedding cosine catches paraphrases and translations
    that share no shingles. Output: each clustered vector, its cluster
    id (min vec_id reachable) and cluster size.

    100 TB: edges are bucket-pruned pairs (never vectors²); the
    alternating rounds shuffle only (long, long) edges and contract the
    edge list each round, so worst-case chains of borderline-similar
    embeddings (a real failure mode of cosine graphs — mutation chains
    drift A≈B≈C with A̸≈C) still converge in O(log n) rounds.
    """
    from multi_attribute_join_search_with_mapreduce_spark.operators.similarity import embedding_near_dup

    edges = embedding_near_dup(spark, sf, ordered=False).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    comp = connected_components_alternating(edges).select(
        F.col("id").alias("vec_id"), F.col("label").alias("cluster_id")
    )
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "cluster_id")
        .select("vec_id", "cluster_id", "cluster_size")
        .orderBy("vec_id")
    )


def _semantic_dedup_sql() -> str:
    from multi_attribute_join_search_with_mapreduce_spark.operators.similarity import EMB_NEAR_DUP_SQL

    return f"""
WITH RECURSIVE cand AS (
  SELECT vec_a, vec_b FROM ({EMB_NEAR_DUP_SQL})
),
edges AS (
  SELECT vec_a AS u, vec_b AS v FROM cand
  UNION ALL
  SELECT vec_b, vec_a FROM cand
),
reach(u, v) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u AS vec_id, MIN(v) AS cluster_id FROM reach GROUP BY u)
SELECT c.vec_id, c.cluster_id, s.cluster_size
FROM comp c
JOIN (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY cluster_id
) s USING (cluster_id)
ORDER BY c.vec_id
"""


# --- fixed-point integer PageRank over the near-dup graph ------------------

# 12-decimal fixed point: rank 1.0 == 10^12. All iteration arithmetic
# is BIGINT (floor-div contributions, 17/20 damping) so every round is
# EXACT and order-independent — float PageRank cannot be value-hashed
# across engines because groupBy sums of doubles are not associative.
_PR_SCALE = 10**12
_PR_BASE = 150_000_000_000  # 0.15 * scale
_PR_ROUNDS = 5


def pagerank_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Five rounds of damped PageRank over the symmetric LSH near-dup
    graph — the iterative-numeric-fixpoint counterpart to the
    label-propagation components: centrality inside duplicate clusters
    (high-degree hubs accumulate mass; isolated docs pin at the 0.15
    base).

    Per round: one equi-join of the rank frame against the persisted
    edge list + one aggregate on dst — shuffles carry (id, rank) pairs
    only, never documents. Ranks live in 12-decimal fixed point;
    contribution = ``rank div degree`` (integer floor-div) and damping
    = ``(17 * Σ) div 20``, so the fixpoint trajectory is bit-exact and
    the DuckDB oracle (the same five rounds as chained CTEs) matches
    on the BIGINT column, not a float tolerance.

    At 100 TB scale the loop adds ``localCheckpoint`` every few rounds
    (see `connected_components`); five fixed rounds keep the lineage
    shallow enough to skip it.
    """
    pairs = _candidate_edges(spark, sf)
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("k")).persist()
    nodes = load_table(spark, "documents", sf).select("doc_id").persist()

    pr = nodes.select("doc_id", F.lit(_PR_SCALE).cast("long").alias("pr"))
    for rnd in range(_PR_ROUNDS):
        contrib = (
            edges.join(pr.withColumnRenamed("doc_id", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("pr div k").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        new_pr = (
            nodes.join(contrib, nodes["doc_id"] == contrib["dst"], "left")
            .select(
                "doc_id",
                (
                    F.lit(_PR_BASE)
                    + F.expr("(17 * coalesce(s, CAST(0 AS BIGINT))) div 20")
                ).cast("long").alias("pr"),
            )
            .persist()
        )
        if rnd > 0:  # round 0's pr is the unpersisted init projection
            pr.unpersist()
        pr = new_pr

    deg = outdeg.select(F.col("src").alias("doc_id"), F.col("k").alias("degree"))
    return (
        pr.join(deg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"),
            F.col("pr").alias("pagerank_fp"),
            F.round(F.col("pr").cast("double") / _PR_SCALE, 6).alias("pagerank"),
        )
        .orderBy("doc_id")
    )


def _pagerank_sql() -> str:
    its = [
        f"it0 AS (SELECT doc_id, CAST({_PR_SCALE} AS BIGINT) AS pr FROM documents)"
    ]
    for i in range(1, _PR_ROUNDS + 1):
        its.append(
            f"""it{i} AS (
  SELECT n.doc_id,
    CAST({_PR_BASE} + (17 * COALESCE(SUM(p.pr // o.k), 0)) // 20 AS BIGINT) AS pr
  FROM documents n
  LEFT JOIN edges e ON e.dst = n.doc_id
  LEFT JOIN it{i - 1} p ON p.doc_id = e.src
  LEFT JOIN outdeg o ON o.src = e.src
  GROUP BY n.doc_id)"""
        )
    return f"""
WITH cand AS (
{NEAR_DUP_SQL}
),
pairs AS (SELECT doc_a, doc_b FROM cand WHERE est_jaccard >= {_EDGE_THRESHOLD}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
outdeg AS (SELECT src, COUNT(*) AS k FROM edges GROUP BY src),
{",".join(its)}
SELECT f.doc_id,
  CAST(COALESCE(o.k, 0) AS BIGINT) AS degree,
  f.pr AS pagerank_fp,
  ROUND(CAST(f.pr AS DOUBLE) / {_PR_SCALE}, 6) AS pagerank
FROM it{_PR_ROUNDS} f
LEFT JOIN outdeg o ON o.src = f.doc_id
ORDER BY f.doc_id
"""


def triangle_count_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document triangle participation in the LSH near-dup graph —
    the local clustering signal that separates tight duplicate cliques
    (every member pairs with every other) from weak star-shaped
    accidental-collision clusters a canonicalizer should not collapse.

    Degree-oriented wedge counting, the standard distributed algorithm
    (Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW'11): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, generate wedges only
    between a node's ORIENTED out-neighbors, and close them against the
    oriented edge set. Orientation caps every node's out-degree at
    O(√m), so total wedge volume is O(m^1.5) even with hub nodes —
    id-oriented or unoriented wedge joins explode quadratically on the
    hubs ("the last reducer"). Three hash joins on narrow (long, long)
    rows, all map-side-combinable counts; exact integers, so the value
    hash needs no float care.
    """
    return triangle_counts(_candidate_edges(spark, sf)).withColumnRenamed(
        "node", "doc_id"
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, triangles) for every node of an undirected graph (given
    one-directional ``(src, dst)`` pairs) that participates in at least
    one triangle. See :func:`triangle_count_near_dup` for the algorithm
    and scale analysis."""
    pairs = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("k"))
    # orient each undirected edge exactly once: lower (degree, id) first
    e = (
        sym.join(deg.select(F.col("node").alias("src"), F.col("k").alias("ks")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("k").alias("kd")), "dst")
        .filter(
            (F.col("ks") < F.col("kd"))
            | ((F.col("ks") == F.col("kd")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst", "kd")
        .persist()
    )
    # wedges between oriented out-neighbors, canonicalized by the same
    # (degree, id) order so each wedge is generated once
    e1 = e.select("src", F.col("dst").alias("a"), F.col("kd").alias("ka"))
    e2 = e.select("src", F.col("dst").alias("b"), F.col("kd").alias("kb"))
    wedges = e1.join(e2, "src").filter(
        (F.col("ka") < F.col("kb"))
        | ((F.col("ka") == F.col("kb")) & (F.col("a") < F.col("b")))
    )
    closed = wedges.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("b")), ["a", "b"]
    ).select(F.col("src").alias("u"), F.col("a").alias("v"), F.col("b").alias("w"))
    corners = (
        closed.select(F.col("u").alias("node"))
        .unionAll(closed.select(F.col("v").alias("node")))
        .unionAll(closed.select(F.col("w").alias("node")))
    )
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
        .orderBy("node")
    )


TRIANGLE_SQL = f"""
WITH cand AS MATERIALIZED (
{NEAR_DUP_SQL}
),
pairs AS (SELECT doc_a AS src, doc_b AS dst FROM cand WHERE est_jaccard >= {_EDGE_THRESHOLD}),
sym AS MATERIALIZED (
  SELECT src, dst FROM pairs
  UNION ALL
  SELECT dst, src FROM pairs
),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS k FROM sym GROUP BY src),
e AS MATERIALIZED (
  SELECT s.src, s.dst, dd.k AS kd
  FROM sym s
  JOIN deg ds ON ds.node = s.src
  JOIN deg dd ON dd.node = s.dst
  WHERE ds.k < dd.k OR (ds.k = dd.k AND s.src < s.dst)
),
wedges AS (
  SELECT e1.src, e1.dst AS a, e2.dst AS b
  FROM e e1 JOIN e e2 ON e1.src = e2.src
  WHERE e1.kd < e2.kd OR (e1.kd = e2.kd AND e1.dst < e2.dst)
),
closed AS (
  SELECT w.src AS u, w.a AS v, w.b AS w_node
  FROM wedges w JOIN e ON e.src = w.a AND e.dst = w.b
),
corners AS (
  SELECT u AS doc_id FROM closed
  UNION ALL SELECT v FROM closed
  UNION ALL SELECT w_node FROM closed
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS triangles
FROM corners GROUP BY doc_id ORDER BY doc_id
"""


def _cc_ctes() -> str:
    """Shared recursive-CTE prefix: candidate pairs -> edges -> exact
    transitive closure -> per-node component min."""
    return f"""
WITH RECURSIVE cand AS MATERIALIZED (
{NEAR_DUP_SQL}
),
edges AS MATERIALIZED (
  SELECT doc_a AS u, doc_b AS v FROM cand WHERE est_jaccard >= {_EDGE_THRESHOLD}
  UNION ALL
  SELECT doc_b, doc_a FROM cand WHERE est_jaccard >= {_EDGE_THRESHOLD}
),
reach(u, v) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS MATERIALIZED (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u)
"""


DEDUP_CLUSTERS_SQL = f"""
{_cc_ctes()}
SELECT c.doc_id, c.cluster_id, s.cluster_size
FROM comp c
JOIN (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY cluster_id
) s USING (cluster_id)
ORDER BY c.doc_id
"""

DEDUP_CANONICAL_SQL = f"""
{_cc_ctes()}
SELECT d.doc_id, d.source
FROM documents d
LEFT JOIN comp ON comp.doc_id = d.doc_id
WHERE comp.doc_id IS NULL OR comp.cluster_id = d.doc_id
ORDER BY d.doc_id
"""


def dedup_decision_log(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document curation DECISION LOG — the auditable artifact a
    production dedup stage actually emits (what was dropped, why, and
    which survivor owns it), composing the exact and near-dup tiers
    into one cascade:

    1. ``drop_exact``    — not the min-doc_id of its content-hash group;
                           ``kept_by`` = the exact keeper.
    2. ``drop_near_dup`` — exact keeper, but its LSH component's
                           representative (min reachable doc_id) is
                           another doc; ``kept_by`` = the representative.
    3. ``keep``          — survives both tiers (``kept_by`` NULL).

    A component representative is always the min doc_id of the whole
    cluster, hence also the exact keeper of its own hash group — so a
    ``kept_by`` pointer never targets an exact-dropped doc; at most one
    near-dup hop (audit-log convention: pointers are one level, chains
    are resolved by reading the target's own row).

    Scale shape: the exact tier is one hash-keyed aggregate + join; the
    near-dup tier reuses the session-cached candidate edge graph
    (`_EDGE_CACHE`) and the iterative CC operator — nothing here adds a
    shuffle beyond the tiers it composes."""
    d = (
        load_table(spark, "documents", sf)
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.md5("text").alias("h"))
    )
    ex = d.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    comp = connected_components(_candidate_edges(spark, sf)).select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    joined = d.join(ex, "h").join(comp, "doc_id", "left")
    is_exact_drop = F.col("doc_id") != F.col("keeper")
    is_near_drop = F.col("cluster_id").isNotNull() & (
        F.col("cluster_id") != F.col("doc_id")
    )
    return joined.select(
        "doc_id",
        F.when(is_exact_drop, F.lit("drop_exact"))
        .when(is_near_drop, F.lit("drop_near_dup"))
        .otherwise(F.lit("keep"))
        .alias("status"),
        F.when(is_exact_drop, F.col("keeper"))
        .when(is_near_drop, F.col("cluster_id"))
        .otherwise(F.lit(None).cast("long"))
        .alias("kept_by"),
    ).orderBy("doc_id")


DEDUP_DECISION_SQL = f"""
{_cc_ctes()},
d AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE text IS NOT NULL
),
ex AS (SELECT h, MIN(doc_id) AS keeper FROM d GROUP BY h)
SELECT d.doc_id,
  CASE WHEN d.doc_id <> ex.keeper THEN 'drop_exact'
       WHEN comp.cluster_id IS NOT NULL AND comp.cluster_id <> d.doc_id
         THEN 'drop_near_dup'
       ELSE 'keep' END AS status,
  CASE WHEN d.doc_id <> ex.keeper THEN ex.keeper
       WHEN comp.cluster_id IS NOT NULL AND comp.cluster_id <> d.doc_id
         THEN comp.cluster_id
       ELSE NULL END AS kept_by
FROM d JOIN ex USING (h) LEFT JOIN comp ON comp.doc_id = d.doc_id
ORDER BY d.doc_id
"""


_KC_ROUNDS = 5


def kcore_values(edges: DataFrame, rounds: int = _KC_ROUNDS) -> DataFrame:
    """Core numbers for every node of an undirected graph (given
    one-directional ``(src, dst)`` pairs) via the distributed H-INDEX
    iteration (Lü et al., "The H-index of a network node", Nature
    Communications 2016): start every node at its degree, then
    repeatedly set ``c(v) ← min(c(v), H({c(u) : u ∈ N(v)}))`` — the
    h-index of the neighbor values. Starting from degrees the sequence
    is non-increasing, stays ≥ coreness, and converges TO the coreness
    vector, so a fixed synchronous round count is the k-core analogue
    of `pagerank_near_dup`'s unrolled fixpoint.

    Per round: one equi-join of the (node, core) frame against the
    edge list + one degree-bounded window (h-index = max rank r with
    r-th-largest neighbor value ≥ r) + one aggregate — shuffles carry
    (long, long) pairs only. All-integer arithmetic, so the DuckDB
    oracle (the same rounds as chained CTEs) matches on values with no
    float care; h is tie-order-independent (the multiset of neighbor
    values determines it), so the non-deterministic row_number order
    among ties cannot desync the engines.

    Output carries ``converged``: one extra half-round computes the
    next h and checks ``h ≥ core`` (no further decrease). BOTH engines
    compute it — the hash gate proves trajectory equality at round R
    regardless, and the pytest closed-form test asserts it is TRUE on
    the fixtures (rounds sized with margin: near-dup graphs converge
    in ~3).
    """
    from pyspark.sql import Window

    pairs = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    ).persist()

    # h-index of a value multiset, computed on the degree-bounded
    # collected array: with values sorted descending, [v_r >= r] is
    # monotone non-increasing in r, so h = #{r : v_r >= r}. One
    # aggregate per node — no per-neighbor window sort, and the array
    # is bounded by degree (the same bound the windowed form had).
    _H_EXPR = (
        "aggregate(zip_with(sort_array(collect_vals, false),"
        " sequence(1, size(collect_vals)),"
        " (v, r) -> IF(v >= CAST(r AS BIGINT), 1, 0)), 0, (a, x) -> a + x)"
    )

    def h_pass(core: DataFrame) -> DataFrame:
        """(node, h) = h-index of each node's neighbors' current cores."""
        nb = sym.join(
            core.select(F.col("node").alias("dst"), F.col("core").alias("nc")),
            "dst",
        ).select(F.col("src").alias("node"), "nc")
        return (
            nb.groupBy("node")
            .agg(F.collect_list("nc").alias("collect_vals"))
            .select("node", F.expr(_H_EXPR).cast("long").alias("h"))
        )

    def step(core: DataFrame) -> DataFrame:
        """min(core, h(neighbors)) in ONE join + ONE aggregate: the
        node's own core rides the union as a tagged self-row, so no
        second join is needed to combine it with the neighbor h."""
        nb = sym.join(
            core.select(F.col("node").alias("dst"), F.col("core").alias("nc")),
            "dst",
        ).select(
            F.col("src").alias("node"), "nc", F.lit(False).alias("is_self")
        )
        own = core.select(
            "node", F.col("core").alias("nc"), F.lit(True).alias("is_self")
        )
        merged = nb.unionByName(own)
        return (
            merged.groupBy("node")
            .agg(
                F.collect_list(F.when(~F.col("is_self"), F.col("nc"))).alias(
                    "collect_vals"
                ),
                F.max(F.when(F.col("is_self"), F.col("nc"))).alias("own"),
            )
            .select(
                "node",
                F.least(F.col("own"), F.expr(_H_EXPR).cast("long"))
                .cast("long")
                .alias("core"),
            )
        )

    core = deg.select("node", F.col("degree").alias("core"))
    for rnd in range(rounds):
        stepped = step(core)
        # localCheckpoint every few rounds truncates the per-round
        # doubling lineage (connected_components discipline)
        core = stepped.localCheckpoint() if rnd % 4 == 3 else stepped.persist()

    final_h = h_pass(core)
    return (
        core.join(deg, "node")
        .join(final_h, "node")
        .select(
            "node",
            "degree",
            "core",
            (F.col("h") >= F.col("core")).alias("converged"),
        )
        .orderBy("node")
    )


def kcore_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Core numbers over the LSH near-dup graph — the density signal
    between `triangle_count_near_dup` (local cliquishness) and
    `dedup_clusters` (mere reachability): a document's coreness is the
    largest k for which it survives iterated pruning of sub-k-degree
    neighbors, separating genuinely dense duplicate cliques from
    chains/stars that connected components cannot tell apart."""
    return kcore_values(_candidate_edges(spark, sf)).withColumnRenamed(
        "node", "doc_id"
    )


def _kcore_sql() -> str:
    # Every round's CTE references the previous one TWICE (as the carry
    # frame and inside the h-index subquery). DuckDB inlines plain CTEs,
    # so 8 rounds would expand to 2^8 copies of the NEAR_DUP_SQL scan —
    # thousands of parquet opens (observed: "Too many open files") and
    # exponential planning. MATERIALIZED pins each round to run once,
    # making the oracle linear in rounds like the Spark side.
    its = [
        "c0 AS MATERIALIZED (SELECT node, degree AS core FROM deg)"
    ]
    h_from = """
    SELECT src AS node, CAST(MAX(CASE WHEN nc >= rn THEN rn ELSE 0 END) AS BIGINT) AS h
    FROM (
      SELECT s.src, p.core AS nc,
             ROW_NUMBER() OVER (PARTITION BY s.src ORDER BY p.core DESC) AS rn
      FROM sym s JOIN {prev} p ON p.node = s.dst
    )
    GROUP BY src
"""
    for i in range(1, _KC_ROUNDS + 1):
        its.append(
            f"""c{i} AS MATERIALIZED (
  SELECT p.node, CAST(LEAST(p.core, h.h) AS BIGINT) AS core
  FROM c{i - 1} p JOIN ({h_from.format(prev=f"c{i - 1}")}) h ON h.node = p.node)"""
        )
    return f"""
WITH cand AS MATERIALIZED (
{NEAR_DUP_SQL}
),
pairs AS (SELECT doc_a AS src, doc_b AS dst FROM cand WHERE est_jaccard >= {_EDGE_THRESHOLD}),
sym AS MATERIALIZED (
  SELECT src, dst FROM pairs
  UNION ALL
  SELECT dst, src FROM pairs
),
deg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY src),
{",".join(its)}
SELECT c.node AS doc_id, d.degree, c.core, (h.h >= c.core) AS converged
FROM c{_KC_ROUNDS} c
JOIN deg d ON d.node = c.node
JOIN ({h_from.format(prev=f"c{_KC_ROUNDS}")}) h ON h.node = c.node
ORDER BY doc_id
"""


_LPA_ROUNDS = 4


def lpa_labels(edges: DataFrame, rounds: int = _LPA_ROUNDS) -> DataFrame:
    """Community labels for an undirected graph via synchronous label
    propagation (Raghavan et al. 2007), made deterministic: every node
    starts labeled with its own id, and each round adopts the most
    frequent label among its neighbors AND itself, ties broken by the
    smallest label. Self-inclusion damps the 2-coloring oscillation of
    pure synchronous LPA, and the (count DESC, label ASC) tie-break
    makes the trajectory a pure function of the graph — so the DuckDB
    oracle (the same rounds as MATERIALIZED chained CTEs) matches on
    values with no float care, like `kcore_values`.

    Per round: one equi-join of the (node, label) frame against the
    edge list, one (node, label) count aggregate, one degree-bounded
    window — shuffles carry (long, long) pairs only, never anything
    corpus-sized. ``converged`` = one extra vote pass changes nothing.

    Community detection sits between `dedup_clusters` (pure
    reachability — one bridge edge merges two crawl mirrors) and
    `kcore_near_dup` (local density): LPA splits bridge-connected
    components into their dense cores, the granularity you actually
    want for "near-duplicate families" in corpus curation.
    """
    from pyspark.sql import Window

    pairs = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    nodes = sym.select(F.col("src").alias("node")).distinct().persist()

    def vote(lab: DataFrame) -> DataFrame:
        """(node, label) = the plurality label among self + neighbors.
        The (count DESC, label ASC) pick is a map-side-combinable
        ``max_by`` over the ordering struct (c, -label) — (node,label)
        rows are unique, so the struct is a total order and the pick is
        deterministic without a per-node window sort."""
        votes = sym.join(
            lab.select(F.col("node").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("node"), "label").unionByName(lab)
        cnt = votes.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        return cnt.groupBy("node").agg(
            F.max_by(
                "label", F.struct(F.col("c"), (-F.col("label")).alias("nl"))
            ).alias("label")
        )

    lab = nodes.select("node", F.col("node").alias("label"))
    for rnd in range(rounds):
        stepped = vote(lab)
        # localCheckpoint every few rounds truncates the per-round
        # doubling lineage (connected_components discipline)
        lab = stepped.localCheckpoint() if rnd % 4 == 3 else stepped.persist()

    nxt = vote(lab).withColumnRenamed("label", "next_label")
    sizes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("community_size"))
    return (
        lab.join(nxt, "node")
        .join(sizes, "label")
        .select(
            "node",
            F.col("label").alias("community"),
            "community_size",
            (F.col("next_label") == F.col("label")).alias("converged"),
        )
        .orderBy("node")
    )


def lpa_communities(spark: SparkSession, sf: str) -> DataFrame:
    """Label-propagation communities over the LSH near-dup graph."""
    return lpa_labels(_candidate_edges(spark, sf)).withColumnRenamed(
        "node", "doc_id"
    )


def _lpa_sql() -> str:
    # Like _kcore_sql: each round references the previous one twice
    # (neighbor join + self-inclusion union), so the CTEs MUST be
    # MATERIALIZED or DuckDB's inlining goes exponential in rounds.
    vote_from = """
    SELECT node, label FROM (
      SELECT node, label,
             ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
      FROM (
        SELECT node, label, COUNT(*) AS c FROM (
          SELECT s.src AS node, p.label FROM sym s JOIN {prev} p ON p.node = s.dst
          UNION ALL
          SELECT node, label FROM {prev}
        )
        GROUP BY node, label
      )
    ) WHERE rn = 1
"""
    its = ["l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"]
    for i in range(1, _LPA_ROUNDS + 1):
        its.append(
            f"l{i} AS MATERIALIZED ({vote_from.format(prev=f'l{i - 1}')})"
        )
    return f"""
WITH cand AS MATERIALIZED (
{NEAR_DUP_SQL}
),
pairs AS (SELECT doc_a AS src, doc_b AS dst FROM cand WHERE est_jaccard >= {_EDGE_THRESHOLD}),
sym AS MATERIALIZED (
  SELECT src, dst FROM pairs
  UNION ALL
  SELECT dst, src FROM pairs
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
{",".join(its)},
nxt AS MATERIALIZED ({vote_from.format(prev=f"l{_LPA_ROUNDS}")}),
sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size FROM l{_LPA_ROUNDS} GROUP BY label)
SELECT l.node AS doc_id, l.label AS community, z.community_size,
       (x.label = l.label) AS converged
FROM l{_LPA_ROUNDS} l
JOIN nxt x ON x.node = l.node
JOIN sizes z ON z.label = l.label
ORDER BY doc_id
"""


_BFS_ROUNDS = 4


def bfs_hops(edges: DataFrame, seeds: DataFrame, rounds: int = _BFS_ROUNDS) -> DataFrame:
    """Exact hop distance (≤ ``rounds``) from a seed node set over an
    undirected graph: unrolled min-plus rounds. The reached frame
    starts at the seeds and each round unions one-hop extensions and
    re-minimizes — the frame never exceeds (reached nodes) rows and
    every shuffle carries (long, long) pairs. Nodes beyond ``rounds``
    hops are absent by contract (the radius cap IS the semantics: at
    100 TB an unbounded closure is `connected_components`' job).
    """
    pairs = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    nodes = sym.select(F.col("src").alias("node")).distinct()
    d = (
        seeds.select(F.col("node").cast("long").alias("node"))
        .join(nodes, "node")
        .select("node", F.lit(0).cast("long").alias("hops"))
        .persist()
    )
    for _ in range(rounds):
        step = sym.join(
            d.select(F.col("node").alias("dst"), "hops"), "dst"
        ).select(F.col("src").alias("node"), (F.col("hops") + 1).alias("hops"))
        d = (
            d.unionByName(step)
            .groupBy("node")
            .agg(F.min("hops").cast("long").alias("hops"))
            .persist()
        )
    return d.orderBy("node")


_RADIUS_W = 3  # coarser than DECON_W=4: the quarantine sweep wants recall


def contamination_radius(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-contamination blast radius: hop distance from the
    `decontaminate`-flagged training docs through the near-dup graph.
    A doc sharing no eval n-gram but sitting one LSH hop from a flagged
    doc is a near-copy of contaminated text — the transitive suspect
    set a curation pipeline quarantines, not just the direct hits.
    Seeds use a coarser screening width (w=3) than the precision-tuned
    `decontaminate` query (w=4): a quarantine sweep is recall-first,
    and the wider flag set is what actually intersects the dup graph.
    Output is every doc within ``_BFS_ROUNDS`` hops with its exact
    distance.
    """
    seeds = decontaminate(spark, sf, w=_RADIUS_W).select(
        F.col("doc_id").alias("node")
    )
    return bfs_hops(_candidate_edges(spark, sf), seeds).withColumnRenamed(
        "node", "doc_id"
    )


def _bfs_sql() -> str:
    # d{i} references d{i-1} twice (carry + one-hop extension) →
    # MATERIALIZED, same exponential-inlining hazard as _kcore_sql.
    its = [
        """d0 AS MATERIALIZED (
  SELECT s.node, CAST(0 AS BIGINT) AS hops
  FROM seeds s JOIN nodes n ON n.node = s.node)"""
    ]
    for i in range(1, _BFS_ROUNDS + 1):
        its.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, CAST(MIN(hops) AS BIGINT) AS hops FROM (
    SELECT node, hops FROM d{i - 1}
    UNION ALL
    SELECT s.src AS node, p.hops + 1 AS hops
    FROM sym s JOIN d{i - 1} p ON p.node = s.dst
  )
  GROUP BY node)"""
        )
    return f"""
WITH cand AS MATERIALIZED (
{NEAR_DUP_SQL}
),
gpairs AS (SELECT doc_a AS src, doc_b AS dst FROM cand WHERE est_jaccard >= {_EDGE_THRESHOLD}),
sym AS MATERIALIZED (
  SELECT src, dst FROM gpairs
  UNION ALL
  SELECT dst, src FROM gpairs
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
seeds AS MATERIALIZED (SELECT doc_id AS node FROM ({decontaminate_sql(_RADIUS_W)})),
{",".join(its)}
SELECT node AS doc_id, hops FROM d{_BFS_ROUNDS} ORDER BY doc_id
"""


def cluster_rep_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-aware canonical selection: per near-dup cluster, keep the
    HIGHEST-`quality_score` member (tie → min doc_id) instead of
    `dedup_canonical`'s positional min-id pick — the curation policy a
    training pipeline actually wants (of N near-copies, keep the
    cleanest, not the first-crawled). One `max_by` over the ordering
    struct (quality, -doc_id): map-side-combinable, no per-cluster
    window sort; the join adds one exchange on doc_id over the
    cluster-member frame (duplicate-fraction-sized, not corpus-sized).
    Determinism: quality is a 2-decimal-rounded 5-valued score, so ties
    are common and the -doc_id component makes the pick total."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        quality_score,
    )

    clusters = dedup_clusters(spark, sf)
    q = quality_score(spark, sf).select("doc_id", "quality")
    return (
        clusters.join(q, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                "doc_id",
                F.struct(F.col("quality"), (-F.col("doc_id")).alias("nd")),
            ).alias("rep_doc_id"),
            F.max("quality").alias("rep_quality"),
            F.max("cluster_size").alias("cluster_size"),
        )
        .orderBy("cluster_id")
    )


def _cluster_rep_sql() -> str:
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        QUALITY_SQL,
    )

    return f"""
{_cc_ctes()},
q AS (SELECT doc_id, quality FROM ({QUALITY_SQL})),
j AS (
  SELECT c.cluster_id, c.doc_id, q.quality,
    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                       ORDER BY q.quality DESC, c.doc_id ASC) AS rn,
    COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
    MAX(q.quality) OVER (PARTITION BY c.cluster_id) AS rep_quality
  FROM comp c JOIN q ON q.doc_id = c.doc_id
)
SELECT cluster_id, doc_id AS rep_doc_id, rep_quality,
  CAST(cluster_size AS BIGINT) AS cluster_size
FROM j WHERE rn = 1
ORDER BY cluster_id
"""


GRAPH_QUERIES: dict[str, QuerySpec] = {
    "cluster_rep_sample": QuerySpec(cluster_rep_sample, _cluster_rep_sql()),
    "kcore_near_dup": QuerySpec(kcore_near_dup, _kcore_sql()),
    "lpa_communities": QuerySpec(lpa_communities, _lpa_sql()),
    "contamination_radius": QuerySpec(contamination_radius, _bfs_sql()),
    "pagerank_near_dup": QuerySpec(pagerank_near_dup, _pagerank_sql()),
    "dedup_clusters": QuerySpec(dedup_clusters, DEDUP_CLUSTERS_SQL),
    "dedup_canonical": QuerySpec(dedup_canonical, DEDUP_CANONICAL_SQL),
    "dedup_decision_log": QuerySpec(dedup_decision_log, DEDUP_DECISION_SQL),
    "semantic_dedup": QuerySpec(semantic_dedup, _semantic_dedup_sql()),
    "triangle_count_near_dup": QuerySpec(triangle_count_near_dup, TRIANGLE_SQL),
}
