"""Connected-components / dedup-cluster properties (exact-match checks
live in tests/test_queries_differential.py via the registry)."""

from __future__ import annotations

from multi_attribute_join_search_with_mapreduce_spark.operators.graph import (
    _candidate_edges,
    connected_components,
    connected_components_alternating,
    dedup_canonical,
    dedup_clusters,
)
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table


def test_connected_components_hand_graph(spark):
    # chain 1-2-3, triangle 10-11-12 (+edge back to 10), isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21)],
        "src long, dst long",
    )
    got = {r.id: r.label for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_clusters_are_transitive_closures(spark, sf_dir):
    cluster_of = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_dir).collect()}
    edges = _candidate_edges(spark, sf_dir).collect()
    for e in edges:
        # every qualifying pair landed in one cluster
        assert cluster_of[e.src] == cluster_of[e.dst]
    for doc, cid in cluster_of.items():
        # representative is a member and is the minimum id
        assert cluster_of[cid] == cid
        assert cid <= doc


def test_canonical_keeps_one_doc_per_cluster(spark, sf_dir):
    clusters = dedup_clusters(spark, sf_dir).collect()
    kept = {r.doc_id for r in dedup_canonical(spark, sf_dir).collect()}
    n_docs = load_table(spark, "documents", sf_dir).count()
    clustered = {r.doc_id for r in clusters}
    reps = {r.cluster_id for r in clusters}
    # exactly the non-representatives were dropped
    assert n_docs - len(kept) == len(clustered) - len(reps)
    assert reps <= kept
    assert not (clustered - reps) & kept


def test_connected_components_random_vs_union_find(spark):
    """Property check behind the seeded-label optimization: on random
    graphs (including long chains, the worst case for neighborhood-min
    seeding) the converged labels must equal an independent union-find's
    component minima."""
    import random

    rng = random.Random(20260814)
    for trial in range(4):
        n = rng.randrange(8, 40)
        m = rng.randrange(4, 60)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        # force one long chain so convergence needs multiple rounds
        chain = rng.sample(range(n), min(n, 9))
        edges += list(zip(chain, chain[1:]))

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            parent[find(u)] = find(v)
        touched = {x for uv in edges for x in uv}
        want = {}
        for x in touched:
            root = find(x)
            want.setdefault(root, []).append(x)
        expect = {x: min(members) for root, members in want.items() for x in members}

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.id: r.label for r in connected_components(df).collect()}
        assert got == expect, f"trial {trial}: {got} != {expect}"
        got_alt = {
            r.id: r.label for r in connected_components_alternating(df).collect()
        }
        assert got_alt == expect, f"trial {trial} (alternating): {got_alt} != {expect}"


def test_alternating_components_hand_graph(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21), (30, 30)],
        "src long, dst long",
    )
    got = {r.id: r.label for r in connected_components_alternating(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30}


def test_alternating_components_long_chain(spark):
    """The adversarial case the algorithm exists for: a 64-node path has
    diameter 63 but must converge in O(log n) star rounds."""
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        r.id: r.label
        for r in connected_components_alternating(edges, max_rounds=14).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_semantic_dedup_clusters_cover_pairs(spark, sf_dir):
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import semantic_dedup
    from multi_attribute_join_search_with_mapreduce_spark.operators.similarity import embedding_near_dup

    cluster_of = {r.vec_id: r.cluster_id for r in semantic_dedup(spark, sf_dir).collect()}
    pairs = embedding_near_dup(spark, sf_dir, ordered=False).collect()
    assert pairs, "fixture should produce at least one near-dup pair"
    for p in pairs:
        assert cluster_of[p.vec_a] == cluster_of[p.vec_b]
    for vec, cid in cluster_of.items():
        assert cluster_of[cid] == cid
        assert cid <= vec


def test_propagation_raises_on_diameter_overrun(spark):
    """A non-fixpoint must never be returned silently: a 64-node path
    exceeds the round budget and must raise, naming the alternating
    algorithm; the alternating version solves the identical input."""
    import pytest

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="alternating"):
        connected_components(edges, max_rounds=10)


def test_join_graph_hot_key_cap_and_partial_containment(spark):
    """Synthetic lake for the discovery core: partial containment is
    computed over capped key sets, and a hot key glueing five columns is
    dropped by the cap (JOSIE-style posting-length prune)."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.discovery import (
        join_graph_from_postings,
    )

    rows = []
    for k in "abcd":
        rows.append((k, 1, 0, 0))
    for k in "abx":
        rows.append((k, 2, 0, 0))
    rows.append(("q", 3, 0, 0))
    for t in (1, 2, 3, 4, 5):  # 'h' present in 5 columns
        rows.append(("h", t, 0, 0))
    postings = spark.createDataFrame(rows, "key string, table int, column int, row long")

    capped = join_graph_from_postings(postings, tau=0.5, max_key_cols=4).collect()
    assert [(r.table_a, r.table_b, r.n_common, r.n_a, r.n_b, r.containment)
            for r in capped] == [(1, 2, 2, 4, 3, 0.6667)]

    uncapped = join_graph_from_postings(postings, tau=0.5, max_key_cols=100).collect()
    got = {(r.table_a, r.table_b): r.containment for r in uncapped}
    # the hot key now glues the singleton columns at full containment
    assert got[(3, 4)] == 1.0 and got[(4, 5)] == 1.0
    # 'h' joins both sets: common {a,b,h}, min size 4
    assert got[(1, 2)] == 0.75


def test_pagerank_fixed_point_matches_python_simulation(spark, sf_dir):
    """Replay the 5-round fixed-point iteration in pure Python over the
    same edge list — every BIGINT rank must match exactly (the whole
    point of the integer formulation)."""
    from collections import defaultdict

    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import (
        _EDGE_THRESHOLD,
        _PR_BASE,
        _PR_ROUNDS,
        _PR_SCALE,
        pagerank_near_dup,
    )
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        near_dup_candidates,
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    pairs = [
        (r.doc_a, r.doc_b)
        for r in near_dup_candidates(spark, sf_dir)
        .filter(f"est_jaccard >= {_EDGE_THRESHOLD}")
        .collect()
    ]
    edges = defaultdict(list)
    for a, b in pairs:
        edges[a].append(b)
        edges[b].append(a)
    nodes = [r.doc_id for r in load_table(spark, "documents", sf_dir).select("doc_id").collect()]

    pr = {n: _PR_SCALE for n in nodes}
    for _ in range(_PR_ROUNDS):
        s = defaultdict(int)
        for src, dsts in edges.items():
            c = pr[src] // len(dsts)
            for d in dsts:
                s[d] += c
        pr = {n: _PR_BASE + (17 * s[n]) // 20 for n in nodes}

    got = {r.doc_id: (r.pagerank_fp, r.degree) for r in pagerank_near_dup(spark, sf_dir).collect()}
    assert set(got) == set(nodes)
    for n in nodes:
        assert got[n] == (pr[n], len(edges.get(n, []))), n
    # isolated docs pin at the damping base exactly
    isolated = [n for n in nodes if n not in edges]
    assert all(got[n][0] == _PR_BASE for n in isolated)


def test_triangle_counts_hand_graphs(spark):
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import triangle_counts

    # K4: C(4,3)=4 triangles, every node in exactly 3
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {r.node: r.triangles for r in triangle_counts(
        spark.createDataFrame(k4, "src long, dst long")).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    # star K1,5: the hub is the degree-skew adversary; zero triangles
    star = [(100, i) for i in range(5)]
    assert triangle_counts(
        spark.createDataFrame(star, "src long, dst long")).count() == 0

    # triangle + pendant edge: pendant node absent from output
    tri = [(1, 2), (2, 3), (3, 1), (3, 4)]
    got = {r.node: r.triangles for r in triangle_counts(
        spark.createDataFrame(tri, "src long, dst long")).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_handshake_identity(spark, sf_dir):
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import (
        triangle_count_near_dup,
    )

    rows = triangle_count_near_dup(spark, sf_dir).collect()
    total_corners = sum(r.triangles for r in rows)
    assert total_corners % 3 == 0  # every triangle contributes 3 corners


def test_kcore_hand_graphs(spark):
    """4-clique -> core 3; triangle -> core 2; pendant hangs at 1; a
    chain is all 1s even though interior degrees are 2... no — chain
    interior nodes have degree 2 but core 1 (peeling the ends cascades),
    which is exactly what degree alone gets wrong."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import kcore_values

    # triangle {1,2,3} + pendant 4-1; 4-clique {10,11,12,13}; chain 20-21-22-23
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1),
         (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13),
         (20, 21), (21, 22), (22, 23)],
        "src long, dst long",
    )
    rows = kcore_values(edges).collect()
    assert all(r.converged for r in rows)
    got = {r.node: r.core for r in rows}
    assert got == {1: 2, 2: 2, 3: 2, 4: 1,
                   10: 3, 11: 3, 12: 3, 13: 3,
                   20: 1, 21: 1, 22: 1, 23: 1}
    deg = {r.node: r.degree for r in rows}
    assert deg[21] == 2 and got[21] == 1  # coreness < degree on the chain


def test_kcore_near_dup_bounded_by_degree_and_converged(spark, sf_dir):
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import kcore_near_dup

    rows = kcore_near_dup(spark, sf_dir).collect()
    assert rows, "near-dup graph is non-empty at fixture scale"
    assert all(r.converged for r in rows)
    assert all(1 <= r.core <= r.degree for r in rows)


def test_lpa_splits_bridge_joined_triangles(spark):
    """Two triangles joined by one bridge edge: connected components
    would merge them into one cluster; LPA must keep them as two
    communities (the bridge minority vote never wins) — hand-simulated
    fixpoint: {1,2,3} -> 1, {4,5,6} -> 4."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import lpa_labels

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)],
        "src long, dst long",
    )
    rows = lpa_labels(edges).collect()
    assert all(r.converged for r in rows)
    got = {r.node: r.community for r in rows}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}
    sizes = {r.node: r.community_size for r in rows}
    assert all(s == 3 for s in sizes.values())


def test_lpa_clique_converges_to_min_label(spark):
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import lpa_labels

    edges = spark.createDataFrame(
        [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)],
        "src long, dst long",
    )
    rows = lpa_labels(edges).collect()
    assert {r.node: r.community for r in rows} == {n: 10 for n in (10, 11, 12, 13)}
    assert all(r.converged and r.community_size == 4 for r in rows)


def test_bfs_hops_path_and_unreached(spark):
    """Path 1-2-3-4-5-6 seeded at 1: hops = position; node 6 is 5 hops
    out — beyond the 4-round radius, so absent. Disconnected pair
    {10,11} never appears."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, seeds).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_multi_seed_takes_min_distance(spark):
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (5,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, seeds).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


def test_contamination_radius_seeds_are_flagged_docs(spark, sf_dir):
    """Every hop-0 row is a decontaminate-flagged doc, and every other
    row is strictly within the round cap."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import (
        _BFS_ROUNDS,
        _RADIUS_W,
        contamination_radius,
    )
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import decontaminate

    rows = contamination_radius(spark, sf_dir).collect()
    assert rows
    flagged = {
        r.doc_id for r in decontaminate(spark, sf_dir, w=_RADIUS_W).collect()
    }
    for r in rows:
        assert 0 <= r.hops <= _BFS_ROUNDS
        if r.hops == 0:
            assert r.doc_id in flagged


def test_cluster_rep_is_max_quality_member(spark, sf_dir):
    """The representative of every cluster is a member with maximal
    quality; ties break to the smallest doc_id (the total-order pick
    cluster_rep_sample documents)."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import (
        cluster_rep_sample,
        dedup_clusters,
    )
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import quality_score

    reps = cluster_rep_sample(spark, sf_dir).collect()
    assert reps
    members: dict[int, list[int]] = {}
    for r in dedup_clusters(spark, sf_dir).collect():
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    quality = {r.doc_id: r.quality for r in quality_score(spark, sf_dir).collect()}
    assert len(reps) == len(members)
    for r in reps:
        docs = members[r.cluster_id]
        best_q = max(quality[d] for d in docs)
        assert r.rep_quality == best_q
        assert r.rep_doc_id == min(d for d in docs if quality[d] == best_q)
        assert r.cluster_size == len(docs)


def test_dedup_decision_log_cascade_invariants(spark, sf_dir):
    """The decision log must agree row-for-row with the tiers it
    composes, and kept_by pointers must land on non-exact-dropped docs
    (one-hop audit convention)."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import dedup_decision_log

    log = {r.doc_id: r for r in dedup_decision_log(spark, sf_dir).collect()}
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    keeper_of = {
        r.doc_id: r.keeper
        for r in docs.select(
            "doc_id",
            F.min("doc_id").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(F.md5("text"))
            ).alias("keeper"),
        ).collect()
    }
    cluster_of = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_dir).collect()}
    assert set(log) == set(keeper_of)
    for doc, r in log.items():
        if keeper_of[doc] != doc:
            assert r.status == "drop_exact" and r.kept_by == keeper_of[doc]
        elif cluster_of.get(doc, doc) != doc:
            assert r.status == "drop_near_dup" and r.kept_by == cluster_of[doc]
        else:
            assert r.status == "keep" and r.kept_by is None
        if r.kept_by is not None:
            assert log[r.kept_by].status != "drop_exact"
