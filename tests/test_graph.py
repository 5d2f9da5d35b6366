"""PageRank: hand-computed references, dangling mass, invariants."""

from __future__ import annotations

import math

import pytest

from temporal_retriever_spark.graph import pagerank


def _pagerank_ref(edges, d=0.85, iters=10):
    """Driver-side power iteration with uniform dangling fold-back."""
    e = {(s, t) for s, t in edges if s != t}
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    n = len(nodes)
    out = {}
    for s, t in e:
        out.setdefault(s, []).append(t)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in out)
        nxt = {v: (1 - d) / n + d * dang / n for v in nodes}
        for s, ts in out.items():
            share = r[s] / len(ts)
            for t in ts:
                nxt[t] += d * share
        r = nxt
    return r


class TestPageRank:
    def test_matches_reference_with_dangling(self, spark):
        # C is dangling; A is the hub
        edges = [("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("d", "a")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["rank"] for r in pagerank(df, iterations=12).collect()}
        ref = _pagerank_ref(edges, iters=12)
        assert set(got) == set(ref)
        for v in ref:
            assert math.isclose(got[v], ref[v], rel_tol=1e-9), v
        assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)

    def test_cycle_is_uniform(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "a")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
        for v in got.values():
            assert math.isclose(v, 1 / 3, rel_tol=1e-12)

    def test_authority_ordering(self, spark):
        # everyone links to 'hub'; hub links back to one node
        edges = [(f"u{i}", "hub") for i in range(5)] + [("hub", "u0")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["rank"] for r in pagerank(df, iterations=20).collect()}
        assert got["hub"] == max(got.values())
        assert got["u0"] > got["u1"]  # gets the hub's mass

    def test_parallel_edges_and_self_loops_collapsed(self, spark):
        edges = [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["rank"] for r in pagerank(df, iterations=15).collect()}
        ref = _pagerank_ref([("a", "b"), ("b", "a")], iters=15)
        for v in ref:
            assert math.isclose(got[v], ref[v], rel_tol=1e-9)

    def test_validation_and_empty(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping=1.0)
        with pytest.raises(ValueError, match="iterations"):
            pagerank(df, iterations=0)
        empty = spark.createDataFrame([], "src string, dst string")
        assert pagerank(empty).count() == 0


def _hits_ref(edges, iters=10):
    """Driver-side HITS mirroring the engine's update order exactly."""
    e = {(s, t) for s, t in edges if s != t}
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    h = {v: 1.0 for v in nodes}
    a = {v: 1.0 for v in nodes}
    for _ in range(iters):
        a = {v: sum(h[s] for s, t in e if t == v) for v in nodes}
        an = math.sqrt(sum(x * x for x in a.values())) or 1.0
        h = {v: sum(a[t] for s, t in e if s == v) / an for v in nodes}
        a = {v: a[v] / an for v in nodes}
        hn = math.sqrt(sum(x * x for x in h.values())) or 1.0
        h = {v: h[v] / hn for v in nodes}
    return h, a


class TestHits:
    def test_matches_reference(self, spark):
        from temporal_retriever_spark.graph import hits

        edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"), ("c", "a")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: (r["hub"], r["authority"]) for r in hits(df, iterations=8).collect()}
        h, a = _hits_ref(edges, iters=8)
        assert set(got) == set(h)
        for v in h:
            assert math.isclose(got[v][0], h[v], rel_tol=1e-9), ("hub", v)
            assert math.isclose(got[v][1], a[v], rel_tol=1e-9), ("auth", v)

    def test_unit_norms_and_ordering(self, spark):
        from temporal_retriever_spark.graph import hits

        # u0..u4 all point at 'sink'; 'hub0' points at everything
        edges = [(f"u{i}", "sink") for i in range(5)] + [
            ("hub0", f"u{i}") for i in range(5)
        ] + [("hub0", "sink")]
        df = spark.createDataFrame(edges, "src string, dst string")
        rows = hits(df, iterations=15).collect()
        hub = {r["node"]: r["hub"] for r in rows}
        auth = {r["node"]: r["authority"] for r in rows}
        assert math.isclose(sum(x * x for x in hub.values()), 1.0, rel_tol=1e-9)
        assert math.isclose(sum(x * x for x in auth.values()), 1.0, rel_tol=1e-9)
        assert auth["sink"] == max(auth.values())
        assert hub["hub0"] == max(hub.values())

    def test_validation_and_empty(self, spark):
        from temporal_retriever_spark.graph import hits

        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError, match="iterations"):
            hits(df, iterations=0)
        empty = spark.createDataFrame([], "src string, dst string")
        assert hits(empty).count() == 0


class TestConnectedComponents:
    def test_components_and_min_labels(self, spark):
        from temporal_retriever_spark.graph import connected_components

        edges = [(1, 2), (2, 3), (10, 11), (20, 20)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}

    def test_label_method_agrees(self, spark):
        from temporal_retriever_spark.graph import connected_components

        edges = [(i, i + 1) for i in range(8)] + [(100, 101)]
        df = spark.createDataFrame(edges, "src long, dst long")
        star = sorted(connected_components(df, method="star").collect())
        label = sorted(connected_components(df, method="label").collect())
        assert star == label


def _triangles_ref(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = {v: 0 for v in adj}
    for a, b in und:
        for c in adj[a] & adj[b]:
            count[c] += 0  # counted via the corner loop below
    for v in adj:
        ns = sorted(adj[v])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if tuple(sorted((ns[i], ns[j]))) in und:
                    count[v] += 1
    return count


class TestTriangleCount:
    def test_complete_graph(self, spark):
        from temporal_retriever_spark.graph import triangle_count

        edges = [(a, b) for a in range(4) for b in range(4) if a < b]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_path_and_star_are_triangle_free(self, spark):
        from temporal_retriever_spark.graph import triangle_count

        path = [(i, i + 1) for i in range(5)]
        star = [(0, i) for i in range(1, 6)]
        for edges in (path, star):
            df = spark.createDataFrame(edges, "src long, dst long")
            got = triangle_count(df).collect()
            assert all(r["triangles"] == 0 for r in got)
            assert len(got) == len({v for e in edges for v in e})

    def test_matches_reference_on_mixed_graph(self, spark):
        from temporal_retriever_spark.graph import triangle_count

        # deterministic pseudo-random graph + duplicate/self edges
        edges = [((i * 7) % 11, (i * 5 + 3) % 11) for i in range(40)]
        edges += [(2, 2), (3, 4), (4, 3)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
        assert got == _triangles_ref(edges)


class TestShortestPaths:
    def test_path_graph_distances(self, spark):
        from temporal_retriever_spark.graph import shortest_paths

        edges = [(i, i + 1) for i in range(5)]  # 0-1-2-3-4-5
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            (r["node"], r["landmark"]): r["distance"]
            for r in shortest_paths(df, [0, 5]).collect()
        }
        for v in range(6):
            assert got[(v, 0)] == v
            assert got[(v, 5)] == 5 - v

    def test_directed_vs_undirected(self, spark):
        from temporal_retriever_spark.graph import shortest_paths

        edges = [(1, 2), (2, 3)]
        df = spark.createDataFrame(edges, "src long, dst long")
        und = {
            (r["node"], r["landmark"]): r["distance"]
            for r in shortest_paths(df, [3]).collect()
        }
        assert und[(1, 3)] == 2
        dire = {
            (r["node"], r["landmark"]): r["distance"]
            for r in shortest_paths(df, [3], directed=True).collect()
        }
        # with only forward edges, nothing reaches landmark 3
        assert (1, 3) not in dire and (2, 3) not in dire
        assert dire[(3, 3)] == 0

    def test_unreachable_components_absent(self, spark):
        from temporal_retriever_spark.graph import shortest_paths

        edges = [(1, 2), (10, 11)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = shortest_paths(df, [1]).collect()
        nodes = {r["node"] for r in got}
        assert nodes == {1, 2}

    def test_validation(self, spark):
        from temporal_retriever_spark.graph import shortest_paths

        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="landmarks"):
            shortest_paths(df, [])
        with pytest.raises(ValueError, match="max_iterations"):
            shortest_paths(df, [1], max_iterations=0)


from temporal_retriever_spark.graph import label_propagation


class TestLabelPropagation:
    def test_planted_cliques_recovered(self, spark):
        # two 5-cliques joined by one bridge edge
        c1 = [(a, b) for a in range(5) for b in range(5) if a < b]
        c2 = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
        edges = spark.createDataFrame(
            c1 + c2 + [(4, 10)], "src long, dst long"
        )
        got = {
            r["node"]: r["community"]
            for r in label_propagation(edges, iterations=5).collect()
        }
        lab1 = {got[n] for n in range(5)}
        lab2 = {got[n] for n in range(10, 15)}
        assert len(lab1) == 1 and len(lab2) == 1
        assert lab1 != lab2

    def test_two_node_oscillation_broken(self, spark):
        # pure synchronous LPA flips labels forever on a single edge;
        # the self-vote pins both to the max id immediately
        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        for iters in (1, 2, 3, 4):
            got = {
                r["node"]: r["community"]
                for r in label_propagation(edges, iterations=iters).collect()
            }
            assert got == {1: 2, 2: 2}

    def test_direction_invariant(self, spark):
        e1 = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "src long, dst long"
        )
        e2 = spark.createDataFrame(
            [(2, 1), (3, 2), (1, 3)], "src long, dst long"
        )
        a = sorted(map(tuple, label_propagation(e1, iterations=3).collect()))
        b = sorted(map(tuple, label_propagation(e2, iterations=3).collect()))
        assert a == b
        # a triangle collapses to its max id
        assert a == [(1, 3), (2, 3), (3, 3)]

    def test_string_ids_and_validation(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string"
        )
        got = {
            r["node"]: r["community"]
            for r in label_propagation(edges, iterations=4).collect()
        }
        assert set(got) == {"a", "b", "c"}
        assert len(set(got.values())) == 1
        import pytest as _pt

        with _pt.raises(ValueError):
            label_propagation(edges, iterations=0)


from temporal_retriever_spark.graph import k_core


class TestKCore:
    def test_peels_periphery(self, spark):
        # 4-clique core with pendant chains hanging off
        clique = [(a, b) for a in range(4) for b in range(4) if a < b]
        tails = [(0, 10), (10, 11), (1, 20)]
        edges = spark.createDataFrame(clique + tails, "src long, dst long")
        got = {r["node"]: r["core_degree"] for r in k_core(edges, k=3).collect()}
        assert set(got) == {0, 1, 2, 3}
        assert all(d == 3 for d in got.values())

    def test_cascade_peeling(self, spark):
        # a path graph has no 2-core: removing leaves cascades to empty
        path = [(i, i + 1) for i in range(10)]
        edges = spark.createDataFrame(path, "src long, dst long")
        assert k_core(edges, k=2).count() == 0
        # a cycle IS its own 2-core
        cycle = path + [(10, 0)]
        got = k_core(spark.createDataFrame(cycle, "src long, dst long"), k=2)
        assert got.count() == 11

    def test_k1_keeps_every_edge_touching_node(self, spark):
        edges = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
        assert k_core(edges, k=1).count() == 4
        import pytest as _pt

        with _pt.raises(ValueError):
            k_core(edges, k=0)
