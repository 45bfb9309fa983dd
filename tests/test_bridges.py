"""Bridge detection (bounded-component Tarjan kernel): checked against an
independent brute-force reference (delete each edge, BFS-test whether its
endpoints stay connected) on random graphs, plus known shapes and the
simple-graph semantics contract."""

import random


def _brute_bridges(edges):
    def connected(es, u, v):
        adj = {}
        for x, y in es:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        seen, stack = {u}, [u]
        while stack:
            n = stack.pop()
            for m in adj.get(n, ()):
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        return v in seen

    return {
        tuple(sorted(e))
        for e in edges
        if not connected([x for x in edges if x != e], e[0], e[1])
    }


def test_bridges_known_shapes(spark):
    from ontoweaver_spark.graphstats import bridges_local

    # cycle (no bridges) + a tree hanging off it (every tree edge a bridge)
    edges = [(0, f"c{i}", f"c{(i + 1) % 5}") for i in range(5)] + [
        (0, "c0", "t1"), (0, "t1", "t2"), (0, "t1", "t3"),
    ]
    e = spark.createDataFrame(edges, "blk int, src string, dst string")
    got = {(r["src"], r["dst"]) for r in bridges_local(e, "blk").collect()}
    assert got == {("c0", "t1"), ("t1", "t2"), ("t1", "t3")}


def test_bridges_match_bruteforce_random(spark):
    from ontoweaver_spark.graphstats import bridges_local

    random.seed(11)
    rows, want = [], set()
    for blk in range(6):
        n = random.randint(4, 14)
        nodes = [f"b{blk}x{i}" for i in range(n)]
        edges = set()
        for i in range(1, n):
            edges.add(tuple(sorted((nodes[i], nodes[random.randrange(i)]))))
        target = random.randint(n - 1, n + 6)
        while len(edges) < target:
            a, b = random.sample(nodes, 2)
            edges.add(tuple(sorted((a, b))))
        rows += [(blk, a, b) for a, b in edges]
        want |= _brute_bridges(sorted(edges))
    e = spark.createDataFrame(rows, "blk int, src string, dst string")
    got = {(r["src"], r["dst"]) for r in bridges_local(e, "blk").collect()}
    assert got == want


def _brute_cuts(edges):
    nodes = set()
    for a, b in edges:
        nodes |= {a, b}

    def ncomp(es, nds):
        adj = {n: set() for n in nds}
        for x, y in es:
            if x in adj and y in adj:
                adj[x].add(y)
                adj[y].add(x)
        seen, c = set(), 0
        for n in nds:
            if n not in seen:
                c += 1
                stack = [n]
                seen.add(n)
                while stack:
                    k = stack.pop()
                    for m in adj[k]:
                        if m not in seen:
                            seen.add(m)
                            stack.append(m)
        return c

    base = ncomp(edges, nodes)
    return {
        n
        for n in nodes
        if len(nodes) > 1
        and ncomp([e for e in edges if n not in e], nodes - {n}) >= base + 1
    }


def test_cutpoints_known_shapes(spark):
    from ontoweaver_spark.graphstats import articulation_points_local

    # cycle (no cuts) + tree off c0: c0 and t1 are cut vertices
    edges = [(0, f"c{i}", f"c{(i + 1) % 5}") for i in range(5)] + [
        (0, "c0", "t1"), (0, "t1", "t2"), (0, "t1", "t3"),
    ]
    e = spark.createDataFrame(edges, "blk int, src string, dst string")
    got = {r["node"] for r in articulation_points_local(e, "blk").collect()}
    assert got == {"c0", "t1"}


def test_cutpoints_match_bruteforce_random(spark):
    from ontoweaver_spark.graphstats import articulation_points_local

    random.seed(7)
    rows, want = [], set()
    for blk in range(6):
        n = random.randint(4, 14)
        nodes = [f"b{blk}x{i}" for i in range(n)]
        edges = set()
        for i in range(1, n):
            edges.add(tuple(sorted((nodes[i], nodes[random.randrange(i)]))))
        target = random.randint(n - 1, n + 6)
        while len(edges) < target:
            a, b = random.sample(nodes, 2)
            edges.add(tuple(sorted((a, b))))
        rows += [(blk, a, b) for a, b in edges]
        want |= _brute_cuts(sorted(edges))
    e = spark.createDataFrame(rows, "blk int, src string, dst string")
    got = {r["node"] for r in articulation_points_local(e, "blk").collect()}
    assert got == want


def test_bridges_simple_graph_semantics(spark):
    """Duplicate rows and reverse orientations collapse to ONE undirected
    edge (the documented contract) — a path given twice in both
    directions still reports its edges as bridges."""
    from ontoweaver_spark.graphstats import bridges_local

    rows = [
        (0, "a", "b"), (0, "b", "a"), (0, "a", "b"),
        (0, "b", "c"), (0, "c", "b"),
        (0, "d", "d"),  # self loop: ignored
    ]
    e = spark.createDataFrame(rows, "blk int, src string, dst string")
    got = {(r["src"], r["dst"]) for r in bridges_local(e, "blk").collect()}
    assert got == {("a", "b"), ("b", "c")}


def _brute_tecc(edges):
    """Independent reference: remove brute-force bridges, BFS-label."""
    bridges = _brute_bridges(sorted(edges))
    nodes = sorted({n for e in edges for n in e})
    adj = {}
    for x, y in edges:
        if tuple(sorted((x, y))) in bridges:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    lab = {}
    for start in nodes:
        if start in lab:
            continue
        comp, stack = {start}, [start]
        while stack:
            n = stack.pop()
            for m in adj.get(n, ()):
                if m not in comp:
                    comp.add(m)
                    stack.append(m)
        m = min(comp)
        for n in comp:
            lab[n] = m
    return set(lab.items())


def test_two_edge_components_known_shapes(spark):
    from ontoweaver_spark.graphstats import two_edge_components_local

    # two triangles joined by a bridge: each triangle is one 2ecc
    edges = [
        (0, "a1", "a2"), (0, "a2", "a3"), (0, "a3", "a1"),
        (0, "b1", "b2"), (0, "b2", "b3"), (0, "b3", "b1"),
        (0, "a1", "b1"),
    ]
    e = spark.createDataFrame(edges, "blk int, src string, dst string")
    got = {(r["node"], r["tecc"]) for r in two_edge_components_local(e, "blk").collect()}
    assert got == {
        ("a1", "a1"), ("a2", "a1"), ("a3", "a1"),
        ("b1", "b1"), ("b2", "b1"), ("b3", "b1"),
    }


def test_two_edge_components_match_bruteforce_random(spark):
    from ontoweaver_spark.graphstats import two_edge_components_local

    random.seed(23)
    rows, want = [], set()
    for blk in range(6):
        n = random.randint(4, 14)
        nodes = [f"b{blk}x{i}" for i in range(n)]
        edges = set()
        for i in range(1, n):
            edges.add(tuple(sorted((nodes[i], nodes[random.randrange(i)]))))
        target = random.randint(n - 1, n + 6)
        while len(edges) < target:
            a, b = random.sample(nodes, 2)
            edges.add(tuple(sorted((a, b))))
        rows += [(blk, a, b) for a, b in edges]
        want |= _brute_tecc(sorted(edges))
    e = spark.createDataFrame(rows, "blk int, src string, dst string")
    got = {
        (r["node"], r["tecc"])
        for r in two_edge_components_local(e, "blk").collect()
    }
    assert got == want
