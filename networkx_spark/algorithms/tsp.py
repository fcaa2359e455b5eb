"""TSP approximations: greedy nearest-neighbour and Christofides.

Reference ``approximation/traveling_salesman.py``: ``greedy_tsp`` (``:936``)
and ``christofides`` (``:128``), both over a COMPLETE weighted graph.

A tour is a single sequential object — every step depends on the previous
one — so these are capped driver kernels (the CNM/KL/blossom posture),
with the heavy sub-structures delegated to the engine's distributed
pieces where they exist:

* ``christofides`` = MST (distributed Borůvka,
  :func:`~networkx_spark.algorithms.mst.minimum_spanning_edges`) +
  MIN-weight perfect matching on the odd-degree vertices (the exact
  bitmask-DP kernel of :mod:`~networkx_spark.algorithms.matching`, run on
  negated weights — odd-vertex counts beyond the DP cap raise) + an
  Eulerian circuit + shortcutting, giving the classic 3/2 bound on
  metric instances.
* ``greedy_tsp`` replicates the reference's deterministic min-weight
  next-neighbour scan, so tours match the reference exactly on
  distinct-weight instances.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT


def _complete_weights(g: Graph, weight: str, cap: int) -> tuple[list, dict]:
    verts = sorted((r["id"] for r in g.vertices().collect()),
                   key=lambda x: (isinstance(x, str), x))
    n = len(verts)
    if n > cap:
        raise ValueError(f"TSP kernels are capped at {cap} vertices "
                         f"(got {n}): the tour is sequential by definition")
    wcol = (F.col(weight).cast("double") if weight in g.edges.columns
            else F.lit(1.0))
    w: dict[tuple, float] = {}
    for r in g.edges.filter(F.col(SRC) != F.col(DST)) \
                    .select(SRC, DST, wcol.alias("_w")).collect():
        for key in ((r[SRC], r[DST]), (r[DST], r[SRC])):
            w[key] = min(w.get(key, float("inf")), float(r["_w"]))
    if any((u, v) not in w for u in verts for v in verts if u != v):
        raise ValueError("G must be a complete graph. "
                         "(reference NetworkXError)")
    return verts, w


def greedy_tsp(g: Graph, weight: str = WEIGHT, source=None,
               max_vertices: int = 2_000) -> tuple[list, float]:
    """(cycle, weight): nearest-neighbour tour from ``source``
    (``traveling_salesman.py:936``) — next city = min (weight, city)
    among the unvisited, the reference's deterministic scan."""
    verts, w = _complete_weights(g, weight, max_vertices)
    if len(verts) < 2:
        raise ValueError("greedy_tsp needs at least two nodes")
    cur = verts[0] if source is None else source
    if cur not in verts:
        raise KeyError(f"source {source!r} not in graph")
    cycle = [cur]
    left = set(verts) - {cur}
    total = 0.0
    while left:
        nxt = min(left, key=lambda v: (w[(cur, v)], str(v)))
        total += w[(cur, nxt)]
        cycle.append(nxt)
        left.discard(nxt)
        cur = nxt
    total += w[(cur, cycle[0])]
    cycle.append(cycle[0])
    return cycle, total


def christofides(g: Graph, weight: str = WEIGHT,
                 max_vertices: int = 500,
                 max_odd: int = 18) -> tuple[list, float]:
    """(cycle, weight): the 3/2-approximation on a complete metric graph
    (``traveling_salesman.py:128``).  ``max_odd`` caps the exact-matching
    DP over the odd-degree MST vertices (O(2^n))."""
    from networkx_spark.algorithms.matching import max_weight_matching
    from networkx_spark.algorithms.mst import minimum_spanning_edges

    verts, w = _complete_weights(g, weight, max_vertices)
    if len(verts) < 3:
        raise ValueError("christofides needs at least three nodes")
    mst = [(r[SRC], r[DST]) for r in
           minimum_spanning_edges(g).select(SRC, DST).collect()]
    deg: dict = {}
    for u, v in mst:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    odd = sorted((v for v in verts if deg.get(v, 0) % 2),
                 key=lambda x: (isinstance(x, str), x))
    if len(odd) > max_odd:
        raise ValueError(
            f"{len(odd)} odd-degree MST vertices > max_odd={max_odd}: the "
            "exact matching DP is O(2^n) — use greedy_tsp at scale")
    # min-weight PERFECT matching on the odd set = max-weight matching on
    # (C - w) with maxcardinality (C > any weight forces perfection)
    spark = g.edges.sparkSession
    big = max(w[(u, v)] for u in odd for v in odd if u != v) + 1.0 \
        if len(odd) > 1 else 1.0
    neg = [(u, v, big - w[(u, v)])
           for i, u in enumerate(odd) for v in odd[i + 1:]]
    if neg:
        e = spark.createDataFrame(neg, "src string, dst string, weight double") \
            if isinstance(odd[0], str) else \
            spark.createDataFrame(neg, "src long, dst long, weight double")
        m = max_weight_matching(Graph.from_edges(e, directed=False,
                                                 weight="weight",
                                                 combine="max"),
                                maxcardinality=True,
                                max_vertices=max_odd)
    else:
        m = set()

    # multigraph = MST + matching; Hierholzer Eulerian circuit over a
    # multiset adjacency (undirected: both directions decremented per use)
    from collections import Counter

    typ = type(verts[0])

    def _norm(x):
        # the matching kernel returns string ids; map back
        return typ(x) if not isinstance(x, typ) else x

    mult: Counter = Counter()
    nbrs: dict = {v: set() for v in verts}
    for u, v in list(mst) + [(_norm(a), _norm(b)) for a, b in m]:
        mult[(u, v)] += 1
        mult[(v, u)] += 1
        nbrs[u].add(v)
        nbrs[v].add(u)
    order = {v: sorted(nbrs[v], key=lambda x: (isinstance(x, str), x))
             for v in verts}
    start = verts[0]
    stack, circuit = [start], []
    while stack:
        v = stack[-1]
        u = next((u for u in order[v] if mult[(v, u)] > 0), None)
        if u is None:
            circuit.append(stack.pop())
        else:
            mult[(v, u)] -= 1
            mult[(u, v)] -= 1
            stack.append(u)
    # shortcutting: first visit only
    seen = set()
    cycle = []
    for v in circuit:
        if v not in seen:
            seen.add(v)
            cycle.append(v)
    cycle.append(cycle[0])
    total = sum(w[(a, b)] for a, b in zip(cycle, cycle[1:]))
    return cycle, total
