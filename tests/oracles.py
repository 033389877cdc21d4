"""NumPy oracle implementations transcribed from the reference's CPU
reference implementations (SURVEY.md §5). Pure, deterministic, float64.
"""

from __future__ import annotations

import numpy as np


def _vertex_count(edges: list[tuple[int, int]]) -> int:
    return max(max(s, d) for s, d in edges) + 1


def clean_edges(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """The reference's COO->CSR cleaning (gunrock/csr.cuh:588):
    drop self-loops and duplicates."""
    seen, out = set(), []
    for s, d in edges:
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            out.append((s, d))
    return out


def pagerank_ref(
    edges: list[tuple[int, int]],
    n: int | None = None,
    delta: float = 0.85,
    error: float = 0.01,
    max_iteration: int = 50,
    scaled: bool = False,
    compensate: bool = False,
) -> np.ndarray:
    """Port of ReferencePageRank_Normalized (tests/pr/test_pr.cu:368-470)
    with the optional dangling-sink expansion (test_pr.cu:566-618).
    Returns rank per vertex (original vertices only, index = vertex id).
    """
    edges = clean_edges(edges)
    n0 = n or _vertex_count(edges)
    n = n0
    if compensate:
        out_deg0 = np.zeros(n0, dtype=np.int64)
        for s, _ in edges:
            out_deg0[s] += 1
        danglers = np.where(out_deg0 == 0)[0]
        if len(danglers):
            sink = n0
            edges = edges + [(int(v), sink) for v in danglers] + [
                (sink, v) for v in range(n0)
            ]
            n = n0 + 1
    out_deg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        out_deg[s] += 1
    reset = (1.0 - delta) if scaled else (1.0 - delta) / n
    rank = np.full(n, 1.0 if scaled else 1.0 / n, dtype=np.float64)
    iteration = 0
    while True:
        nxt = np.zeros(n, dtype=np.float64)
        for s, d in edges:
            nxt[d] += rank[s] / out_deg[s]
        iteration += 1
        new = reset + delta * nxt
        cont = iteration <= max_iteration and np.any(
            np.abs(new - rank) > error * rank
        )
        rank = new
        if not cont:
            break
    return rank[:n0]


def connected_components_ref(edges: list[tuple[int, int]], n: int | None = None) -> np.ndarray:
    """Min-vertex-id component labels (exact; oracle for the
    reference's Boost connected_components check, tests/cc/test_cc.cu)."""
    n = n or _vertex_count(edges)
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            lo, hi = min(rs, rd), max(rs, rd)
            parent[hi] = lo
    return np.array([find(v) for v in range(n)])


def label_propagation_mode_ref(
    edges: list[tuple[int, int]],
    n: int | None = None,
    max_iter: int = 20,
    initial: np.ndarray | None = None,
) -> np.ndarray:
    """Synchronous mode-label LP, ties -> smallest label, over the
    symmetrized cleaned edge set (FIXTURES.md §5)."""
    edges = clean_edges(edges)
    n = n or _vertex_count(edges)
    sym = set()
    for s, d in edges:
        sym.add((s, d))
        sym.add((d, s))
    nbrs: list[list[int]] = [[] for _ in range(n)]
    for s, d in sorted(sym):
        nbrs[s].append(d)
    labels = initial.copy() if initial is not None else np.arange(n)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            if not nbrs[v]:
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if np.array_equal(new, labels):
            labels = new
            break
        labels = new
    return labels


def triangle_count_ref(edges: list[tuple[int, int]], n: int | None = None) -> int:
    """Brute-force exact undirected triangle count (FIXTURES.md §5)."""
    n = n or _vertex_count(edges)
    adj = np.zeros((n, n), dtype=bool)
    for s, d in edges:
        if s != d:
            adj[s, d] = True
            adj[d, s] = True
    count = 0
    for a in range(n):
        for b in range(a + 1, n):
            if adj[a, b]:
                count += int(np.sum(adj[a, b + 1 :] & adj[b, b + 1 :]))
    return count


def triangles_per_vertex_ref(edges: list[tuple[int, int]], n: int | None = None) -> np.ndarray:
    n = n or _vertex_count(edges)
    adj = np.zeros((n, n), dtype=bool)
    for s, d in edges:
        if s != d:
            adj[s, d] = True
            adj[d, s] = True
    out = np.zeros(n, dtype=np.int64)
    for a in range(n):
        for b in range(a + 1, n):
            if adj[a, b]:
                commons = np.where(adj[a] & adj[b])[0]
                for c in commons:
                    if c > b:
                        out[a] += 1
                        out[b] += 1
                        out[c] += 1
    return out


def bfs_ref(
    edges: list[tuple[int, int]], source: int, n: int | None = None
) -> dict[int, tuple[int, int | None]]:
    """BFS depths + deterministic min-parent preds (reference
    semantics tests/bfs/test_bfs.cu ReferenceBFS; pred = MIN parent at
    depth-1, our documented deterministic choice).
    Returns {v: (depth, pred)} for reached vertices."""
    edges = clean_edges(edges)
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    depth = {source: 0}
    pred: dict[int, int | None] = {source: None}
    frontier = [source]
    lvl = 0
    while frontier:
        nxt: dict[int, int] = {}
        for u in frontier:
            for v in out.get(u, []):
                if v not in depth:
                    if v not in nxt or u < nxt[v]:
                        nxt[v] = u
        for v, p in nxt.items():
            depth[v] = lvl + 1
            pred[v] = p
        frontier = sorted(nxt)
        lvl += 1
    return {v: (depth[v], pred[v]) for v in depth}


def sssp_ref(
    edges: list[tuple[int, int, float]], source: int, n: int | None = None
) -> dict[int, float]:
    """Bellman-Ford distances (reference: Boost dijkstra check,
    tests/sssp/test_sssp.cu:41-45). Returns {v: dist} for reached."""
    import heapq

    adj: dict[int, list[tuple[int, float]]] = {}
    seen = set()
    for s, d, w in edges:
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            adj.setdefault(s, []).append((d, w))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def bc_ref(edges: list[tuple[int, int]], source: int, n: int | None = None) -> np.ndarray:
    """Brandes single-source dependency scores (reference:
    gunrock/app/bc/bc_functor.cuh:37-239 semantics)."""
    edges = clean_edges(edges)
    n = n or _vertex_count(edges)
    out: list[list[int]] = [[] for _ in range(n)]
    for s, d in edges:
        out[s].append(d)
    sigma = np.zeros(n)
    depth = np.full(n, -1)
    sigma[source] = 1.0
    depth[source] = 0
    stack_levels = [[source]]
    frontier = [source]
    lvl = 0
    while frontier:
        nxt: list[int] = []
        for u in frontier:
            for v in out[u]:
                if depth[v] == -1:
                    depth[v] = lvl + 1
                    nxt.append(v)
        for u in frontier:
            for v in out[u]:
                if depth[v] == lvl + 1:
                    sigma[v] += sigma[u]
        nxt = sorted(set(nxt))
        if nxt:
            stack_levels.append(nxt)
        frontier = nxt
        lvl += 1
    delta = np.zeros(n)
    for level in reversed(range(len(stack_levels) - 1)):
        for u in stack_levels[level]:
            acc = 0.0
            for v in out[u]:
                if depth[v] == level + 1:
                    acc += (1.0 + delta[v]) / sigma[v]
            delta[u] = sigma[u] * acc
    delta[source] = 0.0
    return delta


def hits_ref(
    edges: list[tuple[int, int]],
    src: int,
    delta: float = 0.85,
    max_iter: int = 20,
    n: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """This fork's HITS (gunrock/app/hits/hits_functor.cuh:91-92,
    165-166; zero init hits_problem.cuh:327-330; swap-only
    'normalize' hits_enactor.cuh:93-113). Returns (hub, auth)."""
    edges = clean_edges(edges)
    n = n or _vertex_count(edges)
    outd = np.zeros(n, dtype=np.int64)
    ind = np.zeros(n, dtype=np.int64)
    for s, d in edges:
        outd[s] += 1
        ind[d] += 1
    hub = np.zeros(n)
    auth = np.zeros(n)
    for _ in range(max_iter):
        nauth = np.zeros(n)
        for s, d in edges:
            nauth[d] += hub[s] / max(outd[s], 1)
        auth = nauth
        nhub = np.zeros(n)
        for s, d in edges:
            nhub[s] += (delta / outd[s] if s == src else 0.0) + (
                1.0 - delta
            ) * auth[d] / ind[d]
        hub = nhub
    return hub, auth


def salsa_ref(
    edges: list[tuple[int, int]], max_iter: int = 20, n: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Reference SALSA (gunrock/app/salsa/salsa_functor.cuh:168-170,
    319-321; init salsa_problem.cuh:366-372). Returns (hub, auth)."""
    edges = clean_edges(edges)
    n = n or _vertex_count(edges)
    outd = np.zeros(n, dtype=np.int64)
    ind = np.zeros(n, dtype=np.int64)
    for s, d in edges:
        outd[s] += 1
        ind[d] += 1
    hub = np.full(n, 1.0 / max(int(np.sum(outd > 0)), 1))
    auth = np.full(n, 1.0 / max(int(np.sum(ind > 0)), 1))
    for _ in range(max_iter):
        t = np.zeros(n)
        for w, v in edges:
            t[v] += hub[w] / outd[w]
        nhub = np.zeros(n)
        for u, v in edges:
            nhub[u] += t[v] / ind[v]
        s_arr = np.zeros(n)
        for u, x in edges:
            s_arr[u] += auth[x] / ind[x]
        nauth = np.zeros(n)
        for u, v in edges:
            nauth[v] += s_arr[u] / outd[u]
        hub, auth = nhub, nauth
    return hub, auth


def wtf_ref(
    edges: list[tuple[int, int]],
    src: int,
    alpha: float = 0.2,
    delta: float = 0.85,
    error: float = 0.01,
    max_iter: int = 50,
    cot_size: int = 1000,
    n: int | None = None,
) -> np.ndarray:
    """WTF refscores (transcribed from ReferenceWTF,
    tests/wtf/test_wtf.cu:178-316, with the personalized PR phase of
    wtf_functor.cuh:91,119). Returns refscore per vertex."""
    edges = clean_edges(edges)
    n = n or _vertex_count(edges)
    outd = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        outd[s] += 1
    # phase 1: personalized PR (our engine's spec: init 1/n, update
    # new = (1-delta)*[v==src] + delta * sum msgs, per-vertex stop)
    rank = np.full(n, 1.0 / n)
    it = 0
    while it < max_iter:
        msgs = np.zeros(n)
        for s, d in edges:
            if outd[s] > 0:
                msgs[d] += rank[s] / outd[s]
        new = delta * msgs
        new[src] += 1.0 - delta
        it += 1
        if not np.any(np.abs(new - rank) > error * rank):
            rank = new
            break
        rank = new
    # phase 2: circle of trust — top-k (rank desc, v asc)
    order = sorted(range(n), key=lambda v: (-rank[v], v))
    cot = order[: min(cot_size, n)]
    cot_set = set(cot)
    # phase 3: reference SALSA relevance loop (test_wtf.cu:245-302)
    cot_indeg = np.zeros(n, dtype=np.int64)
    for s, d in edges:
        if s in cot_set:
            cot_indeg[d] += 1
    r = np.zeros(n)
    r[src] = 1.0 if src in cot_set else 0.0
    refscore = np.zeros(n)
    salsa_iter = int(1.0 / alpha) + 1
    for itr in range(salsa_iter):
        for u in cot:
            for s, d in edges:
                if s == u:
                    refscore[d] += r[u] / (outd[u] if outd[u] > 0 else 1.0)
        for u in cot:
            r[u] = 0.0
        for u in cot:
            acc = alpha if u == src else 0.0
            for s, d in edges:
                if s == u:
                    acc += (1.0 - alpha) * refscore[d] / cot_indeg[d]
            r[u] = acc
        if itr + 1 < salsa_iter:
            for u in cot:
                refscore[u] = 0.0
    return refscore
