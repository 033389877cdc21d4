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
