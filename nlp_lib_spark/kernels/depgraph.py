"""Dependency-graph edge list with O(V+E) lookups.

Functional re-expression of ``ling/SimpleDepGraph.java`` (which stores a
flat edge list and does a linear scan per query — its own ``TODO`` at
java:35 — and BFS over an adjacency *matrix*, java:196-242). We index
adjacency once per sentence and run dict-of-lists BFS; same results,
linear cost, which matters because these kernels run per candidate pair
at 10^12-turn scale.

Edge = (reln, gov, dep) with 0-based token indices.
Path labels follow the reference convention: traversing an edge from gov
to dep contributes ``reln``; the reverse direction contributes ``-reln``
(java:205-207).
"""

from __future__ import annotations

import re
from collections import deque

Edge = tuple[str, int, int]  # (reln, gov, dep)

_PAT_CACHE: dict[str, "re.Pattern[str]"] = {}


def _pat(pattern: str) -> "re.Pattern[str]":
    p = _PAT_CACHE.get(pattern)
    if p is None:
        p = re.compile(pattern)
        _PAT_CACHE[pattern] = p
    return p


class DepGraph:
    __slots__ = ("edges", "_by_gov", "_by_dep", "_adj", "_prevs")

    def __init__(self, edges: list[Edge]):
        self.edges = list(edges)
        self._by_gov: dict[int, list[Edge]] = {}
        self._by_dep: dict[int, list[Edge]] = {}
        self._adj: dict[int, list[tuple[int, str]]] = {}
        for e in self.edges:
            reln, gov, dep = e
            self._by_gov.setdefault(gov, []).append(e)
            self._by_dep.setdefault(dep, []).append(e)
            self._adj.setdefault(gov, []).append((dep, reln))
            self._adj.setdefault(dep, []).append((gov, "-" + reln))
        # sort adjacency once (deterministic BFS tie-break) instead of per
        # BFS visit — the rules call path BFS per candidate pair, and the
        # per-visit sorted() dominated the hot-path profile
        for lst in self._adj.values():
            lst.sort()
        # per-source BFS predecessor-map memo: one BFS serves every
        # destination, so the O(pairs) path queries of rules 1/2/3 and
        # the feature pipes cost O(sources) BFS runs per sentence (the
        # reference reruns an adjacency-matrix BFS per query — SURVEY §4
        # flags this as the dominant redundant recompute)
        self._prevs: dict[int, dict[int, tuple[int, str]]] = {}

    # ---- edge selections (SimpleDepGraph.java:244-317) ----
    def gov_edges(self, gov: int, pattern: str | None = None) -> list[Edge]:
        es = self._by_gov.get(gov, [])
        if pattern is None:
            return es
        p = _pat(pattern)
        return [e for e in es if p.fullmatch(e[0])]

    def dep_edges(self, dep: int, pattern: str | None = None) -> list[Edge]:
        es = self._by_dep.get(dep, [])
        if pattern is None:
            return es
        p = _pat(pattern)
        return [e for e in es if p.fullmatch(e[0])]

    def edges_matching(self, pattern: str) -> list[Edge]:
        p = _pat(pattern)
        return [e for e in self.edges if p.fullmatch(e[0])]

    def dependents(self, gov: int) -> list[int]:
        return [e[2] for e in self._by_gov.get(gov, [])]

    def parent(self, dep: int) -> int:
        es = self._by_dep.get(dep, [])
        return es[0][1] if es else -1

    # ---- shortest path (SimpleDepGraph.java:190-242 / getPathAsList) ----
    def _prev_map(self, src: int) -> dict[int, tuple[int, str]]:
        """Full undirected BFS from ``src`` (memoized).  Exploring to
        exhaustion instead of early-breaking at one destination yields
        byte-identical per-destination paths (earlier prev assignments
        are unaffected) while serving every destination from one run."""
        pm = self._prevs.get(src)
        if pm is None:
            pm = {src: (-1, "")}
            q = deque([src])
            while q:
                v = q.popleft()
                for (nxt, lab) in self._adj.get(v, ()):
                    if nxt not in pm:
                        pm[nxt] = (v, lab)
                        q.append(nxt)
            self._prevs[src] = pm
        return pm

    def path_labels(self, src: int, dst: int) -> list[str] | None:
        """Undirected BFS shortest path src->dst; edge-label list with
        ``-`` prefix for edges traversed dep->gov. None when disconnected."""
        if src == dst:
            return []
        pm = self._prev_map(src)
        if dst not in pm:
            return None
        labels: list[str] = []
        v = dst
        while v != src:
            p, lab = pm[v]
            labels.append(lab)
            v = p
        labels.reverse()
        return labels

    def lcs(self, a: int, b: int) -> int:
        """Least common subsumer of two tokens by root-paths, cycle-guarded
        (SimpleDepGraph.java:639-670). -1 when no common ancestor."""

        def root_path(x: int) -> list[int]:
            out = [x]
            seen = {x}
            cur = x
            while True:
                p = self.parent(cur)
                if p == -1 or p in seen:
                    break
                out.append(p)
                seen.add(p)
                cur = p
            return out

        pa = root_path(a)
        pb_set = {}
        for k, n in enumerate(root_path(b)):
            pb_set[n] = k
        for n in pa:
            if n in pb_set:
                return n
        return -1

    def path_edges(self, src: int, dst: int,
                   directed: bool = False) -> list[Edge] | None:
        """Edges along the BFS shortest path (getPathAsRelnList,
        SimpleDepGraph.java:483-546).  ``directed=True`` walks gov->dep
        edges only; neighbor expansion is ascending-node-index, matching
        the reference's ``for i in 0..size`` adjacency-matrix sweep."""
        if src == dst:
            return []
        if directed:
            prev: dict[int, tuple[int, str]] = {src: (-1, "")}
            q = deque([src])
            while q:
                v = q.popleft()
                if v == dst:
                    break
                nbrs = sorted((e[2], e[0]) for e in self._by_gov.get(v, []))
                for (nxt, lab) in nbrs:
                    if nxt not in prev:
                        prev[nxt] = (v, lab)
                        q.append(nxt)
        else:
            prev = self._prev_map(src)  # shared memoized BFS
        if dst not in prev:
            return None
        out: list[Edge] = []
        v = dst
        while v != src:
            p, lab = prev[v]
            if lab.startswith("-"):
                out.append((lab[1:], v, p))
            else:
                out.append((lab, p, v))
            v = p
        out.reverse()
        return out

    # ---- bounded reachability (SimpleDepGraph.java:319-418) ----
    def reachable(self, src: int, directed: bool, max_dist: int,
                  skip_pattern: str | None = None) -> set[int]:
        """Nodes reachable from ``src`` within ``max_dist`` hops.

        ``skip_pattern`` EXCLUDES matching edges from the graph before
        the walk — the reference's 4-arg getReachableIndices drops any
        edge whose reln matches the filter (SimpleDepGraph.java:387:
        ``if (sd.reln().matches(relnFilter)) continue``), it does not
        restrict traversal to matching edges.  The source node itself is
        not returned (the reference includes it; callers needing it add
        ``| {src}``)."""
        p = _pat(skip_pattern) if skip_pattern is not None else None
        seen = {src}
        q = deque([(src, 0)])
        while q:
            v, d = q.popleft()
            if d == max_dist:
                continue
            if directed:
                nbrs = [(e[2], e[0]) for e in self._by_gov.get(v, [])]
            else:
                nbrs = self._adj.get(v, [])
            for nxt, lab in nbrs:
                if p is not None and p.fullmatch(lab.lstrip("-")):
                    continue
                if nxt not in seen:
                    seen.add(nxt)
                    q.append((nxt, d + 1))
        seen.discard(src)
        return seen
