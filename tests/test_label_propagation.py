"""Label propagation (operators/graph.label_propagation) against an
independent synchronous Python model, plus the community-vs-component
separation property."""

from __future__ import annotations

import random
from collections import Counter, defaultdict


def _py_lpa(edges: list[tuple[int, int]], n_iter: int) -> dict[int, int]:
    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    labels = {v: v for v in nbrs}
    for _ in range(n_iter):
        new = {}
        for v in nbrs:
            cnt = Counter(labels[u] for u in nbrs[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def test_label_propagation_matches_python_model(spark):
    from pimdb_spark.operators.graph import label_propagation

    rng = random.Random(17)
    edges = list(
        {
            (a, b)
            for a, b in (
                sorted((rng.randint(0, 60), rng.randint(0, 60)))
                for _ in range(250)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(edges, ["src", "dst"])
    for n_iter in (1, 2, 3):
        got = {
            r.node: r.label
            for r in label_propagation(df, n_iter=n_iter).collect()
        }
        assert got == _py_lpa(edges, n_iter)


def test_label_propagation_separates_bridged_cliques(spark):
    from pimdb_spark.operators.curation import connected_components
    from pimdb_spark.operators.graph import label_propagation

    # two 6-cliques joined by ONE bridge edge: a single component, but
    # two LPA communities — the property that distinguishes the operators
    c1 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    c2 = [(a, b) for a in range(10, 16) for b in range(a + 1, 16) if a >= 10]
    edges = c1 + c2 + [(5, 10)]
    df = spark.createDataFrame(edges, ["src", "dst"])

    lpa = {
        r.node: r.label for r in label_propagation(df, n_iter=3).collect()
    }
    left = {lpa[v] for v in range(6)}
    right = {lpa[v] for v in range(10, 16)}
    assert len(left) == 1 and len(right) == 1
    assert left != right

    comp = connected_components(df, src="src", dst="dst")
    comp_ids = {r[1] for r in comp.collect()}
    assert len(comp_ids) == 1  # components would have merged them
