"""Graph instance generators for QAOA benchmarks (reference ``applications/graphdata.py``)."""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import numpy as np

__all__ = ["regular_graph_generator", "erdos_graph_generator", "all_nodes_covered", "graph1"]


def regular_graph_generator(d: int = 3, n: int = 8, weights: bool = False, seed: Optional[int] = None) -> Iterator[Any]:
    import networkx as nx

    rng = np.random.default_rng(seed)
    while True:
        g = nx.random_regular_graph(d, n, seed=int(rng.integers(1 << 31)))
        for a, b in g.edges:
            g[a][b]["weight"] = float(rng.uniform()) if weights else 1.0
        for v in g.nodes:
            g.nodes[v]["weight"] = 0.0
        yield g


def erdos_graph_generator(n: int = 8, p: float = 0.3, weights: bool = False, seed: Optional[int] = None) -> Iterator[Any]:
    import networkx as nx

    rng = np.random.default_rng(seed)
    while True:
        g = nx.erdos_renyi_graph(n, p, seed=int(rng.integers(1 << 31)))
        for a, b in g.edges:
            g[a][b]["weight"] = float(rng.uniform()) if weights else 1.0
        for v in g.nodes:
            g.nodes[v]["weight"] = 0.0
        yield g


def all_nodes_covered(g: Any) -> bool:
    return all(deg > 0 for _, deg in g.degree)


def graph1() -> Any:
    """A fixed 8-node 3-regular benchmark instance."""
    import networkx as nx

    g = nx.random_regular_graph(3, 8, seed=42)
    for a, b in g.edges:
        g[a][b]["weight"] = 1.0
    for v in g.nodes:
        g.nodes[v]["weight"] = 0.0
    return g
