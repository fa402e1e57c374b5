from muchsalsa_tpu.graph.graph import (
    DiGraph,
    Edge,
    EdgeOrder,
    Graph,
    VertexInfo,
    Direction,
    shortest_path,
)

__all__ = [
    "DiGraph",
    "Edge",
    "EdgeOrder",
    "Graph",
    "VertexInfo",
    "Direction",
    "shortest_path",
]
