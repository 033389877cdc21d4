from gunrock_spark.algorithms.pagerank import pagerank
from gunrock_spark.algorithms.components import connected_components
from gunrock_spark.algorithms.label_propagation import label_propagation
from gunrock_spark.algorithms.triangles import triangle_count, triangle_count_per_vertex

__all__ = [
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangle_count_per_vertex",
]
