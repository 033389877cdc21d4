from gunrock_spark.graph.edge_table import EdgeTable

__all__ = ["EdgeTable"]
