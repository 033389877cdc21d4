from gunrock_spark.graph.coarsen import contract_by_labels
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.sparsify import sparsify_edges
from gunrock_spark.graph.io import (
    load_edge_table,
    read_ligra_adj,
    read_mtx,
    save_edge_table,
    write_ligra_adj,
    write_mtx,
)

__all__ = [
    "EdgeTable",
    "contract_by_labels",
    "sparsify_edges",
    "read_mtx",
    "read_ligra_adj",
    "write_ligra_adj",
    "write_mtx",
    "save_edge_table",
    "load_edge_table",
]
