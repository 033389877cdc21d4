from gunrock_spark.algorithms.pagerank import (
    pagerank,
    ranked,
    spam_mass,
    trustrank,
    weighted_pagerank,
)
from gunrock_spark.algorithms.components import (
    component_sizes,
    connected_components,
    giant_component,
    giant_component_summary,
    induced_subgraph,
)
from gunrock_spark.algorithms.landmarks import estimate_distances, landmark_distances
from gunrock_spark.algorithms.label_propagation import (
    label_propagation,
    seeded_label_propagation,
)
from gunrock_spark.algorithms.triangles import (
    triangle_count,
    triangle_count_df,
    triangle_count_per_vertex,
)
from gunrock_spark.algorithms.absorption import absorption_probability
from gunrock_spark.algorithms.ppr import ppr_push, ppr_scores, sweep_cut
from gunrock_spark.algorithms.bfs import bfs
from gunrock_spark.algorithms.sssp import distances, sssp
from gunrock_spark.algorithms.bc import bc_single_source, betweenness_centrality
from gunrock_spark.algorithms.hits import hits
from gunrock_spark.algorithms.salsa import salsa
from gunrock_spark.algorithms.wtf import who_to_follow
from gunrock_spark.algorithms.kcore import (
    core_numbers,
    k_core,
    k_core_vertices,
    onion_decomposition,
    onion_layers,
)
from gunrock_spark.algorithms.ktruss import k_truss
from gunrock_spark.algorithms.mis import maximal_independent_set
from gunrock_spark.algorithms.matching import maximal_matching
from gunrock_spark.algorithms.katz import eigenvector_centrality, katz_centrality
from gunrock_spark.algorithms.topk import degree_topk
from gunrock_spark.algorithms.louvain import louvain, louvain_communities
from gunrock_spark.algorithms.densest import DensestResult, densest_subgraph
from gunrock_spark.algorithms.modularity import conductance, modularity
from gunrock_spark.algorithms.motifs import (
    square_count,
    square_count_df,
    squares_per_vertex,
)
from gunrock_spark.algorithms.dag import dag_levels
from gunrock_spark.algorithms.spectral import spectral_bisection
from gunrock_spark.algorithms.walks import (
    khop_neighbor_sample,
    negative_samples,
    random_walks,
)
from gunrock_spark.algorithms.subgraph_match import (
    subgraph_match,
    subgraph_match_count,
)

__all__ = [
    "pagerank",
    "ppr_push",
    "ppr_scores",
    "sweep_cut",
    "ranked",
    "spam_mass",
    "absorption_probability",
    "trustrank",
    "weighted_pagerank",
    "katz_centrality",
    "eigenvector_centrality",
    "maximal_matching",
    "giant_component",
    "giant_component_summary",
    "induced_subgraph",
    "seeded_label_propagation",
    "connected_components",
    "component_sizes",
    "label_propagation",
    "louvain",
    "louvain_communities",
    "triangle_count",
    "triangle_count_df",
    "triangle_count_per_vertex",
    "bfs",
    "sssp",
    "distances",
    "bc_single_source",
    "betweenness_centrality",
    "hits",
    "salsa",
    "who_to_follow",
    "degree_topk",
    "k_core",
    "k_truss",
    "maximal_independent_set",
    "k_core_vertices",
    "core_numbers",
    "onion_decomposition",
    "onion_layers",
    "negative_samples",
    "random_walks",
    "khop_neighbor_sample",
    "dag_levels",
    "spectral_bisection",
    "conductance",
    "modularity",
    "landmark_distances",
    "estimate_distances",
    "densest_subgraph",
    "DensestResult",
    "square_count",
    "square_count_df",
    "squares_per_vertex",
    "subgraph_match",
    "subgraph_match_count",
]
