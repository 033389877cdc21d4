"""One-shot maintenance script: reorder the ``queries()`` dict literal in
``__spark_entry__.py`` so its first 50 entries hold one representative per
operator family (the driver's CORRECTNESS gate samples exactly that prefix).
All 177 keys are preserved; only the order changes.
"""

import re
import sys

CURATED_FIRST_50 = [
    # -- graph core (SURVEY §2.2 reference primitives) --
    "pagerank_fixed10",       # PageRank family (katz/trustrank/eigenvector later)
    "cc_labels",              # connected components
    "lp_mode3",               # label propagation
    "louvain_k3",             # Louvain
    "change_rate",            # recrawl scheduling (Cho & Garcia-Molina)
    "triangles_blocks",       # triangle counting (CSR-blocks scale path)
    "bfs_depths",             # BFS
    "sssp_dist",              # SSSP / delta-stepping
    "bc_single_source",       # betweenness centrality
    "hits_k5",                # HITS (salsa_k4 later; WTF covers SALSA rounds)
    "wtf_refscores",          # WTF (PPR->CoT->SALSA)
    "edge_clean",             # COO->CSR cleaning contract
    "sm_diamond",             # subgraph matching
    "msf_edges",              # minimum spanning forest
    "mis_labels",             # maximal independent set
    "kcore_k20",              # k-core peeling
    "ktruss_k4_edges",        # k-truss
    "scc_labels",             # strongly connected components / bowtie
    "anf_nf_t4",              # HyperANF / HyperBall
    "spectral_fiedler_i6",    # spectral bisection / partitioner family
    "node2vec_walks_k3",      # sampling / biased walks
    "khop_sample_f3f2",       # GraphSAGE k-hop bounded-fanout sampling
    "ppr_seed_scores",        # personalized PageRank
    # -- crawl / web layer --
    "host_link_rollup",       # host graph rollup
    "redirect_resolve",       # URL canonical / redirect doubling
    "anchor_texts",           # anchor-text extraction
    # -- dedup families --
    "dedup_exact",            # exact hash dedup
    "minhash_lsh_near_dups",  # MinHash + LSH
    "simhash_near_dups",      # SimHash multi-index
    "jaccard_near_dups",      # exact n-gram Jaccard join
    "window_dup_stats",       # substring (window-hash) dedup
    "line_dedup",             # decontamination / line dedup
    # -- ANN / embeddings --
    "ann_ivf_top3",           # IVF ANN
    "kmeans_clusters_r2",     # k-means
    "pq_adc_top5",            # product quantization ADC
    "semdedup_keep",          # SemDeDup
    "knn_graph_lsh_k5",       # kNN graph (LSH-bucketed)
    # -- text / quality / LM --
    "tfidf_top100",           # TF-IDF / text stats
    "gopher_repetition",      # Gopher quality signals
    "c4_clean_docs",          # C4 cleaning
    "nb_quality_scores",      # NB quality classifier
    "bigram_lm_ppl",          # n-gram LM perplexity
    "dsir_weights",           # DSIR importance weights
    "pca_top2",               # PCA
    # -- sketches --
    "hll_distinct",           # HyperLogLog
    "cms_estimates",          # Count-Min sketch
    # -- tokenization / packing --
    "bpe_merges_6",           # BPE learn
    "pack_chunks_512",        # sequence packing (two-level scan)
    # -- events / samplers --
    "event_transitions",      # event analytics (sessions/funnel/retention later)
    "docs_stratified_sample", # deterministic samplers
]

PATH = "__spark_entry__.py"


def reorder(src_fn_name: str, text: str) -> str:
    m = re.search(
        rf"def {src_fn_name}\(\)[^\n]*\n    return \{{\n(.*?)\n    \}}\n",
        text,
        re.S,
    )
    assert m, f"could not find {src_fn_name} dict"
    body = m.group(1)
    entries = {}
    for line in body.split("\n"):
        km = re.match(r'\s+"([^"]+)":', line)
        assert km, f"unparsed line: {line!r}"
        entries[km.group(1)] = line
    assert len(entries) == len(body.split("\n")), "duplicate keys?"
    missing = [k for k in CURATED_FIRST_50 if k not in entries]
    assert not missing, f"curated keys absent: {missing}"
    ordered = list(CURATED_FIRST_50) + [
        k for k in entries if k not in set(CURATED_FIRST_50)
    ]
    assert len(ordered) == len(entries)
    new_body = "\n".join(entries[k] for k in ordered)
    return text[: m.start(1)] + new_body + text[m.end(1):]


def main() -> None:
    with open(PATH) as f:
        text = f.read()
    n_before = len(re.findall(r'^\s+"[^"]+":', text, re.M))
    text = reorder("queries", text)
    n_after = len(re.findall(r'^\s+"[^"]+":', text, re.M))
    assert n_before == n_after, (n_before, n_after)
    with open(PATH, "w") as f:
        f.write(text)
    print("reordered; first 50 =", CURATED_FIRST_50[:5], "...")


if __name__ == "__main__":
    main()
