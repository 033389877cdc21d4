"""spark-submit job driver — the engine's cluster entry point.

The analog of the reference's CLI test binaries (tests/pr/test_pr.cu
lifecycle, SURVEY.md §3.1): parse config, load/derive the edge table,
run the primitive's convergence loop with checkpoint+metrics, write
results + a run-manifest JSON (the reference's Info contract,
util/info.cuh:594-615).

Usage (cluster):
  python scripts/make_pyfiles.py                 # -> dist/gunrock_spark.zip
  spark-submit --py-files dist/gunrock_spark.zip \
      jobs/pagerank.py --edges s3://bucket/edges.parquet \
      --algorithm pagerank --checkpoint-dir s3://bucket/ckpt/run1 \
      --resume --out s3://bucket/out/ranks

Usage (local smoke):
  spark-submit --master 'local[8]' --py-files dist/gunrock_spark.zip \
      jobs/pagerank.py --pages-generate 256 --algorithm pagerank --out /tmp/pr

Input modes (exactly one):
  --edges PATH            parquet with (src long, dst long)
  --pages SRC             pages table (url, warc_ts, html, text,
                          lang) -> link extraction -> edges; SRC is a
                          parquet path or an Iceberg/catalog table
                          identifier (schema-validated either way)
  --pages-generate N      deterministic seeded pages table (testing)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--edges", help="parquet edge table (src long, dst long)")
    src.add_argument("--snap", help="SNAP-style text edge list (# comments)")
    src.add_argument("--pages", help="parquet pages table -> link extraction")
    src.add_argument("--pages-generate", type=int, metavar="N",
                     help="generate a deterministic N-page table (power of two)")
    ap.add_argument("--algorithm", default="pagerank",
                    choices=["pagerank", "cc", "lp", "louvain", "tc", "tcdoulion",
                             "bfs", "sssp", "widest",
                             "bc", "hits", "salsa", "wtf", "topk",
                             "kcore", "corenums", "onion", "ktruss", "trussness", "mis",
                             "walks", "node2vec", "wwalks", "khop", "simrank",
                             "scc", "bowtie", "daglevels", "anf", "disthist", "effdiam",
                             "harmonic", "closeness", "icspread", "percolation",
                             "ddseeds", "attack",
                             "linkpred",
                             "color", "katz", "eigenvector", "matching",
                             "trustrank", "spammass", "absorption", "squares",
                             "msf",
                             "densest", "landmarks", "conductance",
                             "fiedler"],
                    help="the reference CLI binaries' surface "
                         "(tests/{pr,cc,bfs,sssp,bc,hits,salsa,wtf,topk}) "
                         "plus the engine's k-core/coreness/walk extensions")
    ap.add_argument("--delta", type=float, default=0.85)
    ap.add_argument("--threshold", type=float, default=0.01)
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--doulion-num", type=int, default=1,
                    help="tcdoulion edge-retention numerator (p = num/den)")
    ap.add_argument("--doulion-den", type=int, default=10,
                    help="tcdoulion edge-retention denominator")
    ap.add_argument("--compensate", action="store_true",
                    help="dangling-vertex virtual sink (reference --compensate)")
    ap.add_argument("--impl", default="join",
                    choices=["join", "blocks", "minmax", "jp"],
                    help="tc: join|blocks; color: minmax|jp (mex)")
    ap.add_argument("--num-partitions", type=int, default=None,
                    help="edge-table partitions (default: defaultParallelism)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-interval", type=int, default=5)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--init-ranks", default=None, metavar="PATH",
                    help="warm-start pagerank from a previous run's "
                         "(v, rank) parquet (e.g. the last crawl's --out)")
    ap.add_argument("--init-labels", default=None, metavar="PATH",
                    help="warm-start cc from a previous run's (v, label) "
                         "parquet — valid after ADDITIVE updates only")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--manifest", default=None,
                    help="run-manifest JSON path (default: stdout)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--walk-length", type=int, default=4,
                    help="steps per walk (walks/node2vec)")
    ap.add_argument("--walks-per-vertex", type=int, default=1)
    ap.add_argument("--skipgram-window", type=int, default=0,
                    help="walks/node2vec: emit skip-gram (center, "
                         "context, n) pair counts within this window "
                         "instead of raw walks (0 = raw walks)")
    ap.add_argument("--fanouts", type=int, nargs="+", default=[3, 2],
                    metavar="F",
                    help="khop: per-hop neighbor fanouts (GraphSAGE "
                         "block sampling), e.g. --fanouts 10 5")
    ap.add_argument("--direction", default="out", choices=["out", "in"],
                    help="khop: sample out-neighbors or in-neighbors "
                         "(backlink blocks)")
    ap.add_argument("--p", type=int, default=1,
                    help="node2vec return penalty (positive integer)")
    ap.add_argument("--q", type=int, default=1,
                    help="node2vec in-out penalty (positive integer)")
    ap.add_argument("--source", type=int, default=None,
                    help="source vertex (bfs/sssp/bc/hits/wtf; default: "
                         "smallest vertex id)")
    ap.add_argument("--k", type=int, default=10,
                    help="top-k size (topk) / minimum degree (kcore)")
    ap.add_argument("--ic-p-milli", type=int, default=300,
                    help="icspread: per-edge live probability in 1/1000ths")
    ap.add_argument("--num-sources", type=int, default=32,
                    help="bc: seeded source-sample size when --source unset")
    ap.add_argument("--mark-pred", action="store_true",
                    help="bfs: record predecessors / sssp: record paths")
    ap.add_argument("--host-level", action="store_true",
                    help="with --pages/--pages-generate: roll the page "
                         "links up to the HOST graph (ingest/hosts.py) "
                         "and run the algorithm there; writes the "
                         "host dictionary next to --out as <out>_hosts")
    ap.add_argument("--weighted", action="store_true",
                    help="pagerank: push rank along edge weights "
                         "(host-rank over n_links; needs a weight "
                         "column — --host-level provides one)")
    args = ap.parse_args(argv)
    # fail fast on flag/algorithm mismatches (a silently-ignored warm
    # start looks identical to a successful one from the outside)
    if args.init_ranks and args.algorithm != "pagerank":
        ap.error("--init-ranks only applies to --algorithm pagerank")
    if args.init_labels and args.algorithm != "cc":
        ap.error("--init-labels only applies to --algorithm cc")
    # dispatch below tests `is not None`, not truthiness: `--pages-generate 0`
    # must be a clear argparse error, not a later NameError on edges_df
    if args.pages_generate is not None and args.pages_generate <= 0:
        ap.error("--pages-generate N must be positive")
    if args.host_level and (args.edges or args.snap):
        ap.error("--host-level needs a pages input (--pages/--pages-generate)")
    if args.weighted and args.algorithm != "pagerank":
        ap.error("--weighted only applies to --algorithm pagerank")

    # spark-submit provides master/conf; fall back to engine defaults
    # (local[cpus]) when run as a bare python script.
    from gunrock_spark.session import build_session

    spark = SparkSession.getActiveSession() or build_session("gunrock-spark-job")

    from gunrock_spark.graph.edge_table import EdgeTable

    t_load = time.monotonic()
    if args.edges:
        edges_df = spark.read.parquet(args.edges)
    elif args.snap:
        from gunrock_spark.graph.io import read_snap_edges

        edges_df = read_snap_edges(spark, args.snap).edges
    elif args.pages or args.pages_generate is not None:
        from gunrock_spark.ingest.links import pages_to_edges, verify_extraction

        if args.pages:
            # Path -> parquet; bare identifier -> catalog table (the
            # Iceberg route once spark.sql.catalog.* is configured).
            from gunrock_spark.sources.pages import read_pages

            pages = read_pages(spark, args.pages)
        else:
            from gunrock_spark.graph.generators import pages_table

            pages, _ = pages_table(spark, n_pages=args.pages_generate, seed=args.seed)
        bad = verify_extraction(pages)
        if bad:
            print(f"FATAL: {bad} pages fail byte-identical text extraction", file=sys.stderr)
            return 2
        if args.host_level:
            from gunrock_spark.ingest.hosts import host_graph

            host_et, host_dict, _ = host_graph(pages)
            host_dict.write.mode("overwrite").parquet(args.out + "_hosts")
            edges_df = host_et.edges
        else:
            edges_df, _ = pages_to_edges(pages)
    n_parts = args.num_partitions or spark.sparkContext.defaultParallelism
    # sssp needs weights: use a weight column when present, else fill
    # deterministically like the .mtx reader (h60(src:dst) % 64)
    weight = None
    if args.weighted:
        if "weight" not in edges_df.columns:
            print("FATAL: --weighted needs a weight column on the edge table",
                  file=sys.stderr)
            return 2
        weight = "weight"
    if args.algorithm in ("sssp", "msf", "wwalks", "widest"):
        if "weight" not in edges_df.columns:
            from pyspark.sql import functions as F

            from gunrock_spark.functions.hashing import h60

            edges_df = edges_df.withColumn(
                "weight",
                (h60(F.concat_ws(":", F.col("src"), F.col("dst"))) % 64
                 ).cast("double"),
            )
        weight = "weight"
    graph = EdgeTable.from_df(edges_df, weight=weight, num_partitions=n_parts)
    load_sec = time.monotonic() - t_load

    def _default_source():
        if args.source is not None:
            return args.source
        from pyspark.sql import functions as F

        return graph.vertices.agg(F.min("v")).collect()[0][0]

    if args.algorithm == "pagerank" and args.weighted:
        from gunrock_spark.algorithms.pagerank import weighted_pagerank

        res = weighted_pagerank(
            graph,
            delta=args.delta,
            threshold=args.threshold,
            max_iter=args.max_iter,
        )
        out_df = res.state.select("v", "rank")
    elif args.algorithm == "pagerank":
        from gunrock_spark.algorithms.pagerank import pagerank, ranked

        res = pagerank(
            graph,
            delta=args.delta,
            threshold=args.threshold,
            max_iter=args.max_iter,
            compensate=args.compensate,
            impl=args.impl,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_interval=args.checkpoint_interval,
            resume=args.resume,
            init_ranks=(
                spark.read.parquet(args.init_ranks).select("v", "rank")
                if args.init_ranks
                else None
            ),
        )
        out_df = ranked(res.state)
    elif args.algorithm == "cc":
        from gunrock_spark.algorithms.components import connected_components

        res = connected_components(
            graph,
            max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_interval=args.checkpoint_interval,
            resume=args.resume,
            init_labels=(
                spark.read.parquet(args.init_labels).select("v", "label")
                if args.init_labels
                else None
            ),
        )
        out_df = res.state.select("v", "label")
    elif args.algorithm == "lp":
        from gunrock_spark.algorithms.label_propagation import label_propagation

        res = label_propagation(graph, mode="mode", max_iter=args.max_iter)
        out_df = res.state.select("v", "label")
    elif args.algorithm == "louvain":
        from pyspark.sql import functions as F

        from gunrock_spark.algorithms.louvain import louvain

        res = louvain(graph, max_iter=args.max_iter)
        out_df = res.state.select("v", F.col("c").alias("community"))
    elif args.algorithm == "tc":
        from gunrock_spark.algorithms.triangles import triangle_count_per_vertex

        res = None
        out_df = triangle_count_per_vertex(graph)
    elif args.algorithm == "tcdoulion":
        from gunrock_spark.algorithms.triangles import triangle_count_doulion

        res = None
        out_df = triangle_count_doulion(
            graph, num=args.doulion_num, den=args.doulion_den
        )
    elif args.algorithm == "bfs":
        from gunrock_spark.algorithms.bfs import bfs

        res = bfs(graph, source=_default_source(), max_depth=args.max_iter,
                  mark_predecessors=args.mark_pred)
        out_df = res.state
    elif args.algorithm == "widest":
        from gunrock_spark.algorithms.sssp import widest_paths

        src = args.source
        if src is None:
            from pyspark.sql import functions as F

            src = graph.vertices.agg(F.min("v")).collect()[0][0]
        res = widest_paths(graph, source=int(src), max_iter=args.max_iter)
        out_df = res.state.where("cap > 0").select("v", "cap")
    elif args.algorithm == "sssp":
        from gunrock_spark.algorithms.sssp import distances, sssp

        res = sssp(graph, source=_default_source(), max_iter=args.max_iter,
                   mark_paths=args.mark_pred)
        out_df = distances(res.state)
    elif args.algorithm == "bc":
        from gunrock_spark.algorithms.bc import betweenness_centrality

        res = None
        out_df = betweenness_centrality(
            graph,
            sources=[args.source] if args.source is not None else None,
            num_sources=args.num_sources,
        )
    elif args.algorithm == "hits":
        from gunrock_spark.algorithms.hits import hits

        res = hits(graph, src=_default_source(), delta=args.delta,
                   max_iter=args.max_iter)
        out_df = res.state
    elif args.algorithm == "salsa":
        from gunrock_spark.algorithms.salsa import salsa

        res = salsa(graph, max_iter=args.max_iter)
        out_df = res.state
    elif args.algorithm == "wtf":
        from gunrock_spark.algorithms.wtf import who_to_follow

        res = None
        out_df = who_to_follow(graph, src=_default_source(),
                               delta=args.delta, max_iter=args.max_iter)
    elif args.algorithm == "trustrank":
        from gunrock_spark.algorithms.bc import sample_sources
        from gunrock_spark.algorithms.pagerank import trustrank

        seeds = [r["source"] for r in sample_sources(graph, args.num_sources).collect()]
        res = trustrank(graph, seeds, delta=args.delta,
                        threshold=args.threshold, max_iter=args.max_iter)
        out_df = res.state
    elif args.algorithm == "spammass":
        from gunrock_spark.algorithms.bc import sample_sources
        from gunrock_spark.algorithms.pagerank import spam_mass

        seeds = [r["source"] for r in sample_sources(graph, args.num_sources).collect()]
        res = None
        out_df = spam_mass(graph, seeds, delta=args.delta,
                           max_iter=args.max_iter)
    elif args.algorithm == "absorption":
        from gunrock_spark.algorithms.absorption import absorption_probability
        from gunrock_spark.algorithms.bc import sample_sources

        seeds = [r["source"] for r in sample_sources(graph, args.num_sources).collect()]
        res = None
        out_df = absorption_probability(graph, seeds, k=args.max_iter)
    elif args.algorithm == "matching":
        from gunrock_spark.algorithms.matching import maximal_matching

        res = maximal_matching(graph, max_iter=args.max_iter)
        out_df = res.state
    elif args.algorithm == "katz":
        from gunrock_spark.algorithms.katz import katz_centrality

        res = katz_centrality(graph, alpha=0.05, beta=1.0, max_iter=args.max_iter)
        out_df = res.state
    elif args.algorithm == "eigenvector":
        from gunrock_spark.algorithms.katz import eigenvector_centrality

        res = eigenvector_centrality(graph, max_iter=args.max_iter)
        out_df = res.state
    elif args.algorithm == "ktruss":
        from gunrock_spark.algorithms.ktruss import k_truss

        res = k_truss(graph, k=max(args.k, 3), max_iter=args.max_iter)
        out_df = res.state
    elif args.algorithm == "mis":
        from gunrock_spark.algorithms.mis import maximal_independent_set

        res = maximal_independent_set(graph, max_iter=args.max_iter)
        out_df = res.state
    elif args.algorithm == "kcore":
        from gunrock_spark.algorithms.kcore import k_core

        res = k_core(graph, k=args.k, max_iter=args.max_iter)
        out_df = res.state.select("v", "deg")
    elif args.algorithm == "corenums":
        from gunrock_spark.algorithms.kcore import core_numbers

        res = core_numbers(graph, max_iter=args.max_iter)
        out_df = res.state.select("v", "c")
    elif args.algorithm == "onion":
        from gunrock_spark.algorithms.kcore import onion_decomposition

        res = onion_decomposition(
            graph,
            max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_interval=args.checkpoint_interval,
            resume=args.resume,
        )
        out_df = res.state.select("v", "layer", "core")
    elif args.algorithm == "scc":
        from gunrock_spark.algorithms.scc import strongly_connected_components

        res = strongly_connected_components(graph, max_inner=args.max_iter)
        out_df = res.state
    elif args.algorithm == "bowtie":
        from gunrock_spark.algorithms.scc import bowtie_decomposition

        res = None
        out_df = bowtie_decomposition(graph, max_inner=args.max_iter)
    elif args.algorithm == "anf":
        from gunrock_spark.algorithms.anf import neighborhood_function

        res = None
        out_df = neighborhood_function(graph, max_radius=args.max_iter)
    elif args.algorithm == "disthist":
        from gunrock_spark.algorithms.anf import (
            distance_histogram,
            neighborhood_function,
        )

        res = None
        out_df = distance_histogram(
            neighborhood_function(graph, max_radius=args.max_iter)
        )
    elif args.algorithm == "effdiam":
        from gunrock_spark.algorithms.anf import (
            effective_diameter_df,
            neighborhood_function,
        )

        res = None
        out_df = effective_diameter_df(
            neighborhood_function(graph, max_radius=args.max_iter)
        )
    elif args.algorithm == "icspread":
        from gunrock_spark.algorithms.bc import sample_sources
        from gunrock_spark.algorithms.influence import ic_spread

        seeds = (
            spark.createDataFrame([(args.source,)], "source long")
            if args.source is not None
            else sample_sources(graph, args.num_sources)
        )
        res = ic_spread(
            graph, seeds, p_milli=args.ic_p_milli, max_rounds=args.max_iter
        )
        out_df = res.state
    elif args.algorithm == "ddseeds":
        from gunrock_spark.algorithms.influence import degree_discount_seeds

        res = None
        out_df = degree_discount_seeds(graph, k=args.k, p_milli=args.ic_p_milli)
    elif args.algorithm == "percolation":
        from gunrock_spark.algorithms.influence import percolation_curve

        res = None
        out_df = percolation_curve(graph)
    elif args.algorithm == "attack":
        from gunrock_spark.algorithms.influence import attack_curve

        res = None
        out_df = attack_curve(graph, ks=(0, args.k))
    elif args.algorithm == "harmonic":
        from gunrock_spark.algorithms.anf import hyperball_centralities

        res = None
        out_df = hyperball_centralities(graph, radius=max(args.max_iter, 1))
    elif args.algorithm == "closeness":
        from gunrock_spark.algorithms.anf import closeness_centralities

        res = None
        out_df = closeness_centralities(graph, radius=max(args.max_iter, 1))
    elif args.algorithm == "color":
        from gunrock_spark.algorithms.coloring import greedy_coloring, minmax_coloring

        fn = minmax_coloring if args.impl == "minmax" else greedy_coloring
        res = fn(graph, max_iter=args.max_iter)
        out_df = res.state
    elif args.algorithm == "linkpred":
        from gunrock_spark.algorithms.linkpred import adamic_adar_topk

        res = None
        out_df = adamic_adar_topk(graph, k=args.k)
    elif args.algorithm == "walks":
        from gunrock_spark.algorithms.walks import random_walks

        res = None
        out_df = random_walks(
            graph,
            walk_length=args.walk_length,
            walks_per_vertex=args.walks_per_vertex,
            seed=args.seed,
        )
    elif args.algorithm == "wwalks":
        from gunrock_spark.algorithms.walks import weighted_walks

        res = None
        out_df = weighted_walks(
            graph,
            walk_length=args.walk_length,
            walks_per_vertex=args.walks_per_vertex,
            seed=args.seed,
        )
    elif args.algorithm == "node2vec":
        from gunrock_spark.algorithms.walks import node2vec_walks

        res = None
        out_df = node2vec_walks(
            graph,
            walk_length=args.walk_length,
            p=args.p,
            q=args.q,
            walks_per_vertex=args.walks_per_vertex,
            seed=args.seed,
        )
    elif args.algorithm == "fiedler":
        from gunrock_spark.algorithms.spectral import spectral_bisection

        res = None
        out_df = spectral_bisection(
            graph, n_iter=min(args.max_iter, 50), seed=args.seed
        )
    elif args.algorithm == "daglevels":
        from gunrock_spark.algorithms.dag import dag_levels

        res = dag_levels(graph, max_iter=args.max_iter)
        out_df = res.state
    elif args.algorithm == "khop":
        from gunrock_spark.algorithms.walks import khop_neighbor_sample

        res = None
        out_df = khop_neighbor_sample(
            graph, args.fanouts, seed=args.seed, direction=args.direction
        )
    elif args.algorithm == "msf":
        from gunrock_spark.algorithms.msf import minimum_spanning_forest

        res = None
        out_df = minimum_spanning_forest(graph)
    elif args.algorithm == "trussness":
        from gunrock_spark.algorithms.ktruss import trussness

        res = None
        out_df = trussness(graph, k_cap=max(args.k, 3))
    elif args.algorithm == "simrank":
        from gunrock_spark.algorithms.simrank import simrank_scores

        res = None
        out_df = simrank_scores(
            graph,
            n_queries=args.num_sources,
            walk_length=args.walk_length,
            walks_per_vertex=max(1, args.walks_per_vertex),
            seed=args.seed,
        )
    elif args.algorithm == "squares":
        from gunrock_spark.algorithms.motifs import squares_per_vertex

        res = None
        out_df = squares_per_vertex(graph)
    elif args.algorithm == "densest":
        from gunrock_spark.algorithms.densest import densest_subgraph

        res = None
        out_df = densest_subgraph(graph, max_rounds=args.max_iter).members
    elif args.algorithm == "landmarks":
        from gunrock_spark.algorithms.landmarks import landmark_distances

        res = None
        out_df = landmark_distances(graph, k=args.k, salt=args.seed)
    elif args.algorithm == "conductance":
        from gunrock_spark.algorithms.label_propagation import label_propagation
        from gunrock_spark.algorithms.modularity import conductance

        comm = label_propagation(graph, mode="mode", max_iter=args.max_iter).state
        res = None
        out_df = conductance(graph, comm.select("v", "label"))
    else:  # topk
        pass
    if args.algorithm in ("walks", "node2vec") and args.skipgram_window > 0:
        from gunrock_spark.algorithms.walks import skipgram_pairs

        out_df = skipgram_pairs(out_df, window=args.skipgram_window)
    if args.algorithm == "topk":
        from gunrock_spark.algorithms.topk import degree_topk

        res = None
        out_df = degree_topk(graph, k=args.k)

    out_df.write.mode("overwrite").parquet(args.out)

    manifest = {
        "algorithm": args.algorithm,
        "edges": graph.num_edges(),
        "vertices": graph.num_vertices(),
        "load_sec": round(load_sec, 3),
        "impl": args.impl,
        "out": args.out,
    }
    if res is not None:
        manifest.update(res.manifest())
    line = json.dumps(manifest)
    if args.manifest:
        with open(args.manifest, "w") as f:
            f.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
