"""The corpus-curation job driver (jobs/corpus.py) driven in-process."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))


@pytest.fixture()
def docs_parquet(spark, tmp_path):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "web"),
        (1, "the quick brown fox jumps over the lazy dog", "web"),  # exact dup
        (2, "a completely different document about spark shuffles", "web"),
        (3, "der hund und die katze sind nicht auf der couch heute", "books"),
        (4, "short text", "books"),
    ]
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        rows, schema="doc_id long, text string, source string"
    ).write.parquet(path)
    return path


def _run(args):
    import importlib

    mod = importlib.import_module("corpus")
    return mod.main(args)


def _manifest(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_exact_dedup_keeps_one_representative(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "out")
    assert _run(["--input", docs_parquet, "--op", "exact-dedup", "--out", out]) == 0
    m = _manifest(capsys)
    assert m["rows_in"] == 5 and m["rows_out"] == 4
    ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert ids == {0, 2, 3, 4}  # min-id keeper rule drops doc 1


def test_decontaminate_drops_overlapping_docs(spark, docs_parquet, tmp_path, capsys):
    ev = str(tmp_path / "eval.parquet")
    spark.createDataFrame(
        [(100, "quick brown fox")], schema="doc_id long, text string"
    ).write.parquet(ev)
    out = str(tmp_path / "out")
    assert (
        _run(
            [
                "--input", docs_parquet, "--op", "decontaminate",
                "--eval-input", ev, "--out", out,
            ]
        )
        == 0
    )
    ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert ids == {2, 3, 4}  # docs 0/1 contain the eval trigram


def test_gopher_and_lm_append_columns(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "g")
    assert _run(["--input", docs_parquet, "--op", "gopher", "--out", out]) == 0
    cols = set(spark.read.parquet(out).columns)
    assert {"text", "keep", "top_2gram_char_frac"} <= cols
    out2 = str(tmp_path / "l")
    assert _run(["--input", docs_parquet, "--op", "lm-ppl", "--out", out2]) == 0
    cols2 = set(spark.read.parquet(out2).columns)
    assert {"text", "avg_logp", "ppl"} <= cols2


def test_mixture_sample_filters_sources(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "out")
    assert (
        _run(
            [
                "--input", docs_parquet, "--op", "mixture-sample",
                "--fractions", '{"web": 1.0}', "--out", out,
            ]
        )
        == 0
    )
    rows = spark.read.parquet(out).collect()
    assert {r.source for r in rows} == {"web"} and len(rows) == 3


def test_flag_validation(spark, docs_parquet, tmp_path):
    with pytest.raises(SystemExit):
        _run(["--input", docs_parquet, "--op", "decontaminate", "--out", "x"])
    with pytest.raises(SystemExit):
        _run(["--input", docs_parquet, "--op", "mixture-sample", "--out", "x"])


def test_length_filter_op(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "out")
    assert _run(["--input", docs_parquet, "--op", "length-filter", "--out", out]) == 0
    m = _manifest(capsys)
    assert m["rows_in"] == 5 and m["rows_out"] == 5
    got = {r.doc_id: r.keep for r in spark.read.parquet(out).collect()}
    assert set(got) == {0, 1, 2, 3, 4}


def test_dsir_sample_op(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "dsir")
    assert (
        _run(
            [
                "--input", docs_parquet, "--op", "dsir-sample",
                "--target-sources", "books", "--n-keep", "3",
                "--buckets", "64", "--out", out,
            ]
        )
        == 0
    )
    m = _manifest(capsys)
    assert m["rows_in"] == 5 and m["rows_out"] == 3
    # full document rows survive (semi-join on the selected ids)
    assert {"doc_id", "text", "source"} <= set(spark.read.parquet(out).columns)


def test_dsir_sample_requires_target_sources(spark, docs_parquet, tmp_path):
    with pytest.raises(SystemExit):
        _run(["--input", docs_parquet, "--op", "dsir-sample",
              "--out", str(tmp_path / "x")])


def test_semdedup_op(spark, tmp_path, capsys):
    import numpy as np

    rng = np.random.RandomState(1)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(30)]
    v0 = rows[0][1]
    rows.append((30, [x + 1e-5 for x in v0]))  # planted near-dup of 0
    path = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>"
    ).write.parquet(path)
    out = str(tmp_path / "kept")
    assert (
        _run(
            [
                "--input", path, "--op", "semdedup", "--id-col", "vec_id",
                "--semdedup-threshold", "0.9", "--out", out,
            ]
        )
        == 0
    )
    kept = {r.vec_id for r in spark.read.parquet(out).collect()}
    assert 0 in kept and 30 not in kept
    assert len(kept) <= 30


def test_window_dup_op(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "wd")
    assert _run(["--input", docs_parquet, "--op", "window-dup",
                 "--out", out]) == 0
    got = spark.read.parquet(out)
    assert {"doc_id", "n_windows", "n_dup_windows", "dup_frac"} <= set(got.columns)
    # docs 0 and 1 are byte-identical: both fully duplicated
    rows = {r.doc_id: r.dup_frac for r in got.collect()}
    assert rows[0] == 1.0 and rows[1] == 1.0


def test_extract_content_op(spark, tmp_path, capsys):
    art = "The quick brown fox jumps over the lazy dog near the riverbank."
    rows = [(1, f'<div><a href="/x">Nav</a></div>\n<p>{art}</p>')]
    inp = str(tmp_path / "pages.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "out")
    assert _run(["--input", inp, "--op", "extract-content", "--out", out]) == 0
    got = spark.read.parquet(out).collect()[0]
    assert got.main_text == art and got.n_content_lines == 1


def test_change_rate_op(spark, tmp_path, capsys):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("u", t0, "a"),
        ("u", t0 + datetime.timedelta(days=1), "b"),
        ("v", t0, "only"),
    ]
    inp = str(tmp_path / "crawls.parquet")
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    ).write.parquet(inp)
    out = str(tmp_path / "out")
    assert _run(["--input", inp, "--op", "change-rate", "--out", out]) == 0
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].n_changes == 1


def test_resolve_redirects_op(spark, tmp_path, capsys):
    rows = [("a", "b"), ("b", "X"), ("p", "p")]
    inp = str(tmp_path / "redirects.parquet")
    spark.createDataFrame(rows, "url string, target string").write.parquet(inp)
    out = str(tmp_path / "out")
    assert _run(["--input", inp, "--op", "resolve-redirects", "--out", out]) == 0
    got = {r.url: (r.final_url, r.is_cycle) for r in spark.read.parquet(out).collect()}
    assert got == {"a": ("X", False), "b": ("X", False), "p": ("", True)}


def test_cooc_pmi_op(spark, tmp_path, capsys):
    rows = [(1, "a b a c"), (2, "b a b")]
    inp = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "out")
    assert _run(["--input", inp, "--op", "cooc-pmi",
                 "--min-pair-count", "1", "--out", out]) == 0
    got = {(r.a, r.b): r.n_pairs for r in spark.read.parquet(out).collect()}
    assert got[("a", "b")] == 4


def test_inverted_index_op(spark, tmp_path, capsys):
    rows = [(1, "a b a c"), (2, "b a b"), (3, "c d")]
    inp = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "out")
    assert _run(["--input", inp, "--op", "inverted-index",
                 "--max-df", "2", "--out", out]) == 0
    got = {r.term: (r.df, list(r.doc_ids)) for r in spark.read.parquet(out).collect()}
    # "a" and "b" have df 2, "c" df 2, "d" df 1 — all within the cap
    assert got["a"] == (2, [1, 2])
    assert got["c"] == (2, [1, 3])
    assert got["d"] == (1, [3])


def test_top_terms_op(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "topterms")
    assert _run(["--input", docs_parquet, "--op", "top-terms",
                 "--top-k", "2", "--out", out]) == 0
    got = {
        (r.source, r.rank): r.term for r in spark.read.parquet(out).collect()
    }
    # web: 'the' (x4) then alphabetical among count-2 terms -> 'brown'
    assert got[("web", 1)] == "the"
    assert got[("web", 2)] == "brown"
    # books: 'der' (x2) then alphabetical among count-1 terms -> 'auf'
    assert got[("books", 1)] == "der"
    assert got[("books", 2)] == "auf"


def test_doc_sim_op(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "docsim")
    assert _run(["--input", docs_parquet, "--op", "doc-sim",
                 "--min-df", "2", "--max-df", "4", "--out", out]) == 0
    got = {(r.id_a, r.id_b): r.cosine for r in spark.read.parquet(out).collect()}
    # docs 0 and 1 are exact duplicates -> cosine 1.0 on shared terms
    assert got[(0, 1)] == 1.0
    # every pair sharing a surviving term appears with 0 < cosine <= 1
    assert all(0.0 < c <= 1.0 for c in got.values())


def test_zipf_op(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "zipf")
    assert _run(["--input", docs_parquet, "--op", "zipf", "--out", out]) == 0
    row = spark.read.parquet(out).collect()[0]
    assert row.n_tail > 0 and row.alpha > 1.0


def test_pack_op(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "pack")
    assert _run(["--input", docs_parquet, "--op", "pack",
                 "--seq-len", "8", "--out", out]) == 0
    rows = spark.read.parquet(out).collect()
    assert rows  # non-empty map over the fixture docs
    # stream invariant: chunk 0 starts at offset 0, spans are in-range
    assert any(r.chunk_id == 0 and r.chunk_off == 0 for r in rows)
    assert all(0 <= r.chunk_off < 8 and r.n_tok >= 1 for r in rows)
    # every chunk but the last is exactly full
    fill = {}
    for r in rows:
        fill[r.chunk_id] = fill.get(r.chunk_id, 0) + r.n_tok
    last = max(fill)
    assert all(v == 8 for c, v in fill.items() if c != last)


def test_bpe_learn_op(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "bpe")
    assert _run(["--input", docs_parquet, "--op", "bpe-learn",
                 "--n-merges", "3", "--out", out]) == 0
    rows = sorted(spark.read.parquet(out).collect(), key=lambda r: r.merge_idx)
    assert [r.merge_idx for r in rows] == list(range(len(rows))) and rows
    # counts are non-increasing in learn order only per-round argmax;
    # every merge must have been the round's max, hence count >= 1
    assert all(r.pair_count >= 1 and r.lhs and r.rhs for r in rows)


def test_c4_clean_and_bigram_ppl_ops(spark, tmp_path, capsys):
    rows = [
        (0, "good first line right here.\nno punct\ngood second line too!", "web"),
        (1, "only { braces } here.\nshort.", "web"),
        (2, "the quick brown fox runs fast.\nthe quick brown fox runs again.", "web"),
    ]
    path = str(tmp_path / "c4docs.parquet")
    spark.createDataFrame(
        rows, schema="doc_id long, text string, source string"
    ).write.parquet(path)

    out = str(tmp_path / "c4out")
    assert _run(["--input", path, "--op", "c4-clean", "--out", out]) == 0
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {0, 2}  # doc 1 has no keepable lines
    assert got[0].n_lines_kept == 2 and got[0].n_lines_dropped == 1
    assert "no punct" not in got[0].text

    out2 = str(tmp_path / "bgout")
    assert _run(["--input", path, "--op", "bigram-ppl", "--out", out2]) == 0
    res = spark.read.parquet(out2)
    assert {"text", "n_bigrams", "avg_logp", "ppl"} <= set(res.columns)
    assert res.count() == 3


def test_nb_quality_op(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "nb")
    assert (
        _run(
            [
                "--input", docs_parquet, "--op", "nb-quality",
                "--pos-source", "web", "--out", out,
            ]
        )
        == 0
    )
    res = spark.read.parquet(out)
    assert {"text", "log_odds", "pred"} <= set(res.columns)
    assert res.count() == 5
    with pytest.raises(SystemExit):
        _run(["--input", docs_parquet, "--op", "nb-quality", "--out", "x"])


def test_new_quality_and_vector_ops_run(spark, docs_parquet, tmp_path, capsys):
    """gopher-quality / quality-rollup / char-entropy over documents;
    kmeans / pq-encode over an embeddings parquet — each writes
    parquet with the expected schema."""
    import numpy as np

    for op, cols in [
        ("gopher-quality", {"doc_id", "n_words", "keep"}),
        ("quality-rollup", {"source", "n_docs", "keep_rate", "domain_keep"}),
        ("char-entropy", {"doc_id", "n_chars", "char_entropy"}),
    ]:
        out = str(tmp_path / op)
        assert _run(["--input", docs_parquet, "--op", op, "--out", out]) == 0
        got = spark.read.parquet(out)
        assert cols <= set(got.columns), op
        assert got.count() > 0

    rng = np.random.RandomState(11)
    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(8)]) for i in range(40)],
        schema="vec_id long, embedding array<double>",
    ).write.parquet(emb)
    for op, cols in [
        ("kmeans", {"vec_id", "cluster"}),
        ("pq-encode", {"vec_id", "codes"}),
    ]:
        out = str(tmp_path / op)
        assert _run(
            ["--input", emb, "--op", op, "--out", out,
             "--id-col", "vec_id", "--top-k", "4"]
        ) == 0
        got = spark.read.parquet(out)
        assert cols <= set(got.columns), op
        assert got.count() == 40
