"""C4-style line cleaning + bigram LM scoring vs pure-Python oracles."""

import math
import re

import pytest

from gunrock_spark.pipeline.c4 import DEFAULT_BLOCKLIST, c4_clean
from gunrock_spark.pipeline.lm import bigram_lm, bigram_lm_score

DOCS = [
    (1, "the quick brown fox jumps.\nno punct line here\nshort.\n"
        'lorem ipsum dolor sit amet.\nthis one is perfectly fine!\n'
        "enable javascript to view this page.\nvar x = {a: 1};\n"
        'he said "stop right there."'),
    (2, "only one good line survives here.\ntiny.\nbad { brace line."),
    (3, "no lines pass\nat all\nhere"),
    (4, ""),
    (5, "first fine line stays put.\nsecond fine line stays too?\n"
        "read our privacy policy.\nthird good line rounds it out!"),
]


def _py_keep(line, min_words=3):
    low = line.lower()
    if len(re.findall(r"[A-Za-z0-9]+", line)) < min_words:
        return False
    if "{" in low or "}" in low:
        return False
    if any(p in low for p in DEFAULT_BLOCKLIST):
        return False
    return bool(re.search(r"""[.!?"']$""", line))


def _py_c4(docs, min_words=3, min_lines=2):
    out = {}
    for i, text in docs:
        lines = text.split("\n")
        kept = [ln for ln in lines if _py_keep(ln, min_words)]
        if len(kept) >= min_lines:
            out[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


def test_c4_clean_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in c4_clean(df).collect()
    }
    assert got == _py_c4(DOCS)
    # doc 2 has exactly one good line -> dropped at min_lines=2,
    # kept at min_lines=1
    assert 2 not in got
    got1 = {r["doc_id"] for r in c4_clean(df, min_lines=1).collect()}
    assert 2 in got1 and 3 not in got1 and 4 not in got1


def _py_bigram_lm(texts, k=0.5):
    from collections import Counter

    bi, ctx, vocab = Counter(), Counter(), set()
    for t in texts:
        toks = re.findall(r"[A-Za-z0-9]+", t.lower())
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
            ctx[a] += 1
    V = len(vocab)
    add = k * (V + 1)

    def lp(a, b):
        if (a, b) in bi:
            return math.log((bi[(a, b)] + k) / (ctx[a] + add))
        if a in ctx:
            return math.log(k / (ctx[a] + add))
        return math.log(1.0 / (V + 1))

    return lp


def test_bigram_lm_score_matches_python_oracle(spark):
    train = [(i, t) for i, t in DOCS if t]
    score_docs = [
        (10, "the quick brown fox jumps."),
        (11, "quick the the quick zebra unseenword fox"),
        (12, "x"),  # single token: no bigrams
        (13, ""),
    ]
    tdf = spark.createDataFrame(train, ["doc_id", "text"])
    sdf = spark.createDataFrame(score_docs, ["doc_id", "text"])
    model = bigram_lm(tdf, k=0.5)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
        for r in bigram_lm_score(sdf, model).collect()
    }
    lp = _py_bigram_lm([t for _, t in train], k=0.5)
    for i, text in score_docs:
        toks = re.findall(r"[A-Za-z0-9]+", text.lower())
        pairs = list(zip(toks, toks[1:]))
        n, a, p = got[i]
        assert n == len(pairs)
        if not pairs:
            assert (a, p) == (0.0, 1.0)
        else:
            exp = sum(lp(x, y) for x, y in pairs) / len(pairs)
            assert a == pytest.approx(exp, rel=1e-12)
            assert p == pytest.approx(math.exp(-exp), rel=1e-12)
    # trained bigram beats garbage
    assert got[10][2] < got[11][2]


def _py_kn_lm(train_texts, d=0.75):
    bi, ctx, n1f, n1b = {}, {}, {}, {}
    vocab = set()
    for t in train_texts:
        toks = re.findall(r"[A-Za-z0-9]+", t.lower())
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    for (a, b), c in bi.items():
        ctx[a] = ctx.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1b[b] = n1b.get(b, 0) + 1
    B, V = len(bi), len(vocab)
    denom = float(B + V + 1)

    def pc(b):
        return (n1b.get(b, 0) + 1) / denom

    def lp(a, b):
        if (a, b) in bi:
            lam = d * n1f[a] / ctx[a]
            return math.log((bi[(a, b)] - d) / ctx[a] + lam * pc(b))
        if a in ctx:
            lam = d * n1f[a] / ctx[a]
            return math.log(lam * pc(b))
        return math.log(pc(b))

    return lp


def test_kn_bigram_score_matches_python_oracle(spark):
    from gunrock_spark.pipeline.lm import kn_bigram_lm, kn_bigram_score

    train = [(i, t) for i, t in DOCS if t]
    score_docs = [
        (10, "the quick brown fox jumps."),
        (11, "quick the the quick zebra unseenword fox"),
        (12, "x"),
        (13, ""),
    ]
    tdf = spark.createDataFrame(train, ["doc_id", "text"])
    sdf = spark.createDataFrame(score_docs, ["doc_id", "text"])
    model = kn_bigram_lm(tdf, discount=0.75)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
        for r in kn_bigram_score(sdf, model).collect()
    }
    lp = _py_kn_lm([t for _, t in train], d=0.75)
    for i, text in score_docs:
        toks = re.findall(r"[A-Za-z0-9]+", text.lower())
        pairs = list(zip(toks, toks[1:]))
        n, a, p = got[i]
        assert n == len(pairs)
        if not pairs:
            assert (a, p) == (0.0, 1.0)
        else:
            exp = sum(lp(x, y) for x, y in pairs) / len(pairs)
            assert a == pytest.approx(exp, rel=1e-12)
            assert p == pytest.approx(math.exp(-exp), rel=1e-12)
    # trained text still beats garbage under KN
    assert got[10][2] < got[11][2]
    # discount outside (0,1) is rejected
    with pytest.raises(ValueError):
        kn_bigram_lm(tdf, discount=1.5)
