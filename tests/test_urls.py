"""URL canonicalization (ingest/urls.py)."""

import pytest

from gunrock_spark.ingest.urls import canonicalize


CASES = [
    # (raw, canonical)
    ("HTTP://Example.COM:80/Path/To?utm_source=x&b=2&a=1#frag",
     "http://example.com/Path/To?a=1&b=2"),
    ("https://x.com:443", "https://x.com/"),
    ("https://x.com:8443/keep:port", "https://x.com:8443/keep:port"),
    ("  http://a.b/c?z=1&y&utm_campaign=q&fbclid=22 ", "http://a.b/c?y&z=1"),
    ("relative/path?a=1", "relative/path?a=1"),  # non-absolute: trim only
    ("ftp://Files.example.org:21/x", "ftp://files.example.org:21/x"),
    ("http://h.com/?", "http://h.com/"),
    ("http://h.com#only-frag", "http://h.com/"),
    ("https://h.com/a?gclid=1&utm_x=2", "https://h.com/a"),
]


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    return [r.url_canon for r in canonicalize(df).orderBy("i").collect()]


def test_known_cases(spark):
    got = _canon(spark, [raw for raw, _ in CASES])
    assert got == [want for _, want in CASES]


def test_idempotent(spark):
    once = _canon(spark, [raw for raw, _ in CASES])
    twice = _canon(spark, once)
    assert twice == once


def test_query_order_insensitive_identity(spark):
    a, b = _canon(spark, [
        "http://x.com/p?b=2&a=1&utm_source=z",
        "HTTP://X.com:80/p?a=1&b=2",
    ])
    assert a == b


def test_plan_no_shuffle_no_python(spark):
    df = spark.createDataFrame([(1, "http://a.b/c")], "i long, url string")
    plan = canonicalize(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- redirect-chain resolution (pointer doubling) ---------------------------


def _resolve(spark, pairs, **kw):
    from gunrock_spark.ingest.urls import resolve_redirects

    df = spark.createDataFrame(pairs, "url string, target string")
    return {
        r.url: (r.final_url, r.is_cycle)
        for r in resolve_redirects(df, **kw).collect()
    }


def test_redirect_chain_and_cycle(spark):
    pairs = (
        [("a", "b"), ("b", "c"), ("c", "X")]      # 3-chain exiting to X
        + [("p", "q"), ("q", "p")]                # 2-cycle
        + [("m", "p")]                            # feeds the cycle
        + [(f"r{i}", f"r{i+1}") for i in range(20)]
        + [("r20", "OUT")]                        # 21-link chain
    )
    got = _resolve(spark, pairs)
    assert got["a"] == ("X", False)
    assert got["b"] == ("X", False)
    assert got["c"] == ("X", False)
    assert got["p"] == ("", True)
    assert got["q"] == ("", True)
    assert got["m"] == ("", True)
    for i in range(21):
        assert got[f"r{i}"] == ("OUT", False)
    assert len(got) == len(pairs)


def test_redirect_extra_doublings_stationary(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "X"), ("p", "q"), ("q", "p")]
    base = _resolve(spark, pairs)
    more = _resolve(spark, pairs, max_doublings=9)
    assert base == more


def test_redirect_self_loop(spark):
    got = _resolve(spark, [("s", "s"), ("t", "s"), ("u", "V")])
    assert got["s"] == ("", True)
    assert got["t"] == ("", True)
    assert got["u"] == ("V", False)
