"""Main-content extraction / boilerplate removal (pipeline/extract.py)."""

from gunrock_spark.pipeline.extract import extract_main_content

ARTICLE = (
    "The quick brown fox jumps over the lazy dog near the riverbank today."
)

HTML = "\n".join(
    [
        '<div><a href="/h">Home</a> <a href="/b">Blog</a></div>',  # link-dense
        "<h1>Title</h1>",  # too short
        f"<p>{ARTICLE}</p>",  # content
        f"<p>{ARTICLE} See also <a href=\"/m\">more</a>.</p>",  # content w/ 1 link
        '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>',
    ]
)


def _run(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return extract_main_content(df).collect()[0]


def test_extracts_article_lines(spark):
    r = _run(spark, HTML)
    assert r.n_lines == 5
    assert r.n_content_lines == 2
    lines = r.main_text.split("\n")
    assert lines[0] == ARTICLE
    assert lines[1] == f"{ARTICLE} See also more."
    assert r.content_chars == sum(len(x) for x in lines)


def test_all_boilerplate_yields_empty(spark):
    r = _run(spark, '<div><a href="/x">x</a></div>\n<h1>Hi</h1>')
    assert r.n_content_lines == 0
    assert r.main_text == ""
    assert r.content_chars == 0


def test_link_density_rule(spark):
    # 35 chars of text but two links -> needs >= 40 -> dropped
    dense = '<p>exactly thirty-five chars of text!! <a href="/a">a</a> <a href="/b">b</a></p>'
    r = _run(spark, dense)
    assert r.n_content_lines == 0


def test_plan_no_shuffle_no_python(spark):
    df = spark.createDataFrame([(1, HTML)], "doc_id long, html string")
    plan = (
        extract_main_content(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
