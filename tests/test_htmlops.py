"""HTML → text extraction (operators/htmlops, r9).

Goldens on real-shaped HTML plus Spark↔DuckDB parity of the oracle
builder, the curate/streaming wiring, and the plan guard (pure codegen:
no Python UDF, no shuffle).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.operators.htmlops import (
    extract_text,
    extract_text_oracle_sql,
)

REAL_PAGE = """<html><head><title>Understanding CAN Bus Timing</title>
<meta charset="utf-8"><link rel="stylesheet" href="/s.css">
<script type="text/javascript">
  var hits = 1 < 2 && 2 > 1; // tags inside <p>script</p> stay dead
  document.write("<div>injected nav</div>");
</script>
<style>nav { display: flex; } /* </style-ish comment */</style>
</head>
<body>
<!-- site chrome starts -->
<nav><a href="/">Home</a> <a href="/docs">Docs</a> <a href="/blog">Blog posts</a></nav>
<h1>Understanding CAN Bus Timing</h1>
<p>Controller Area Network frames carry their own arbitration timing, and
decoding them correctly requires knowing the &lt;bit rate&gt; of the bus &amp;
the sample point.&nbsp;This paragraph has plenty of prose.</p>
<div>Short</div>
<ul>
<li>Signals are packed little or big endian into the payload</li>
<li><a href="/ref">reference manual link</a></li>
</ul>
<table><tr><th>field width matters a lot</th><td>id</td></tr></table>
<footer><a href="/privacy">Privacy</a> | <a href="/terms">Terms of Service</a> |
<a href="/contact">Contact</a></footer>
</body></html>"""


def _duck_extract(html: str, **kw) -> str:
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT ? AS html", [html])
    return con.execute(
        f"SELECT {extract_text_oracle_sql('html', **kw)} FROM t"
    ).fetchall()[0][0]


def _spark_extract(spark, html: str, **kw) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return extract_text(df, "html", **kw).select("text").collect()[0][0]


def test_real_page_golden(spark):
    out = _spark_extract(spark, REAL_PAGE)
    lines = out.split("\n")
    # title + heading + prose + bullet + th cell survive
    assert lines[0] == "Understanding CAN Bus Timing"
    assert lines[1] == "Understanding CAN Bus Timing"
    assert lines[2].startswith("Controller Area Network frames carry")
    assert "Signals are packed little or big endian into the payload" in lines
    assert "field width matters a lot" in lines
    # entities decoded in the kept prose
    joined = "\n".join(lines)
    assert "<bit rate>" in joined and "of the bus &" in joined
    assert "&lt;" not in joined and "&amp;" not in joined and "&nbsp;" not in joined
    # boilerplate gone: nav/footer link farms, short lines, script/style
    for must_not in ("Home", "Privacy", "Terms of Service", "injected nav",
                     "display: flex", "var hits", "Short", "site chrome",
                     "reference manual link"):
        assert must_not not in joined, must_not


def test_real_page_matches_duckdb_oracle(spark):
    assert _spark_extract(spark, REAL_PAGE) == _duck_extract(REAL_PAGE)


@pytest.mark.parametrize("html", [
    "",                                                 # empty doc
    "plain words with no markup at all",                # pass-through
    "<nav><a href='/'>Home</a></nav>",                  # all boilerplate
    "<p>unclosed <b>tags are fine in this line</p>",    # broken nesting
    "<p>half <a href='x'>anchor text mass here</a> and words</p>",
    "<P CLASS='x'>UPPERCASE tags count as tags too</P>",
    "<br/>line<br />breaks<BR>of all<hr>kinds here yes",
    "a &#39;quote&#39; &amp;amp; double-encoded entity test",
    "<pre>code block text survives as a line</pre>",
])
def test_parity_spark_vs_duckdb(spark, html):
    assert _spark_extract(spark, html) == _duck_extract(html)


def test_min_words_and_link_density_knobs(spark):
    html = "<p>four words right here</p><p>two words</p>"
    assert _spark_extract(spark, html, min_words=4) == "four words right here"
    assert (_spark_extract(spark, html, min_words=2)
            == "four words right here\ntwo words")
    linky = "<p>word <a href='x'>almost all of this line is anchor text</a></p>"
    assert _spark_extract(spark, linky) == ""
    kept = _spark_extract(spark, linky, max_link_density=1.0)
    assert kept == "word almost all of this line is anchor text"


def test_drop_boilerplate_false_keeps_all_visible_lines(spark):
    html = "<nav><a href='/'>Home</a></nav><p>real prose line here</p><div></div>"
    out = _spark_extract(spark, html, drop_boilerplate=False)
    assert out == "Home\nreal prose line here"


def test_control_chars_cannot_forge_sentinels(spark):
    # \x01/\x02 in the INPUT are stripped before sentinel insertion, so
    # they can't fake anchor spans and never reach the output
    html = "\x01evil sentinel forgery attempt\x02 <p>normal words follow here</p>"
    out = _spark_extract(spark, html)
    assert "\x01" not in out and "\x02" not in out
    assert out == _duck_extract(html)


def test_plan_is_jvm_side_no_shuffle(spark):
    """extract_text is one narrow projection: no Python eval nodes and no
    exchange.  (The higher-order line filter keeps the projection outside
    whole-stage codegen — still JVM expression eval, not Python.)"""
    from tests.test_plan_quality import n_exchanges, plan_of

    df = spark.range(10).withColumn("html", F.lit("<p>a b c d</p>"))
    plan = plan_of(extract_text(df, "html"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "pythonUDF" not in plan
    assert n_exchanges(plan) == 0


def test_curate_html_front_door(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        curate,
    )

    proses = [
        "the quick brown fox jumps over the lazy dog and keeps running onward",
        "an entirely different essay describing distributed query engines today",
        "cooking with cast iron rewards patience seasoning and moderate heat",
        "mountain weather changes rapidly so carry layers and check forecasts",
    ]
    docs = spark.createDataFrame(
        [(i,
          f"<html><body><nav><a href='/'>Home</a></nav><p>{p}</p>"
          f"<footer><a href='/t'>Terms</a></footer></body></html>")
         for i, p in enumerate(proses)],
        "doc_id long, text string",
    )
    kept = curate(docs, config=CurateConfig(html_extract=True, min_quality=0.0,
                                            min_chars=10)).collect()
    assert len(kept) == 4
    by_id = {r["doc_id"]: r["text"] for r in kept}
    for i, p in enumerate(proses):
        assert by_id[i] == p
        assert "Home" not in by_id[i] and "Terms" not in by_id[i]


def test_streaming_curate_extracts_html_end_to_end(spark, tmp_path):
    """The streaming lane's HTML stage, driven through a real drain:
    JSONL docs whose text field is raw HTML land as extracted prose;
    boilerplate-only docs empty out and the min_chars gate drops them."""
    import json

    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
    )

    prose = ("a perfectly ordinary paragraph of english text long enough "
             "to clear the minimum character and quality gates easily")
    land = tmp_path / "land"
    land.mkdir()
    rows = [
        {"doc_id": 1, "lang": "en", "source": "w", "n_chars": 1,
         "text": f"<html><body><p>{prose}</p><nav><a href='/'>x</a></nav></body></html>"},
        {"doc_id": 2, "lang": "en", "source": "w", "n_chars": 1,
         "text": "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"},
    ]
    (land / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    for q in run_streaming_curate(
        spark, str(land), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        min_chars=32, min_quality=0.0, watermark="1 hour",
        available_now=True, extract_html=True,
    ):
        q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out")).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["text"] == prose


def test_full_entity_decode_matches_python_reference(spark):
    """entities='full': numeric + exotic named entities decode via the
    Arrow html.unescape kernel, control entities are stripped, and the
    named-mode prefix behavior is unchanged."""
    import html as _html

    cases = [
        "<p>numeric &#8364; euro and hex &#x2603; snowman plus words</p>",
        "<p>exotic named &mdash; entity &hellip; decodes here fine</p>",
        "<p>control entity &#1; cannot smuggle control bytes in</p>",
        "<p>core set still works &lt;x&gt; &amp; friends obviously</p>",
    ]
    df = spark.createDataFrame([(i, h) for i, h in enumerate(cases)],
                               "doc_id long, html string")
    out = {r.doc_id: r.text
           for r in extract_text(df, "html", entities="full").collect()}
    assert out[0] == "numeric € euro and hex ☃ snowman plus words"
    assert out[1] == "exotic named — entity … decodes here fine"
    assert out[2] == "control entity  cannot smuggle control bytes in"
    assert "\x01" not in out[2] and "\x02" not in out[2]
    assert out[3] == "core set still works <x> & friends obviously"
    # reference parity: full mode == named-mode output passed through
    # html.unescape + control strip
    named = {r.doc_id: r.text for r in extract_text(df, "html").collect()}
    import re
    ctrl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    for i in out:
        assert out[i] == ctrl.sub("", _html.unescape(named[i])), i

    with pytest.raises(ValueError, match="entities"):
        extract_text(df, "html", entities="everything")
