"""HTML -> text extraction (beats_spark.dataops.htmltext)."""
import pytest
from pyspark.sql import functions as F

from beats_spark.dataops import extract_text, html_to_text


def _x(spark, htmls):
    df = spark.createDataFrame([(h,) for h in htmls], "h string")
    return [r.t for r in
            df.select(html_to_text(F.col("h")).alias("t")).collect()]


def test_basic_structure_and_entities(spark):
    html = ('<html><head><title>T</title></head><body>'
            '<h1>Hello &amp; welcome!</h1>'
            '<p>first para</p><p>second &lt;b&gt; para</p>'
            '</body></html>')
    (got,) = _x(spark, [html])
    assert got == "THello & welcome!\nfirst para\nsecond <b> para"


def test_script_style_comments_dropped(spark):
    html = ('<body><!-- secret --><script>if (a < b) { alert(1); }'
            '</script><style>p { x: y }</style>visible text.</body>')
    (got,) = _x(spark, [html])
    assert got == "visible text."


def test_whitespace_collapse_and_br(spark):
    html = "a   b\t c<br><br><br>d  \n  e"
    (got,) = _x(spark, [html])
    assert got == "a b c\n\nd\ne"


def test_null_and_plain_text(spark):
    got = _x(spark, [None, "no tags at all", ""])
    assert got == [None, "no tags at all", ""]


def test_extract_text_decodes_binary(spark):
    df = spark.createDataFrame([(1, "<p>hi there.</p>")], ["id", "s"]) \
              .select("id", F.encode(F.col("s"), "UTF-8").alias("html"))
    assert dict(df.dtypes)["html"] == "binary"
    out = extract_text(df).collect()[0]
    assert out.text == "hi there."


def test_strip_chain_shared_with_duckdb(spark):
    """The SQL emitter replays the identical chain on messy input."""
    import duckdb
    from beats_spark.dataops import html_strip_sql
    messy = ('<div class="x"><script a="1">var s = "</div>";</script>'
             '<h2>A &quot;B&#39;s&quot; C</h2><ul><li>one</li>'
             '<li>two</li></ul>&nbsp;tail   spaces</div>  ')
    (spark_got,) = _x(spark, [messy])
    duck_got, = duckdb.connect().execute(
        "SELECT " + html_strip_sql("'" + messy.replace("'", "''") + "'")
    ).fetchone()
    assert spark_got == duck_got
