"""CEF decode parity with the reference's parser test corpus.

Vectors and expectations ported from
``x-pack/filebeat/processors/decode_cef/cef/cef_test.go:15-63`` (inputs)
and its TestEventUnpack expectations (:104-480). Only expectations are
ported — the implementation is regex codegen, not the ragel machine.

Documented divergence (module docstring of beats_spark.functions.cef):
the reference's recoverExtensions pass salvages extensions from events
with a TRUNCATED header (truncatedHeader vector); here such lines yield
null header fields and no extensions.
"""

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.cef import (
    cef_extensions, cef_get, cef_header, decode_cef, kv_get,
)

# (message, expected header tuple or None, expected extensions dict)
# header tuple = (version, vendor, product, dversion, class_id, name,
# severity)
VECTORS = [
    # standardMessage (cef_test.go:16)
    (r"CEF:26|security|threatmanager|1.0|100|trojan successfully stopped|10|src=10.0.0.192 dst=12.121.122.82 spt=1232 eventId=1",
     (26, "security", "threatmanager", "1.0", "100",
      "trojan successfully stopped", "10"),
     {"src": "10.0.0.192", "dst": "12.121.122.82", "spt": "1232",
      "eventId": "1"}),
    # headerOnly
    (r"CEF:26|security|threatmanager|1.0|100|trojan successfully stopped|10|",
     (26, "security", "threatmanager", "1.0", "100",
      "trojan successfully stopped", "10"), {}),
    # emptyDeviceFields
    (r"CEF:0|||1.0|100|trojan successfully stopped|10|src=10.0.0.192 spt=1232",
     (0, "", "", "1.0", "100", "trojan successfully stopped", "10"),
     {"src": "10.0.0.192", "spt": "1232"}),
    # escapedPipeInHeader
    (r"CEF:26|security|threat\|->manager|1.0|100|trojan successfully stopped|10|src=10.0.0.192 spt=1232",
     (26, "security", "threat|->manager", "1.0", "100",
      "trojan successfully stopped", "10"),
     {"src": "10.0.0.192", "spt": "1232"}),
    # equalsSignInHeader
    (r"CEF:26|security|threat=manager|1.0|100|trojan successfully stopped|10|src=10.0.0.192 spt=1232",
     (26, "security", "threat=manager", "1.0", "100",
      "trojan successfully stopped", "10"),
     {"src": "10.0.0.192", "spt": "1232"}),
    # leadingWhitespace
    (r"CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10| src=10.0.0.192 spt=1232",
     (0, "security", "threatmanager", "1.0", "100",
      "trojan successfully stopped", "10"),
     {"src": "10.0.0.192", "spt": "1232"}),
    # errorEscapedPipeInExtension — \| is NOT a valid extension
    # escape; the field is dropped (reference: Extensions empty)
    (r"CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|moo=this\|has an escaped pipe",
     (0, "security", "threatmanager", "1.0", "100",
      "trojan successfully stopped", "10"), {}),
    # pipeInMessage — raw pipe in a value is fine
    (r"CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|moo=this|has an pipe",
     (0, "security", "threatmanager", "1.0", "100",
      "trojan successfully stopped", "10"),
     {"moo": "this|has an pipe"}),
    # errorEqualsInMessage — unescaped = in value drops the field
    (r"CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|moo=this =has = equals\=",
     (0, "security", "threatmanager", "1.0", "100",
      "trojan successfully stopped", "10"), {}),
    # escapesInExtension
    (r"CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|msg=a+b\=c x=c\\d\=z",
     (0, "security", "threatmanager", "1.0", "100",
      "trojan successfully stopped", "10"),
     {"msg": "a+b=c", "x": "c\\d=z"}),
    # errorMultipleMalformedExtensionValues — id and angle dropped,
    # parse recovers at the next well-formed pair
    (r"CEF:0|vendor|product|version|event_id|name|Very-High| msg=Hello World error=Failed because id==old_id user=root angle=106.7<=180",
     (0, "vendor", "product", "version", "event_id", "name",
      "Very-High"),
     {"msg": "Hello World", "error": "Failed because", "user": "root"}),
    # paddedMessage — non-final trailing spaces preserved minus the
    # separator; final value fully rtrimmed
    ("CEF:0|security|threatmanager|1.0|100|message is padded|10|spt=1232 msg=Trailing space in non-final extensions is  preserved    src=10.0.0.192 ",
     (0, "security", "threatmanager", "1.0", "100",
      "message is padded", "10"),
     {"spt": "1232", "src": "10.0.0.192",
      "msg": "Trailing space in non-final extensions is  preserved   "}),
    # crlfMessage
    ("CEF:0|security|threatmanager|1.0|100|message is padded|10|spt=1232 msg=Trailing space in final extensions is not preserved\t \r\n",
     (0, "security", "threatmanager", "1.0", "100",
      "message is padded", "10"),
     {"spt": "1232",
      "msg": "Trailing space in final extensions is not preserved"}),
    # tabMessage — tab/CR/LF inside a value preserved
    ("CEF:0|security|threatmanager|1.0|100|message is padded|10|spt=1232 msg=Tabs\tand\rcontrol\ncharacters are preserved\t src=127.0.0.1",
     (0, "security", "threatmanager", "1.0", "100",
      "message is padded", "10"),
     {"spt": "1232", "src": "127.0.0.1",
      "msg": "Tabs\tand\rcontrol\ncharacters are preserved\t"}),
    # tabNoSepMessage — tab is not a separator; msg swallows src= and
    # is then dropped for its unescaped =
    ("CEF:0|security|threatmanager|1.0|100|message has tabs|10|spt=1232 msg=Tab is not a separator\tsrc=127.0.0.1",
     (0, "security", "threatmanager", "1.0", "100",
      "message has tabs", "10"),
     {"spt": "1232"}),
    # escapedMessage — \n/\r decode; \\n is backslash-then-n
    (r"CEF:0|security\\compliance|threat\|->manager|1.0|100|message contains escapes|10|spt=1232 msg=Newlines in messages\nare allowed.\r\nAnd so are carriage feeds\\newlines\\\=.",
     (0, "security\\compliance", "threat|->manager", "1.0", "100",
      "message contains escapes", "10"),
     {"spt": "1232",
      "msg": "Newlines in messages\nare allowed.\r\nAnd so are "
             "carriage feeds\\newlines\\=."}),
    # error recovery with escape (beats issue 30010 vector)
    (r"CEF:0|||||||key1=\\hi= key2=a",
     (0, "", "", "", "", "", ""), {"key2": "a"}),
    # hyphenInExtensionKey
    (r"CEF:26|security|threatmanager|1.0|100|trojan successfully stopped|10|Some-Key=123456",
     (26, "security", "threatmanager", "1.0", "100",
      "trojan successfully stopped", "10"),
     {"Some-Key": "123456"}),
    # not CEF at all → null header, null extensions
    ("plain syslog line without a header", None, None),
]


@pytest.fixture(scope="module")
def decoded(spark):
    df = spark.createDataFrame(
        [(i, m) for i, (m, _, _) in enumerate(VECTORS)],
        "i int, msg string")
    rows = df.select(
        "i", cef_header(F.col("msg")).alias("h"),
        cef_extensions(F.col("msg")).alias("ext")).collect()
    return {r["i"]: r for r in rows}


@pytest.mark.parametrize("idx", range(len(VECTORS)))
def test_reference_vector(decoded, idx):
    _, header, ext = VECTORS[idx]
    r = decoded[idx]
    if header is None:
        assert all(v is None for v in r["h"].asDict().values())
        assert r["ext"] is None
        return
    got = r["h"]
    assert (got["cef_version"], got["device_vendor"],
            got["device_product"], got["device_version"],
            got["device_event_class_id"], got["name"],
            got["severity"]) == header
    assert dict(r["ext"]) == ext


def test_duplicate_key_last_wins(spark):
    # cef.go:96-101 — map overwrite on duplicate keys
    line = r"CEF:0|v|p|1|id|n|5|src=1.1.1.1 src=2.2.2.2"
    df = spark.createDataFrame([(line,)], "msg string")
    r = df.select(
        cef_get(F.col("msg"), "src").alias("one"),
        cef_extensions(F.col("msg")).alias("ext")).first()
    assert r["one"] == "2.2.2.2"
    assert dict(r["ext"]) == {"src": "2.2.2.2"}


def test_decode_cef_pruned_columns_plan(spark):
    df = spark.createDataFrame(
        [(r"CEF:0|v|p|1|id|n|5|src=1.2.3.4 spt=80 msg=hi there",)],
        "message string")
    out = decode_cef(df, keys=["src", "spt", "msg"])
    r = out.first()
    assert (r["cef_src"], r["cef_spt"], r["cef_msg"]) == \
        ("1.2.3.4", "80", "hi there")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "Exchange" not in plan


def test_processor_form(spark):
    from beats_spark.processors import compile_processors
    chain = compile_processors([
        {"decode_cef": {"field": "message",
                        "extensions": ["src", "act"]}}])
    df = spark.createDataFrame(
        [(r"CEF:1|acme|fw|2.0|42|allowed|3|src=10.1.1.1 act=permit",)],
        "message string")
    r = chain(df).first()
    assert r["cef"]["device_vendor"] == "acme"
    assert r["cef"]["cef_version"] == 1
    assert (r["cef_src"], r["cef_act"]) == ("10.1.1.1", "permit")


def test_null_and_empty_messages(spark):
    df = spark.createDataFrame([(None,), ("",), ("CEF:",)],
                               "msg string")
    rows = df.select(
        cef_header(F.col("msg")).alias("h"),
        cef_extensions(F.col("msg")).alias("e"),
        cef_get(F.col("msg"), "src").alias("g")).collect()
    for r in rows:
        assert all(v is None for v in r["h"].asDict().values())
        assert r["e"] is None and r["g"] is None


# ---- kv_get (Logstash-style quoted kv, distinct from CEF) ----------

def test_kv_get_quoted_and_plain(spark):
    df = spark.createDataFrame([
        ('user="jane doe" action=login ms=42',),
        ('action=logout user=bob ms=7 note="a \\"q\\" x"',),
        ('noise here user= action="page view"',),
        ('user=first user=second',),                  # last wins
        (None,),
    ], "msg string")
    m = F.col("msg")
    rows = df.select(kv_get(m, "user").alias("u"),
                     kv_get(m, "action").alias("a"),
                     kv_get(m, "ms").alias("ms")).collect()
    assert (rows[0]["u"], rows[0]["a"], rows[0]["ms"]) == \
        ("jane doe", "login", "42")
    assert (rows[1]["u"], rows[1]["a"], rows[1]["ms"]) == \
        ("bob", "logout", "7")
    assert rows[1]["a"] == "logout"
    assert df.select(kv_get(m, "note").alias("n")).collect()[1]["n"] \
        == 'a "q" x'
    assert (rows[2]["u"], rows[2]["a"]) == ("", "page view")
    assert rows[3]["u"] == "second"
    assert rows[4]["u"] is None
