"""Charset decode parity with the reference's encoding table
(``libbeat/reader/readfile/encoding/encoding.go``): round-trip every
supported name over text exercising that charset's non-ASCII range,
BOM handling per ``utf16.go``, plain passthrough, unknown-name error.
"""

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.encoding import (ENCODINGS, decode_charset,
                                            decode_text_field,
                                            resolve_encoding)

# text per charset chosen to hit its distinctive code points
_SAMPLES = {
    "utf-8": "héllo wörld — ☃",
    "iso8859-1": "héllo wörld ±µ",
    "iso8859-5": "привет мир",
    "iso8859-7": "γειά σου",
    "windows1251": "привет мир",
    "windows1252": "héllo “quoted” —",
    "windows874": "สวัสดี",
    "koi8r": "привет",
    "cp437": "héllo ░▒▓",
    "cp866": "привет",
    "ebcdic-037": "HELLO WORLD 123",
    "gbk": "你好世界",
    "macintosh": "héllo wörld",
    "macintosh-cyrillic": "привет",
}


@pytest.mark.parametrize("name,text", sorted(_SAMPLES.items()))
def test_roundtrip(spark, name, text):
    codec = resolve_encoding(name)
    raw = text.encode(codec)
    df = spark.createDataFrame([(bytearray(raw),), (None,)],
                               "payload binary")
    out = decode_text_field(df, "payload", encoding=name,
                            target="text").collect()
    got = {r["text"] for r in out}
    assert got == {text, None}


def test_htmlindex_style_fallthrough(spark):
    # names outside the explicit table resolve via the codec registry,
    # like the reference's htmlindex fallthrough
    for name, text in [("shift_jis", "こんにちは"), ("euc-kr", "안녕"),
                       ("big5", "你好"), ("gb18030", "你好")]:
        raw = text.encode(resolve_encoding(name))
        df = spark.createDataFrame([(bytearray(raw),)], "payload binary")
        assert decode_charset(F.col("payload"), name).alias("t") is not None
        got = df.select(decode_charset(F.col("payload"), name)
                        .alias("t")).collect()[0]["t"]
        assert got == text


@pytest.mark.parametrize("name,enc", [
    ("utf-16-bom", "utf-16"),            # BOM written by the codec
    ("utf-16be-bom", "utf-16-be"),       # no BOM → stated endianness
    ("utf-16le-bom", "utf-16-le"),
])
def test_utf16_bom_variants(spark, name, enc):
    text = "héllo utf16"
    raw = text.encode(enc)
    df = spark.createDataFrame([(bytearray(raw),)], "payload binary")
    got = df.select(decode_charset(F.col("payload"), name)
                    .alias("t")).collect()[0]["t"]
    assert got == text


def test_utf16_bom_overrides_endianness(spark):
    # a LE BOM in the stream wins over the be-bom default, utf16.go
    text = "bom wins"
    raw = text.encode("utf-16-le")
    import codecs as c
    df = spark.createDataFrame([(bytearray(c.BOM_UTF16_LE + raw),)],
                               "payload binary")
    got = df.select(decode_charset(F.col("payload"), "utf-16be-bom")
                    .alias("t")).collect()[0]["t"]
    assert got == text


def test_plain_is_byte_passthrough(spark):
    raw = bytes(range(1, 128))
    df = spark.createDataFrame([(bytearray(raw),)], "payload binary")
    got = df.select(decode_charset(F.col("payload"), "plain")
                    .alias("t")).collect()[0]["t"]
    assert got.encode("latin-1") == raw


def test_unknown_encoding_raises():
    with pytest.raises(ValueError, match="unknown encoding"):
        resolve_encoding("klingon-8")


def test_utf8_stays_jvm_side(spark):
    df = spark.createDataFrame([(bytearray(b"abc"),)], "payload binary")
    out = df.select(decode_charset(F.col("payload"), "utf-8").alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_table_is_complete():
    # every name in the reference's table resolves
    for name in ENCODINGS:
        resolve_encoding(name)
