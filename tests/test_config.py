"""YAML config front door: a Beats-style filebeat.yml compiles to the
engine's processor chain + outil selector and runs end to end."""

import pytest
from pyspark.sql import functions as F

from beats_spark.config import load_pipeline, _unflatten


YML = """
processors:
  - add_fields:
      target: svc
      fields:
        env: prod
  - uppercase:
      fields: [level]
  - drop_event:
      when:
        equals:
          level: "TRACE"
output.elasticsearch:
  index: "logs-%{[lang]}-%{+yyyy.MM.dd}"
  indices:
    - index: "errors-%{[lang]}"
      when:
        equals:
          level: "ERROR"
    - index: "audit"
      when:
        contains:
          message: "audit"
"""


@pytest.fixture
def events(spark):
    rows = [
        (1, "error", "en", "boom", "2024-03-05 10:00:00"),
        (2, "info", "de", "all fine", "2024-03-05 10:00:00"),
        (3, "info", "en", "audit trail entry", "2024-03-05 10:00:00"),
        (4, "trace", "fr", "noise", "2024-03-05 10:00:00"),
    ]
    return (spark.createDataFrame(
        rows, "id int, level string, lang string, message string, ts string")
        .withColumn("@timestamp", F.to_timestamp("ts")).drop("ts"))


def test_yaml_pipeline_end_to_end(spark, events):
    pipe = load_pipeline(YML)
    assert pipe.output_kind == "elasticsearch"
    out = pipe(events).collect()
    by_id = {r["id"]: r for r in out}
    assert set(by_id) == {1, 2, 3}                     # trace dropped
    assert by_id[1]["sink"] == "errors-en"             # first rule wins
    assert by_id[3]["sink"] == "audit"                 # second rule
    assert by_id[2]["sink"] == "logs-de-2024.03.05"    # index fallback
    assert all(r["svc_env"] == "prod" for r in out)
    assert by_id[1]["level"] == "ERROR"                # uppercase ran


def test_dotted_and_nested_forms_are_equivalent(spark, events):
    dotted = {
        "output.elasticsearch.index": "x-%{[lang]}",
        "processors": [{"add_tags": {"tags": ["t1"]}}],
    }
    nested = {
        "output": {"elasticsearch": {"index": "x-%{[lang]}"}},
        "processors": [{"add_tags": {"tags": ["t1"]}}],
    }
    a = load_pipeline(dotted)(events).select("id", "sink", "tags")
    b = load_pipeline(nested)(events).select("id", "sink", "tags")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kafka_topics_preserve_case(spark, events):
    cfg = {
        "output": {"kafka": {
            "topic": "Events-%{[lang]}",
            "topics": [{"topic": "Errors",
                        "when": {"equals": {"level": "error"}}}],
        }},
    }
    out = {r["id"]: r["sink"] for r in load_pipeline(cfg)(events).collect()}
    assert out[1] == "Errors"
    assert out[2] == "Events-de"   # kafka topics keep case


def test_es_selector_lowercases(spark, events):
    cfg = {"output": {"elasticsearch": {"index": "LOGS-%{[lang]}"}}}
    sinks = {r["sink"] for r in load_pipeline(cfg)(events).collect()}
    assert sinks == {"logs-en", "logs-de", "logs-fr"}


def test_processors_only_config(spark, events):
    pipe = load_pipeline("processors:\n  - lowercase:\n      fields: [message]\n")
    out = pipe(events)
    assert "sink" not in out.columns
    assert out.filter(F.col("message") == "boom").count() == 1


def test_unflatten_merges():
    got = _unflatten({
        "output.elasticsearch.index": "a",
        "output": {"elasticsearch": {"indices": [{"index": "b"}]}},
    })
    assert got["output"]["elasticsearch"]["index"] == "a"
    assert got["output"]["elasticsearch"]["indices"] == [{"index": "b"}]


def test_unknown_output_raises(events):
    with pytest.raises(ValueError, match="unsupported output"):
        load_pipeline({"output": {"redis": {}}})


def test_dotted_keys_inside_list_entries(spark, events):
    # the canonical docs spelling nests dotted keys inside list
    # entries: when.contains under an indices rule, and a dotted
    # processor body — both must unflatten or the rule compiles
    # unguarded and matches every event
    yml = """
processors:
  - drop_event:
      when.equals:
        level: "trace"
output.elasticsearch:
  index: "fallback"
  indices:
    - index: "err-idx"
      when.contains:
        message: "boom"
"""
    pipe = load_pipeline(yml)
    out = {r["id"]: r["sink"] for r in pipe(events).collect()}
    assert out == {1: "err-idx", 2: "fallback", 3: "fallback"}
