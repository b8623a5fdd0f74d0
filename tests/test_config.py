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


# ----------------------------------------------------- filebeat.inputs:

from beats_spark.config import compile_input, _glob_to_regex


@pytest.fixture
def lines(spark):
    rows = [
        ("app/a.log", 0, "evt one"),
        ("app/a.log", 1, "  cont1"),
        ("app/a.log", 2, "evt two-very-long-line!!!"),
        ("app/a.log", 3, "noise x"),
        ("sys/b.log", 0, '{"lvl":"warn","n":"5"}'),
        ("sys/b.log", 1, '{"lvl":"info","n":"7"}'),
    ]
    return spark.createDataFrame(
        rows, "path string, line_no int, message string")


INPUTS_YML = """
filebeat.inputs:
  - type: filestream
    id: app
    paths: ["app/*.log"]
    message_max_bytes: 12
    include_lines: ['^evt']
    parsers:
      - multiline:
          pattern: '^\\s'
          negate: false
          match: after
  - type: filestream
    id: sys
    paths: ["sys/*.log"]
    tags: [sysinput]
    parsers:
      - ndjson:
          schema: "lvl string, n string"
          message_key: lvl
output.elasticsearch:
  index: "app-logs"
  indices:
    - index: "sys-%{[lvl]}"
      when:
        has_fields: [lvl]
"""


def test_inputs_full_filebeat_yml(spark, lines):
    """The complete carry-your-config-over surface: two inputs with
    different parser chains, per-input include_lines + max_bytes +
    tags, path-glob row selection, union, routing."""
    pipe = load_pipeline(INPUTS_YML)
    assert len(pipe.inputs) == 2
    out = pipe(lines).collect()
    by_sink = {}
    for r in out:
        by_sink.setdefault(r["sink"], []).append(r)
    # app events: multiline joined then truncated to 12 bytes;
    # 'noise x' dropped by include_lines AFTER the parser chain
    app = sorted(r["message"] for r in by_sink["app-logs"])
    assert app == ["evt one\n  co", "evt two-very"]
    assert all("truncated" in r["log_flags"] for r in by_sink["app-logs"])
    # sys events: ndjson parsed, message_key pulled lvl into message
    assert {r["message"] for r in by_sink["sys-warn"]} == {"warn"}
    assert {r["n"] for r in by_sink["sys-info"]} == {"7"}
    assert all(r["tags"] == ["sysinput"] for r in by_sink["sys-warn"])
    # app rows never saw the sys input's parse columns
    assert all(r["lvl"] is None for r in by_sink["app-logs"])


def test_glob_semantics_match_go_filepath():
    import re as _re
    rx = _glob_to_regex("app/*.log")
    assert _re.match(rx, "app/a.log")
    assert not _re.match(rx, "app/x/y.log")      # * stays in-segment
    assert _re.match(_glob_to_regex("app/**.log"), "app/x/y.log")
    assert _re.match(_glob_to_regex("app/?.log"), "app/a.log")
    assert not _re.match(_glob_to_regex("app/?.log"), "app/ab.log")
    assert _re.match(_glob_to_regex("l[o0]g.txt"), "l0g.txt")
    assert not _re.match(_glob_to_regex("l[!o]g.txt"), "log.txt")


def test_input_log_spellings(spark, lines):
    """Classic `log` input: max_bytes + input-level multiline compile
    to the same chain as the filestream spellings."""
    cfg = {
        "filebeat.inputs": [{
            "type": "log",
            "paths": ["app/*.log"],
            "max_bytes": 12,
            "include_lines": ["^evt"],
            "multiline": {"pattern": "^\\s", "negate": False,
                          "match": "after"},
        }],
    }
    out = load_pipeline(cfg)(lines)
    assert sorted(r["message"] for r in out.collect()) == \
        ["evt one\n  co", "evt two-very"]


def test_input_enabled_false_and_exclude(spark, lines):
    cfg = {
        "filebeat.inputs": [
            {"type": "filestream", "paths": ["app/*.log"],
             "enabled": False},
            {"type": "filestream", "paths": ["**"],
             "prospector.scanner.exclude_files": ["^sys/"],
             "exclude_lines": ["^noise", "^\\s"]},
        ],
    }
    pipe = load_pipeline(cfg)
    assert len(pipe.inputs) == 1       # disabled input dropped
    msgs = sorted(r["message"] for r in pipe(lines).collect())
    assert msgs == ["evt one", "evt two-very-long-line!!!"]


def test_input_fields_under_root_and_processors(spark, lines):
    cfg = {
        "filebeat.inputs": [{
            "type": "filestream",
            "paths": ["sys/*.log"],
            "fields": {"dc": "eu-1"},
            "fields_under_root": True,
            "processors": [{"uppercase": {"fields": ["message"]}}],
        }],
    }
    rows = load_pipeline(cfg)(lines).collect()
    assert all(r["dc"] == "eu-1" for r in rows)
    assert all(r["message"].startswith('{"LVL"') for r in rows)

    # without fields_under_root the add_fields default target applies
    cfg["filebeat.inputs"][0].pop("fields_under_root")
    rows = load_pipeline(cfg)(lines).collect()
    assert all(r["fields_dc"] == "eu-1" for r in rows)


def test_compile_input_rejects_unknown_type():
    with pytest.raises(ValueError, match="unsupported input type"):
        compile_input({"type": "tcp"})


def test_yaml_js_script_processor(spark):
    """A filebeat.yml whose processors: include a real JavaScript
    script processor (source + params) compiles through load_pipeline
    and runs — the config front door needs no special casing for JS."""
    yml = """
processors:
  - script:
      lang: javascript
      params:
        floor: 5
      source: >
        var floor = 0;
        function register(p) { floor = p.floor; }
        function process(evt) {
          if (evt.Get("n") < floor) { evt.Cancel(); return; }
          evt.Put("band", evt.Get("n") >= 10 ? "hi" : "mid");
          evt.Tag("seen");
        }
      fields:
        band: string
"""
    pipe = load_pipeline(yml)
    df = spark.createDataFrame([(i,) for i in range(15)], ["n"])
    out = pipe.chain(df) if hasattr(pipe, "chain") else pipe(df)
    rows = {r.n: r for r in out.collect()}
    assert set(rows) == set(range(5, 15))
    assert all(r.band == ("hi" if n >= 10 else "mid")
               for n, r in rows.items())
    assert all(list(r.tags) == ["seen"] for r in rows.values())


def test_input_paths_without_path_column_is_an_error(spark):
    """Two inputs with paths: over a frame lacking the path column
    must raise, not silently run both inputs over every row (which
    doubled the dataset)."""
    import pytest as _pytest
    from beats_spark.config import load_pipeline
    yml = """
filebeat.inputs:
  - type: filestream
    paths: ["/var/log/a/*.log"]
output.elasticsearch:
  index: "idx"
"""
    pipe = load_pipeline(yml)
    df = spark.createDataFrame([("m1",)], ["message"])
    with _pytest.raises(ValueError, match="no 'path' column"):
        pipe(df).collect()
