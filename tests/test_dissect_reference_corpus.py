"""Run the reference's OWN dissect test corpus
(`libbeat/processors/dissect/testdata/dissect_tests.json`) through our
tokenizer — loaded from the read-only reference checkout at test time,
so parity is checked against the upstream ground truth without copying
any content into this repo. Skipped when the reference isn't mounted.
"""

import json
import os

import pytest

from beats_spark.dissect.tokenizer import Dissector, DissectError

CORPUS = ("/root/reference/libbeat/processors/dissect/testdata/"
          "dissect_tests.json")


def _cases():
    if not os.path.exists(CORPUS):
        return []
    with open(CORPUS) as f:
        return [c for c in json.load(f) if not c.get("skip")]


CASES = _cases()


@pytest.mark.skipif(not CASES, reason="reference corpus not mounted")
@pytest.mark.parametrize(
    "case", CASES, ids=[c["name"][:60].replace(" ", "_") for c in CASES])
def test_reference_corpus_case(case):
    d = Dissector(case["tok"])
    if case["expected"] is None:     # corpus marks must-fail cases
        with pytest.raises(DissectError):
            d.dissect(case["msg"])
        return
    got = d.dissect(case["msg"])
    assert got == case["expected"], case["name"]


@pytest.mark.skipif(not CASES, reason="reference corpus not mounted")
def test_reference_corpus_fast_path_agrees():
    """Where the regex fast path applies, it must match the corpus
    ground truth too."""
    import pandas as pd
    checked = 0
    for case in CASES:
        d = Dissector(case["tok"])
        rx = d.to_regex()
        if rx is None:
            continue
        pat, keys = rx
        if len(set(keys)) != len(keys):
            continue
        ext = pd.Series([case["msg"]]).str.extract(pat)
        ext.columns = keys
        if case["expected"] is None:
            assert pd.isna(ext.iloc[0][keys[0]]), case["name"]
        else:
            for k in keys:
                assert ext.iloc[0][k] == case["expected"].get(k), \
                    (case["name"], k)
        checked += 1
    assert checked >= 5  # the corpus exercises the fast path too
