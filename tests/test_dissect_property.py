"""Property-based equivalence: for every regex-expressible dissect
pattern and arbitrary input, the vectorized fast path
(`Dissector.to_regex` + re.match) must agree exactly with the
find()-loop tokenizer — including failure cases."""

import re

import pandas as pd
from hypothesis import given, settings, strategies as st

from beats_spark.dissect.tokenizer import Dissector

# delimiters drawn from realistic log punctuation (non-empty)
_delim = st.text(alphabet=" =,;|/:[]()#\"'", min_size=1, max_size=4)
_key = st.sampled_from(["a", "b", "c", "d", "msg", ""])  # "" = skip field


@st.composite
def patterns(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    parts = [draw(_delim)]                # leading delimiter (may differ)
    keys = draw(st.lists(_key, min_size=n, max_size=n))
    for i, k in enumerate(keys):
        parts.append("%{" + k + "}")
        if i < n - 1:
            parts.append(draw(_delim))
    if draw(st.booleans()):
        parts.append(draw(_delim))        # optional trailing literal
    return "".join(parts)


_msg = st.text(alphabet=" =,;|/:[]()#\"'abcdxyz\n\t0123456789",
               max_size=60)


@settings(max_examples=300, deadline=None)
@given(pat=patterns(), msg=_msg)
def test_fast_path_equals_find_loop(pat, msg):
    try:
        d = Dissector(pat)
    except Exception:
        return  # invalid tokenizer — both paths nonexistent
    rx = d.to_regex()
    if rx is None:
        return
    rx_pat, rx_keys = rx
    if not rx_keys or len(set(rx_keys)) != len(rx_keys):
        return

    loop = d.dissect_safe(msg)
    m = re.match(rx_pat, msg) if msg else None
    if loop is None:
        assert m is None, (pat, msg)
    else:
        assert m is not None, (pat, msg)
        for k, v in zip(rx_keys, m.groups()):
            assert loop.get(k) == v, (pat, msg, k)


@settings(max_examples=100, deadline=None)
@given(pat=patterns(), msgs=st.lists(_msg, min_size=1, max_size=5))
def test_fast_path_pandas_batch(pat, msgs):
    """The pandas .str.extract batch form agrees with per-row
    dissect_safe."""
    try:
        d = Dissector(pat)
    except Exception:
        return
    rx = d.to_regex()
    if rx is None:
        return
    rx_pat, rx_keys = rx
    if not rx_keys or len(set(rx_keys)) != len(rx_keys):
        return
    ext = pd.Series(msgs, dtype="object").str.extract(rx_pat)
    ext.columns = rx_keys
    for i, msg in enumerate(msgs):
        loop = d.dissect_safe(msg)
        if loop is None:
            assert pd.isna(ext.iloc[i][rx_keys[0]]), (pat, msg)
        else:
            for k in rx_keys:
                assert ext.iloc[i][k] == loop.get(k), (pat, msg, k)
