"""Frozen-semantics tests: E(html), T(text) (SURVEY.md §1.3, §5)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from aarhus_spark.sources.fixtures import gen_pages
from aarhus_spark.textops import extract, extract_series, tokenize, tokenize_series


def test_extract_goldens():
    assert extract(b"<html><body><p>hello world</p></body></html>") == "hello world"
    assert extract(b"<script>var x = '<p>no</p>';</script>yes") == "yes"
    assert extract(b"<STYLE>p{}</STYLE>ok") == "ok"
    assert extract(b"a &amp; b &lt;tag&gt;") == "a & b <tag>"
    assert extract(b"  lots\t of \n whitespace  ") == "lots of whitespace"
    assert extract(None) == ""
    assert extract(b"\xff\xfe broken utf8") == "�� broken utf8"


def test_tokenize_goldens():
    assert tokenize("Hello, World! 42") == ["hello", "world", "42"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("a" * 65) == []          # > MAX_TOKEN_LEN dropped
    assert tokenize("a" * 64) == ["a" * 64]
    assert tokenize("The THE the") == ["the", "the", "the"]
    assert tokenize("naïve café") == ["na", "ve", "caf"]  # ascii runs only


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_tokenize_series_matches_scalar(s):
    assert tokenize_series(pd.Series([s]))[0] == tokenize(s)


@given(st.binary(max_size=400))
@settings(max_examples=200, deadline=None)
def test_extract_series_matches_scalar(b):
    assert extract_series(pd.Series([b], dtype=object))[0] == extract(b)


def test_fixture_extraction_byte_identity():
    """The per-row invariant (BASELINE.json input_hint): E(html) == text
    byte-identically for every fixture url."""
    pdf = gen_pages(300)
    ext = extract_series(pdf["html"])
    mism = (ext != pdf["text"]).sum()
    assert mism == 0
    assert (pdf["text"].str.len() > 0).all()


def test_fixture_determinism():
    a = gen_pages(200)
    b = gen_pages(200)
    pd.testing.assert_frame_equal(a, b)
