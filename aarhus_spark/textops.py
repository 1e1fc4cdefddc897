"""Frozen text semantics — extraction E(html) and tokenizer T(text).

SURVEY.md §1.3.1-1.3.2. One shared pure implementation imported by
BOTH the Spark Arrow UDFs (operators/build.py) and the NumPy oracle
(oracle.py), so the per-row invariant "byte-identical extracted text
per url" (BASELINE.json input_hint) holds by construction and is
still asserted per url in tests.

Reference parity: the aarhus ingest layer parses emails and cleans
body text before bulk-loading into Elasticsearch [PK — SURVEY §0];
the ES `standard` analyzer tokenizes (UAX#29) + lowercases with no
stopwords and no stemming [PK]. On the ASCII corpus used for all
testing, ``tokenize`` below equals that analyzer's output exactly.

Everything here is pure Python/regex on scalars plus pandas-Series
vectorized twins (``*_series``) used inside Arrow batches — there is
never a per-row Python UDF on the Spark hot path (BASELINE.json:15).
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd

from .config import MAX_TOKEN_LEN

# E(html): decode utf-8 (errors=replace) -> drop <script>/<style>
# elements (case-insensitive, dotall) -> strip remaining tags ->
# html.unescape -> collapse whitespace -> strip.
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

# T(text): ascii alnum runs, lowercased, tokens longer than
# MAX_TOKEN_LEN dropped.
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def extract(html_bytes: bytes | None) -> str:
    """E(html) — frozen byte-identical extraction (SURVEY §1.3.1)."""
    if html_bytes is None:
        return ""
    s = html_bytes.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    s = _WS_RE.sub(" ", s)
    return s.strip()


def tokenize(text: str | None) -> list[str]:
    """T(text) — frozen tokenizer (SURVEY §1.3.2)."""
    if not text:
        return []
    return [t for t in _TOKEN_RE.findall(text.lower()) if len(t) <= MAX_TOKEN_LEN]


# ---------------------------------------------------------------------------
# Vectorized twins for Arrow batches (pandas Series in/out). These are
# the implementations the Spark pandas UDFs call; they must remain
# behaviorally identical to the scalar forms above (asserted by
# tests/test_textops.py property tests).
# ---------------------------------------------------------------------------

def extract_series(html_col: pd.Series) -> pd.Series:
    """Vectorized E over a Series of bytes/None.

    str.replace with compiled regexes is pandas-vectorized (C loop over
    the block); unescape has no vectorized form, so it is applied via
    ``map`` on the (already tag-free, usually much shorter) strings.
    """
    s = html_col.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    s = s.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.map(_htmllib.unescape)
    s = s.str.replace(_WS_RE, " ", regex=True)
    return s.str.strip()


def tokenize_series(text_col: pd.Series) -> pd.Series:
    """Vectorized T: Series[str] -> Series[list[str]]."""
    toks = text_col.fillna("").str.lower().str.findall(_TOKEN_RE)
    return toks.map(lambda ts: [t for t in ts if len(t) <= MAX_TOKEN_LEN])


# ---------------------------------------------------------------------------
# Title field extraction (multi-field indexing, operators/multifield.py):
# first <title> element's inner text, unescaped, whitespace-collapsed —
# the web-page analog of aarhus's email `subject` field [PK].
# ---------------------------------------------------------------------------

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)


def extract_title(html_bytes: bytes | None) -> str:
    """E_title(html): inner text of the first <title> element ('' when
    absent) — unescape + whitespace-collapse, same post-processing as
    E(html)."""
    if html_bytes is None:
        return ""
    s = html_bytes.decode("utf-8", errors="replace")
    m = _TITLE_RE.search(s)
    if m is None:
        return ""
    t = _htmllib.unescape(m.group(1))
    return _WS_RE.sub(" ", t).strip()


def extract_title_series(html_col: pd.Series) -> pd.Series:
    """Vectorized E_title over a Series of bytes/None (behaviorally
    identical to the scalar form — property-asserted in tests)."""
    s = html_col.map(lambda b: b.decode("utf-8", errors="replace")
                     if b is not None else "")
    t = s.str.extract(_TITLE_RE, expand=False).fillna("")
    t = t.map(_htmllib.unescape)
    return t.str.replace(_WS_RE, " ", regex=True).str.strip()
