"""Deterministic html -> text extraction (the engine's per-row invariant).

BASELINE.json#input_hint demands *byte-identical extracted text per url*
across replays and environments. Third-party HTML parsers (lxml, bs4)
drift across versions, so the extractor is a small, owned, fully
deterministic algorithm built on pandas vectorized string ops and
shipped as an Arrow-batched ``pandas_udf`` (Series -> Series) -- the
vectorized analogue of the reference's per-column transform closures
(/root/reference/src/YADAMU/file/node/eventStream.js:52-120,
/root/reference/src/YADAMU/postgres/node/postgresWriter.js:15-101),
which are row-at-a-time JS; here a whole Arrow batch is processed per
call, no per-row Python.

Algorithm (version-pinned; bump EXTRACTOR_VERSION on ANY change):
1. decode bytes as UTF-8 with U+FFFD replacement
2. drop <script>...</script>, <style>...</style>, <!-- comments -->
3. replace every remaining tag with a single space
4. decode the six common HTML entities + numeric &#NNN; references
5. collapse all whitespace runs to one space; strip ends
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_VERSION = 1

_SCRIPT = re.compile(r"(?is)<script\b.*?</script\s*>")
_STYLE = re.compile(r"(?is)<style\b.*?</style\s*>")
_COMMENT = re.compile(r"(?s)<!--.*?-->")
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")
_NUMERIC_ENT = re.compile(r"&#(\d{1,7});")

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # pinned order -- not a spec-compliant decoder; determinism is the contract
]


def _numeric_entity(match: re.Match) -> str:
    cp = int(match.group(1))
    return chr(cp) if 0 < cp <= 0x10FFFF else "�"


def extract_text_series(html: pd.Series) -> pd.Series:
    """Pure pandas implementation (shared by the UDF and golden tests)."""
    s = html.map(lambda b: b.decode("utf-8", "replace") if b is not None else None)
    mask = s.notna()
    t = s[mask]
    t = t.str.replace(_SCRIPT, " ", regex=True)
    t = t.str.replace(_STYLE, " ", regex=True)
    t = t.str.replace(_COMMENT, " ", regex=True)
    t = t.str.replace(_TAG, " ", regex=True)
    t = t.str.replace(_NUMERIC_ENT, lambda m: _numeric_entity(m), regex=True)
    for ent, ch in _ENTITIES:
        t = t.str.replace(ent, ch, regex=False)
    t = t.str.replace(_WS, " ", regex=True).str.strip()
    out = pd.Series([None] * len(s), index=s.index, dtype=object)
    out[mask] = t
    return out


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    return extract_text_series(html)
