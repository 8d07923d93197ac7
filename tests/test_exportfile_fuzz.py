"""Monolithic-import parser robustness fuzz: ``_stream_to_jsonl`` (the
clarinet/SAX role -- the incremental pull parser behind import_json)
over randomly corrupted export documents. The contract under garbage:
either a clean ``ValueError`` ("malformed export document" family --
json.JSONDecodeError is a ValueError subclass) or a successful parse
whose spilled rows are self-consistent; NEVER a stray
TypeError/KeyError/AttributeError traceback, and never a hang. The
deterministic happy-path/bounded-memory tests live in test_formats.py.

No Spark: the parser is pure driver code, so the fuzz runs hundreds of
corruptions per second."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yadamu___yet_another_data_migration_utility_spark.sources.exportfile import (
    _stream_to_jsonl,
)


def _doc() -> str:
    meta = {
        "t": {"columnNames": ["a", "b"],
              "schema": {"type": "struct", "fields": [
                  {"name": "a", "type": "long", "nullable": True,
                   "metadata": {}},
                  {"name": "b", "type": "string", "nullable": True,
                   "metadata": {}}]}},
    }
    return json.dumps({
        "systemInformation": {"vendor": "x"},
        "ddl": [],
        "metadata": meta,
        "data": {"t": [[1, "x"], [2, "y,{}"], [None, "[\"]"]]},
    })


MUT = st.one_of(
    st.none(),
    st.tuples(st.just("truncate"), st.integers(0, 400)),
    st.tuples(st.just("flip"), st.integers(0, 400),
              st.sampled_from('x}{"[],:5n')),
    st.tuples(st.just("delete"), st.integers(0, 400), st.integers(1, 12)),
    st.tuples(st.just("insert"), st.integers(0, 400),
              st.sampled_from('}{"[],:x')),
)


def _mutate(doc: str, m) -> str:
    if m is None:
        return doc
    kind, i = m[0], min(m[1], len(doc) - 1)
    if kind == "truncate":
        return doc[:i]
    if kind == "flip":
        return doc[:i] + m[2] + doc[i + 1:]
    if kind == "delete":
        return doc[:i] + doc[i + m[2]:]
    return doc[:i] + m[2] + doc[i:]


@settings(max_examples=300, deadline=None)
@given(m=MUT)
def test_stream_parser_clean_error_or_consistent_parse(tmp_path_factory, m):
    doc = _mutate(_doc(), m)
    work = tmp_path_factory.mktemp("fuzz")
    path = str(work / "doc.json")
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    try:
        head, files, _peak = _stream_to_jsonl(path, str(work))
    except ValueError:
        return  # the clean-error half of the contract (JSONDecodeError included)
    # success half: whatever was spilled must be valid JSONL, and a
    # pristine document must round-trip its rows exactly
    for p in files.values():
        with open(p, encoding="utf-8") as f:
            rows = [json.loads(ln) for ln in f]
    if m is None:
        assert [list(r.values()) for r in rows] == [
            [1, "x"], [2, "y,{}"], [None, "[\"]"]]
        assert head["metadata"]["t"]["columnNames"] == ["a", "b"]


def test_parser_converts_structural_garbage_to_valueerror(tmp_path):
    """The specific shapes that used to leak non-ValueError: a row that
    is not an array (zip over int -> TypeError), metadata that is not
    an object (AttributeError on .items)."""
    cases = [
        # data row is a scalar, not an array
        '{"metadata": {"t": {"columnNames": ["a"]}}, "data": {"t": [5]}}',
        # metadata section is an array
        '{"metadata": [1], "data": {"t": [[1]]}}',
        # a table's metadata entry is a scalar
        '{"metadata": {"t": 7}, "data": {"t": [[1]]}}',
    ]
    for doc in cases:
        p = str(tmp_path / "d.json")
        with open(p, "w", encoding="utf-8") as f:
            f.write(doc)
        with pytest.raises(ValueError):
            _stream_to_jsonl(p, str(tmp_path))


def test_parser_converts_envelope_corruption_to_valueerror(tmp_path):
    """Corrupt COMPRESSION envelopes, not just corrupt JSON: a truncated
    gzip stream (EOFError), garbage bytes behind a gzip magic
    (BadGzipFile mid-read), and a wrong decryption key (whose output is
    gzip-sniffed garbage) must all land on the clean malformed-document
    ValueError, while a genuinely missing file stays FileNotFoundError."""
    import gzip as _gzip

    import pytest as _pytest

    from yadamu___yet_another_data_migration_utility_spark.sources.filecrypto import (
        derive_key,
        encrypt_file,
    )

    # truncated gzip: compress a valid doc, cut it mid-stream
    whole = _gzip.compress(_doc().encode())
    trunc = str(tmp_path / "t.json.gz")
    with open(trunc, "wb") as f:
        f.write(whole[: len(whole) // 2])
    with _pytest.raises(ValueError):
        _stream_to_jsonl(trunc, str(tmp_path))

    # gzip magic followed by garbage
    garb = str(tmp_path / "g.json.gz")
    with open(garb, "wb") as f:
        f.write(b"\x1f\x8b" + b"\x00" * 64)
    with _pytest.raises(ValueError):
        _stream_to_jsonl(garb, str(tmp_path))

    # wrong key: a validly-encrypted document read with another
    # passphrase decrypts to garbage (UnicodeDecodeError is a
    # ValueError; a garbage gzip sniff raises BadGzipFile -- both must
    # land on the clean contract)
    plain = str(tmp_path / "p.json")
    with open(plain, "w", encoding="utf-8") as f:
        f.write(_doc())
    enc = str(tmp_path / "e.json")
    encrypt_file(plain, enc, derive_key("right"))
    with _pytest.raises(ValueError):
        _stream_to_jsonl(enc, str(tmp_path),
                         encryption_key=derive_key("wrong"))

    # valid gzip HEADER, corrupted deflate BODY (bit flips mid-file --
    # the most common real corruption): GzipFile.read raises
    # zlib.error ("Error -3 ... invalid distance"), which is NOT a
    # ValueError and must be normalized too. A high-entropy payload +
    # an early-offset flip lands in live huffman data, so the zlib
    # path (not merely EOFError) is genuinely exercised.
    import json as _json
    import random as _random

    _random.seed(7)
    rows = [["".join(_random.choice("abcdefghij0123456789")
                     for _ in range(40))] for _ in range(2000)]
    big = _json.dumps({"metadata": {"t": {"columnNames": ["a"]}},
                       "data": {"t": rows}}).encode()
    body = bytearray(_gzip.compress(big))
    body[200] ^= 0xFF
    flip = str(tmp_path / "f.json.gz")
    with open(flip, "wb") as f:
        f.write(bytes(body))
    with _pytest.raises(ValueError):
        _stream_to_jsonl(flip, str(tmp_path))

    # a missing file keeps its own contract
    with _pytest.raises(FileNotFoundError):
        _stream_to_jsonl(str(tmp_path / "nope.json"), str(tmp_path))
