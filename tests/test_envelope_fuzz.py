"""Wire-decoder robustness fuzz: ``decode_debezium`` over randomly
mutated envelope lines. A CDC tail eats whatever the connector (or a
corrupted topic segment) delivers, so the decoder's contract under
garbage is load-bearing: it must never raise, must keep exact row
accounting (every non-tombstone record yields exactly one output row --
nothing vanishes before the quarantine splitter sees it), and must
still decode the cleanly-parseable records exactly. Deterministic
corrupt-record cases live in test_envelope.py; this pins the space of
truncations/flips/deletions between them."""

from __future__ import annotations

import json

import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from yadamu___yet_another_data_migration_utility_spark.sources.envelope import (
    decode_debezium,
)

PAYLOAD = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("val", T.StringType()),
    T.StructField("n", T.LongType()),
])

_I64 = 2 ** 63


def _valid_line(i: int, op: str) -> str:
    row = {"url": f"k{i % 5}", "val": f"v{i}", "n": i}
    env = {
        "op": op,
        "before": row if op in ("u", "d") else None,
        "after": None if op == "d" else row,
        "source": {"lsn": i + 1, "table": "t"},
        "ts_ms": 1700000000000 + i,
    }
    return json.dumps(env)


#: a batch of (line index, wire op, mutation) triples
MUT = st.one_of(
    st.none(),                                     # pristine
    st.tuples(st.just("truncate"), st.integers(0, 60)),
    st.tuples(st.just("flip"), st.integers(0, 60),
              st.sampled_from('x}{",:0')),
    st.tuples(st.just("delete"), st.integers(0, 50), st.integers(1, 10)),
    st.tuples(st.just("blank"), st.just(0)),       # tombstone
)
BATCH = st.lists(
    st.tuples(st.integers(0, 30), st.sampled_from("curd?"), MUT),
    min_size=1, max_size=12,
)


def _mutate(line: str, m) -> str:
    if m is None:
        return line
    kind = m[0]
    if kind == "truncate":
        return line[: min(m[1], len(line))]
    if kind == "flip":
        i = min(m[1], len(line) - 1)
        return line[:i] + m[2] + line[i + 1:]
    if kind == "delete":
        i = min(m[1], len(line))
        return line[:i] + line[i + m[2]:]
    return "   "  # blank -> tombstone


def _tame_str(v) -> bool:
    return v is None or isinstance(v, (str, int)) and not isinstance(v, bool)


def _py_decode(line: str):
    """Independent decode: None = tombstone; ('row', dict) = expected
    values; ('lax', None) = parsed but carries values whose wire
    rendering is engine-defined (non-tame types) -- accounting only."""
    if line is None or line.strip() == "":
        return None
    try:
        d = json.loads(line)
    except ValueError:
        # a deletion can leave `{valid object}garbage`: Jackson parses
        # the prefix object where strict json.loads refuses -- that
        # leniency is engine-defined, so prefix-parseable lines get the
        # accounting-only check; truly unparseable ones must decode to
        # the all-NULL quarantine shape
        try:
            json.JSONDecoder().raw_decode(line.lstrip())
        except ValueError:
            return ("row", {"lsn": None, "op": None, "url": None,
                            "val": None, "n": None})
        return ("lax", None)
    if not isinstance(d, dict):
        return ("lax", None)
    op = d.get("op")
    before, after = d.get("before"), d.get("after")
    src = d.get("source")
    image = after if after is not None else before
    lsn = src.get("lsn") if isinstance(src, dict) else None
    vals = {"url": None, "val": None, "n": None}
    if isinstance(image, dict):
        vals = {k: image.get(k) for k in ("url", "val", "n")}
    tame = (
        _tame_str(op) and _tame_str(vals["url"]) and _tame_str(vals["val"])
        and (vals["n"] is None or (isinstance(vals["n"], int)
                                   and not isinstance(vals["n"], bool)
                                   and -_I64 <= vals["n"] < _I64))
        and (lsn is None or (isinstance(lsn, int)
                             and not isinstance(lsn, bool)
                             and -_I64 <= lsn < _I64))
        and isinstance(image, (dict, type(None)))
    )
    if not tame:
        return ("lax", None)
    opm = {"c": "I", "r": "I", "u": "U", "d": "D"}
    out_op = None if op is None else opm.get(op, str(op).upper())
    return ("row", {
        "lsn": lsn if isinstance(lsn, int) else None,
        "op": out_op,
        "url": None if vals["url"] is None else str(vals["url"]),
        "val": None if vals["val"] is None else str(vals["val"]),
        "n": vals["n"],
    })


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=BATCH)
def test_decode_debezium_never_crashes_and_accounts_every_row(spark, batch):
    lines = [_mutate(_valid_line(i, op), m) for i, op, m in batch]
    df = spark.createDataFrame(
        [(ln,) for ln in lines], "value string").coalesce(1)
    out = decode_debezium(df, PAYLOAD).collect()  # must never raise

    expected = [_py_decode(ln) for ln in lines]
    survivors = [e for e in expected if e is not None]
    # exact accounting: every non-tombstone record -> exactly one row
    assert len(out) == len(survivors)

    # cleanly-parseable records decode exactly; malformed ones surface
    # as the all-NULL quarantine shape ('row' with all-None from the
    # json.loads-failure branch); engine-defined renderings skip the
    # value check but still count
    for row, exp in zip(out, survivors):
        if exp[0] != "row":
            continue
        got = {k: row[k] for k in ("lsn", "op", "url", "val", "n")}
        assert got == exp[1], f"line decoded {got}, expected {exp[1]}"
