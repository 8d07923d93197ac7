"""Property-based MERGE semantics: for ANY event sequence (ops, keys,
batch boundaries, duplicate re-deliveries), replaying through LakeTable
in either merge mode must equal the last-writer-wins oracle computed
independently in plain Python. Hypothesis shrinks failures to minimal
sequences -- the deterministic tests pin known cases, this pins the
space between them."""

from __future__ import annotations

import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from yadamu___yet_another_data_migration_utility_spark.operators.apply import (
    last_lsn_dedup,
)
from yadamu___yet_another_data_migration_utility_spark.sources.laketable import LakeTable

SCHEMA = T.StructType(
    [T.StructField("url", T.StringType()), T.StructField("val", T.StringType())]
)

#: (key_idx 0-4, op) sequences; lsn = position + 1 (strictly increasing,
#: like a WAL); every 3rd event is re-delivered verbatim (at-least-once)
EVENTS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=4), st.sampled_from("IUD")),
    min_size=1,
    max_size=24,
)
CUTS = st.lists(st.integers(min_value=1, max_value=23), max_size=2, unique=True)
MODE = st.sampled_from(["mor", "cow"])


def _python_oracle(events):
    """Independent last-writer-wins state: dict key -> (val, lsn)."""
    state = {}
    for lsn, (k, op) in enumerate(events, start=1):
        key = f"k{k}"
        prev = state.get(key)
        if prev is not None and prev[1] >= lsn:
            continue  # stale (never happens with increasing lsn; kept for clarity)
        if op == "D":
            state[key] = (None, lsn, True)
        else:
            state[key] = (f"v{lsn}", lsn, False)
    return {
        (key, v[0], v[1]) for key, v in state.items() if not v[2]
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS, cuts=CUTS, mode=MODE)
def test_merge_equals_lww_oracle(spark, tmp_path_factory, events, cuts, mode):
    rows = [
        (f"k{k}", None if op == "D" else f"v{lsn}", op, lsn)
        for lsn, (k, op) in enumerate(events, start=1)
    ]
    # at-least-once: re-deliver every 3rd event inside its own batch
    root = str(tmp_path_factory.mktemp("prop") / "t")
    t = LakeTable.create(root, SCHEMA, key="url", bucket_count=4, merge_mode=mode)
    bounds = sorted({c for c in cuts if c < len(rows)}) + [len(rows)]
    start = 0
    for bid, end in enumerate(bounds):
        chunk = rows[start:end]
        if not chunk:
            continue
        # at-least-once delivery: every 3rd event arrives twice
        dup = [r for i, r in enumerate(chunk) if i % 3 == 0]
        df = spark.createDataFrame(chunk + dup, "url string, val string, op string, lsn long")
        if mode == "cow":
            # merge()'s contract: cow batches arrive pre-reduced to one
            # winning lsn per key -- apply it with the ENGINE's own
            # reduction (the same operator apply_batch routes through),
            # so the property fuzzes the real pre-reduction + merge
            # pipeline, duplicates included, not a test-local re-oracle
            df = last_lsn_dedup(df, key="url", lsn_col="lsn", salt_buckets=4)
        t.merge(spark, df, batch_id=bid)
        start = end
    # replay the first batch verbatim: must fence as a no-op
    first = rows[: bounds[0]]
    if first:
        r = t.merge(
            spark,
            spark.createDataFrame(first, "url string, val string, op string, lsn long"),
            batch_id=0,
        )
        assert r.fenced
    got = {
        (r["url"], r["val"], r["_lsn"])
        for r in t.read(spark).select("url", "val", "_lsn").collect()
    }
    assert got == _python_oracle(events)


# ---------------------------------------------------------------------
# same property over a COMPOSITE key: the tuple (site, page) is 1:1
# with the single key above (site = k % 2, page = k), so the oracle is
# the same LWW state re-keyed -- fuzzing arity proves the tuple paths
# (bucket hash, dedup, resolve, fence) share the single-key semantics
# ---------------------------------------------------------------------

SCHEMA2 = T.StructType(
    [T.StructField("site", T.StringType()),
     T.StructField("page", T.StringType()),
     T.StructField("val", T.StringType())]
)


def _python_oracle2(events):
    state = {}
    for lsn, (k, op) in enumerate(events, start=1):
        key = (f"s{k % 2}", f"p{k}")
        if op == "D":
            state[key] = (None, lsn, True)
        else:
            state[key] = (f"v{lsn}", lsn, False)
    return {
        (key[0], key[1], v[0], v[1])
        for key, v in state.items() if not v[2]
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS, cuts=CUTS, mode=MODE)
def test_merge_equals_lww_oracle_composite_key(
        spark, tmp_path_factory, events, cuts, mode):
    rows = [
        (f"s{k % 2}", f"p{k}", None if op == "D" else f"v{lsn}", op, lsn)
        for lsn, (k, op) in enumerate(events, start=1)
    ]
    root = str(tmp_path_factory.mktemp("prop2") / "t")
    t = LakeTable.create(root, SCHEMA2, key=["site", "page"],
                         bucket_count=4, merge_mode=mode)
    bounds = sorted({c for c in cuts if c < len(rows)}) + [len(rows)]
    start = 0
    ddl = "site string, page string, val string, op string, lsn long"
    for bid, end in enumerate(bounds):
        chunk = rows[start:end]
        if not chunk:
            continue
        dup = [r for i, r in enumerate(chunk) if i % 3 == 0]
        df = spark.createDataFrame(chunk + dup, ddl)
        if mode == "cow":
            df = last_lsn_dedup(df, key=["site", "page"], lsn_col="lsn",
                                salt_buckets=4)
        t.merge(spark, df, batch_id=bid)
        start = end
    first = rows[: bounds[0]]
    if first:
        r = t.merge(spark, spark.createDataFrame(first, ddl), batch_id=0)
        assert r.fenced
    got = {
        (r["site"], r["page"], r["val"], r["_lsn"])
        for r in t.read(spark).collect()
    }
    assert got == _python_oracle2(events)
