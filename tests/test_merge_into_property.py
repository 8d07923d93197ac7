"""Property-based MERGE INTO semantics: for ANY seeded table, source
batch and clause combination drawn from a paired SQL/Python vocabulary,
``LakeTable.merge_into`` must equal an independent plain-Python oracle
that applies the documented clause order (MATCHED DELETE > MATCHED
UPDATE; NOT MATCHED INSERT; BY SOURCE DELETE > BY SOURCE UPDATE), and a
replay under the same batch_id must fence to an exact no-op. The
deterministic tests in test_merge_into.py pin known cases; this pins
the space between them (clause x condition x mode interactions)."""

from __future__ import annotations

import pyspark.sql.types as T
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
    LakeTable,
)

SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("val", T.StringType()),
    T.StructField("n", T.LongType()),
])

# paired (SQL, python) conditions over a matched (t, s) pair; None = no
# condition (clause always fires). Target rows are seeded with non-null
# val/n and the oracle runs on ONE merge, so no NULL logic is needed.
MATCH_CONDS = [
    None,
    ("s.n % 2 = 0", lambda t, s: s[2] % 2 == 0),
    ("t.n > s.n", lambda t, s: t[2] > s[2]),
    ("t.val <> s.val", lambda t, s: t[1] != s[1]),
]
# conditions over a source-only row
SRC_CONDS = [None, ("s.n > 1", lambda s: s[2] > 1)]
# conditions over a target-only row (by-source clauses)
TGT_CONDS = [None, ("t.n % 2 = 1", lambda t: t[2] % 2 == 1)]

# paired update SET vocabularies: "all" or {col: sql} with a python twin
UPDATE_SETS = [
    ("all", lambda t, s: (t[0], s[1], s[2])),
    ({"val": "concat(t.val, '+', s.val)", "n": "t.n + s.n"},
     lambda t, s: (t[0], f"{t[1]}+{s[1]}", t[2] + s[2])),
]
INSERT_VALUES = [
    ("all", lambda s: (s[0], s[1], s[2])),
    ({"val": "upper(s.val)"}, lambda s: (s[0], s[1].upper(), None)),
]
BY_SOURCE_SETS = [({"val": "'stale'"}, lambda t: (t[0], "stale", t[2]))]


CASE = st.fixed_dictionaries({
    "mode": st.sampled_from(["mor", "cow"]),
    "target": st.lists(st.integers(0, 5), max_size=6, unique=True),
    "source": st.lists(st.integers(0, 7), max_size=6, unique=True),
    "delete": st.booleans(),
    "delete_cond": st.integers(0, len(MATCH_CONDS) - 1),
    "update": st.sampled_from([None, 0, 1]),
    "update_cond": st.integers(0, len(MATCH_CONDS) - 1),
    "insert": st.sampled_from([None, 0, 1]),
    "insert_cond": st.integers(0, len(SRC_CONDS) - 1),
    "by_source_delete": st.booleans(),
    "by_source_cond": st.integers(0, len(TGT_CONDS) - 1),
    "by_source_update": st.booleans(),
})


def _oracle(tgt_rows, src_rows, c):
    """Independent clause-order application over plain tuples."""
    del_c = MATCH_CONDS[c["delete_cond"]]
    upd_c = MATCH_CONDS[c["update_cond"]]
    ins_c = SRC_CONDS[c["insert_cond"]]
    bys_c = TGT_CONDS[c["by_source_cond"]]
    upd = None if c["update"] is None else UPDATE_SETS[c["update"]]
    ins = None if c["insert"] is None else INSERT_VALUES[c["insert"]]
    tgt = {r[0]: r for r in tgt_rows}
    src = {r[0]: r for r in src_rows}
    out = {}
    for k, t in tgt.items():
        s = src.get(k)
        if s is not None:  # matched: DELETE first, then UPDATE
            if c["delete"] and (del_c is None or del_c[1](t, s)):
                continue
            if upd is not None and (upd_c is None or upd_c[1](t, s)):
                out[k] = upd[1](t, s)
            else:
                out[k] = t
        else:  # not matched by source: DELETE wins over UPDATE
            if c["by_source_delete"] and (bys_c is None or bys_c[1](t)):
                continue
            if c["by_source_update"] and (bys_c is None or bys_c[1](t)):
                out[k] = BY_SOURCE_SETS[0][1](t)
            else:
                out[k] = t
    for k, s in src.items():
        if k not in tgt and ins is not None and (
                ins_c is None or ins_c[1](s)):
            out[k] = ins[1](s)
    return set(out.values())


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(c=CASE)
def test_merge_into_equals_clause_oracle(spark, tmp_path_factory, c):
    # the all-clauses-absent call is a documented ValueError, not a merge
    assume(c["delete"] or c["update"] is not None or c["insert"] is not None
           or c["by_source_delete"] or c["by_source_update"])
    # source n/val vary AGAINST the target per key so every t-vs-s
    # condition has mixed truth across matched rows: n = (i*5) % 7 sits
    # above i for some keys and below for others, and every 3rd key's
    # source val EQUALS the target's (t.val <> s.val false there)
    tgt_rows = [(f"k{i}", f"t{i}", i) for i in c["target"]]
    src_rows = [
        (f"k{i}", f"t{i}" if i % 3 == 0 else f"s{i}", (i * 5) % 7)
        for i in c["source"]
    ]
    root = str(tmp_path_factory.mktemp("mip") / "t")
    t = LakeTable.create(root, SCHEMA, key="url", bucket_count=4,
                         merge_mode=c["mode"])
    if tgt_rows:
        t.append(spark, spark.createDataFrame(tgt_rows, SCHEMA))
    src_df = spark.createDataFrame(src_rows, SCHEMA)

    def _kw():
        del_c = MATCH_CONDS[c["delete_cond"]]
        upd_c = MATCH_CONDS[c["update_cond"]]
        ins_c = SRC_CONDS[c["insert_cond"]]
        bys_c = TGT_CONDS[c["by_source_cond"]]
        return dict(
            delete=c["delete"],
            delete_condition=None if del_c is None else del_c[0],
            update_set=(None if c["update"] is None
                        else UPDATE_SETS[c["update"]][0]),
            update_condition=None if upd_c is None else upd_c[0],
            insert_values=(None if c["insert"] is None
                           else INSERT_VALUES[c["insert"]][0]),
            insert_condition=None if ins_c is None else ins_c[0],
            by_source_delete=c["by_source_delete"],
            by_source_delete_condition=None if bys_c is None else bys_c[0],
            by_source_update=(BY_SOURCE_SETS[0][0]
                              if c["by_source_update"] else None),
            by_source_update_condition=None if bys_c is None else bys_c[0],
        )

    v, counts = t.merge_into(spark, src_df, batch_id=77, **_kw())
    expect = _oracle(tgt_rows, src_rows, c)
    got = {
        (r["url"], r["val"], r["n"])
        for r in t.read(spark).select("url", "val", "n").collect()
    }
    assert got == expect

    # counts reconcile with the oracle's tallies
    before = {r[0] for r in tgt_rows}
    after_keys = {r[0] for r in expect}
    assert counts["rows_inserted"] == len(after_keys - before)
    assert counts["rows_deleted"] == len(before - after_keys)

    # exactly-once: the SAME batch_id replays as a no-op (even when the
    # first call was itself a no-op -- then the fence was never set and
    # the replay must produce the identical final state again)
    v2, counts2 = t.merge_into(spark, src_df, batch_id=77, **_kw())
    if v is not None:
        assert v2 is None and counts2.get("fenced") == 1
    got2 = {
        (r["url"], r["val"], r["n"])
        for r in t.read(spark).select("url", "val", "n").collect()
    }
    assert got2 == expect
