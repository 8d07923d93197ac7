"""CHECK constraints (Delta's ALTER TABLE ADD CONSTRAINT; NOT NULL =
``col IS NOT NULL``): manifest-versioned declarations, per-row
quarantine on the CDC apply path, whole-commit abort on bulk appends,
and the column-op guards.

Reference analogue: the per-row rejection funnel (yadamuRejectManager)
-- here the policy layer gains DECLARED predicates, not just structural
checks."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from yadamu___yet_another_data_migration_utility_spark.operators.apply import (
    BatchAborted,
    apply_batch,
    quarantine_df,
)
from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
    ConstraintViolation,
    LakeTable,
)

SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("lang", T.StringType()),
])


def _mk(spark, tmp_path, name="t", **kw):
    return LakeTable.create(str(tmp_path / name), SCHEMA, key="url",
                            bucket_count=4, **kw)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "lsn long, op string, url string, value double, lang string")


def test_lifecycle_and_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # declare-on-empty is trivially valid
    v = t.add_constraint(spark, "value_floor", "value >= 10")
    assert t.constraints() == {"value_floor": "value >= 10"}
    assert t.current_version() == v
    # duplicate name refused
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint(spark, "value_floor", "value >= 0")
    # unresolvable expression refused at DECLARE time, not in a batch
    with pytest.raises(ValueError, match="does not resolve"):
        t.add_constraint(spark, "typo", "valeu > 0")
    with pytest.raises(ValueError, match="bad constraint name"):
        t.add_constraint(spark, "no spaces", "value > 0")
    t.drop_constraint("value_floor")
    assert t.constraints() == {}
    with pytest.raises(ValueError, match="unknown constraint"):
        t.drop_constraint("value_floor")


def test_add_validates_existing_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark, spark.createDataFrame(
        [("a", 50.0, "en"), ("b", 3.0, "de")], SCHEMA))
    with pytest.raises(ValueError, match="1 existing rows"):
        t.add_constraint(spark, "value_floor", "value >= 10")
    # enforce-forward only: declared without the scan
    t.add_constraint(spark, "value_floor", "value >= 10", validate=False)
    assert "value_floor" in t.constraints()


def test_apply_quarantines_check_violations(spark, tmp_path):
    t = _mk(spark, tmp_path, merge_mode="mor")
    t.add_constraint(spark, "value_floor", "value >= 10")
    t.add_constraint(spark, "lang_known", "lang IN ('en','de')")
    log = _log(spark, [
        (1, "I", "a", 50.0, "en"),   # ok
        (2, "U", "a", 5.0, "en"),    # check:value_floor -> a stays lsn 1
        (3, "I", "b", 20.0, "de"),   # ok
        (4, "D", "b", None, None),   # deletes are exempt -> b gone
        (5, "I", "c", None, "en"),   # SQL semantics: NULL passes
        (6, "I", "d", 30.0, "xx"),   # check:lang_known
    ])
    m = apply_batch(t, log, batch_id=0, dedup="none", run_extract=False)
    assert m.rows_quarantined == 2
    assert m.rows_merged_in == 4
    state = {r["url"]: (r["value"], r["_lsn"])
             for r in t.read(spark).collect()}
    assert state == {"a": (50.0, 1), "c": (None, 5)}
    reasons = {(r["reason"], r["lsn"])
               for r in quarantine_df(spark, t).collect()}
    assert reasons == {("check:value_floor", 2), ("check:lang_known", 6)}
    # the policy layer composes: same batch under max_errors=1 aborts
    t2 = _mk(spark, tmp_path, name="t2", merge_mode="mor")
    t2.add_constraint(spark, "value_floor", "value >= 10")
    t2.add_constraint(spark, "lang_known", "lang IN ('en','de')")
    with pytest.raises(BatchAborted):
        apply_batch(t2, log, batch_id=0, dedup="none", run_extract=False,
                    max_errors=1)
    assert t2.read(spark).count() == 0


def test_append_aborts_whole(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "value_floor", "value >= 10")
    t.append(spark, spark.createDataFrame([("a", 50.0, "en")], SCHEMA))
    v = t.current_version()
    with pytest.raises(ConstraintViolation, match="value_floor"):
        t.append(spark, spark.createDataFrame(
            [("b", 20.0, "en"), ("c", 4.0, "de")], SCHEMA))
    # aborted whole: no commit, no rows, no orphan manifest refs
    assert t.current_version() == v
    assert t.read(spark).count() == 1
    assert t.validate(spark)["ok"] is True


def test_column_ops_guarded(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark, spark.createDataFrame([("a", 50.0, "en")], SCHEMA))
    t.add_constraint(spark, "value_floor", "value >= 10")
    with pytest.raises(ValueError, match="referenced by constraint"):
        t.drop_column(spark, "value")
    with pytest.raises(ValueError, match="referenced by constraint"):
        t.rename_column(spark, "value", "amount")
    # untouched columns still move freely
    t.rename_column(spark, "lang", "language")
    assert "language" in t.read(spark).columns
    t.drop_constraint("value_floor")
    t.drop_column(spark, "value")


def test_constraints_ride_commits_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path, merge_mode="mor")
    v_before = t.current_version()
    t.add_constraint(spark, "value_floor", "value >= 10")
    apply_batch(t, _log(spark, [(1, "I", "a", 50.0, "en")]),
                batch_id=0, dedup="none", run_extract=False)
    t.compact(spark)
    t.tag("audited")
    # the declaration rides every later commit's manifest spread
    assert t.constraints() == {"value_floor": "value >= 10"}
    # and is versioned: absent in the pre-declaration manifest
    assert "value_floor" not in t.manifest(v_before).get("constraints", {})
    # a change window crossing the metadata commit still reads cleanly
    assert t.read_changes(spark, v_before).count() == 1


def test_cli_constraint_verbs(spark, tmp_path, capsys):
    import json

    from yadamu___yet_another_data_migration_utility_spark.cli import main

    root = str(tmp_path / "t")
    _mk(spark, tmp_path)
    rc = main(["constraint", "--table-root", root,
               "--add", "value_floor", "--check", "value >= 10"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["added"] == "value_floor"
    rc = main(["constraint", "--table-root", root])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["constraints"] == {
        "value_floor": "value >= 10"}
    rc = main(["describe", "--table-root", root])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["constraints"] == {
        "value_floor": "value >= 10"}
    # a broken expression is a clean exit-2, not a traceback
    rc = main(["constraint", "--table-root", root,
               "--add", "typo", "--check", "valeu > 0"])
    assert rc == 2
    assert "does not resolve" in capsys.readouterr().err
    rc = main(["constraint", "--table-root", root, "--drop", "value_floor"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["dropped"] == "value_floor"


def test_update_where_enforces_checks(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark, spark.createDataFrame(
        [("a", 50.0, "en"), ("b", 20.0, "de")], SCHEMA))
    t.add_constraint(spark, "value_floor", "value >= 10")
    v = t.current_version()
    with pytest.raises(ConstraintViolation, match="value_floor"):
        t.update_where(spark, {"value": "value - 45"},
                       predicate="url = 'a'")
    assert t.current_version() == v  # aborted whole, no commit
    # a compliant assignment still lands
    nv, n = t.update_where(spark, {"value": "value + 1"},
                           predicate="url = 'a'")
    assert n == 1 and nv == v + 1
    assert t.validate(spark)["ok"] is True


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_overwrite_where_enforces_checks(spark, tmp_path, mode):
    t = _mk(spark, tmp_path, name=f"t_{mode}", merge_mode=mode)
    t.append(spark, spark.createDataFrame(
        [("a", 50.0, "en"), ("b", 20.0, "de")], SCHEMA))
    t.add_constraint(spark, "value_floor", "value >= 10")
    v = t.current_version()
    bad = spark.createDataFrame([("a", 3.0, "en")], SCHEMA)
    with pytest.raises(ConstraintViolation, match="value_floor"):
        t.overwrite_where(spark, bad, predicate="url = 'a'")
    assert t.current_version() == v
    assert {r["value"] for r in t.read(spark).collect()} == {50.0, 20.0}
    good = spark.createDataFrame([("a", 99.0, "en")], SCHEMA)
    nv, n_del, n_ins = t.overwrite_where(spark, good, predicate="url = 'a'")
    assert (n_del, n_ins) == (1, 1)
    assert {r["value"] for r in t.read(spark).collect()} == {99.0, 20.0}
    assert t.validate(spark)["ok"] is True
