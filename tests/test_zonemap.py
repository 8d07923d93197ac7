"""File-level zone maps: every data-writing commit records per-file
min/max column stats from the parquet footers it already reads;
read(ranges=...) must (a) return exactly the filtered rows, (b) skip
provably-disjoint plain files, (c) prune delta-resolved buckets only
whole -- never a single delta/tombstone out of a touched bucket -- and
(d) survive cow/compact rewrites with stale stats swept from the
manifest."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from yadamu___yet_another_data_migration_utility_spark.sources.laketable import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

JAN = dt.datetime(2020, 1, 15)
FEB = dt.datetime(2020, 2, 15)
MAR = dt.datetime(2020, 3, 15)
FEB_RANGE = (dt.datetime(2020, 2, 1), dt.datetime(2020, 2, 28))


def mk(root, mode="mor"):
    return LakeTable.create(root, SCHEMA, key="url", bucket_count=4,
                            merge_mode=mode)


def rows(spark, month_ts, prefix, n=8, op=None):
    data = [
        (f"{prefix}{i}", month_ts, float(i))
        + ((op, i + 1) if op else ())
        for i in range(n)
    ]
    cols = "url string, ts timestamp, value double"
    if op:
        cols += ", op string, lsn long"
    return spark.createDataFrame(data, cols)


def n_files(plan):
    return len(plan["plain"]) + len(plan["delta_resolved"])


def assert_read_equals_filter(spark, t, ranges):
    got = {tuple(map(str, r)) for r in t.read(spark, ranges=ranges).collect()}
    lo, hi = ranges["ts"]
    exp = {
        tuple(map(str, r))
        for r in t.read(spark)
        .filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
        .collect()
    }
    assert got == exp


def test_append_files_prune_by_time_range(spark, tmp_path):
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"), batch_id=0)
    t.append(spark, rows(spark, FEB, "b"), batch_id=1)
    t.append(spark, rows(spark, MAR, "c"), batch_id=2)
    full = n_files(t.plan_files())
    feb = t.plan_files(ranges={"ts": FEB_RANGE})
    assert not feb["delta_resolved"]
    # only the Feb append's files survive the plan: every survivor
    # comes from ONE commit dir (batch 1's), and files were dropped
    assert 0 < n_files(feb) < full
    assert len({f.split("/")[1] for f in feb["plain"]}) == 1
    assert_read_equals_filter(spark, t, {"ts": FEB_RANGE})
    got = t.read(spark, ranges={"ts": FEB_RANGE})
    assert got.count() == 8
    assert {r["url"][0] for r in got.collect()} == {"b"}
    # open-ended range
    assert t.read(spark, ranges={"ts": (MAR, None)}).count() == 8


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_merged_data_prunes_and_stays_exact(spark, tmp_path, mode):
    # the MAR batch carries 2 keys (<= 2 of 4 buckets touched), so the
    # untouched buckets hold only Jan files and a [MAR, inf) plan can
    # actually drop them; in mor a touched bucket stays whole
    t = mk(str(tmp_path / "t"), mode=mode)
    t.merge(spark, rows(spark, JAN, "a", op="I"), batch_id=0)
    t.merge(spark, rows(spark, MAR, "c", n=2, op="I"), batch_id=1)
    full = n_files(t.plan_files())
    pruned = t.plan_files(ranges={"ts": (MAR, None)})
    assert 0 < n_files(pruned) < full
    assert_read_equals_filter(spark, t, {"ts": FEB_RANGE})
    assert t.read(spark, ranges={"ts": (MAR, None)}).count() == 2
    assert t.read(spark, ranges={"ts": FEB_RANGE}).count() == 0


def test_delta_bucket_prunes_whole_never_partially(spark, tmp_path):
    """A bucket with deltas is only skipped when EVERY file in it is
    disjoint; otherwise all its files (incl. out-of-range deltas) stay
    in the plan so LWW resolution sees the bucket entire."""
    t = mk(str(tmp_path / "t"))
    t.merge(spark, rows(spark, JAN, "a", op="I"), batch_id=0)
    # second merge UPDATES the same keys with Mar timestamps (and HIGHER
    # lsns -- an equal-lsn "update" is a tie, which the deterministic
    # content rank resolves arbitrarily, not in arrival order): every
    # touched bucket now holds both Jan and Mar delta files
    t.merge(spark, rows(spark, MAR, "a", op="U").withColumn(
        "lsn", F.col("lsn") + 100), batch_id=1)
    plan = t.plan_files(ranges={"ts": (MAR, None)})
    # buckets are touched by both batches -> kept whole (Jan files too)
    assert plan["delta_resolved"] and n_files(plan) == n_files(t.plan_files())
    got = t.read(spark, ranges={"ts": (MAR, None)})
    assert got.count() == 8  # the Mar winners
    # a Jan-window read must NOT resurrect the superseded Jan rows
    assert t.read(spark, ranges={"ts": (JAN, dt.datetime(2020, 1, 31))}).count() == 0


def test_tombstones_cannot_be_pruned_away(spark, tmp_path):
    t = mk(str(tmp_path / "t"))
    t.merge(spark, rows(spark, JAN, "a", op="I"), batch_id=0)
    # delete half the keys: tombstones carry NULL payload (no ts stats)
    dels = rows(spark, JAN, "a", n=4, op="D").select(
        "url", F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("double").alias("value"), "op",
        (F.col("lsn") + 100).alias("lsn"),
    )
    t.merge(spark, dels, batch_id=1)
    got = t.read(spark, ranges={"ts": (JAN, dt.datetime(2020, 1, 31))})
    assert {r["url"] for r in got.collect()} == {f"a{i}" for i in range(4, 8)}


def test_stats_swept_on_rewrite_and_stay_bounded(spark, tmp_path):
    t = mk(str(tmp_path / "t"))
    t.merge(spark, rows(spark, JAN, "a", op="I"), batch_id=0)
    t.merge(spark, rows(spark, MAR, "c", op="I"), batch_id=1)
    t.compact(spark, all_deltas=True)
    m = t.manifest()
    ref = {f for fl in m["buckets"].values() for f in fl} | {
        f for fl in m.get("deltas", {}).items() for f in (fl[1] or [])}
    assert m.get("stats") and set(m["stats"]) <= ref  # no stale entries
    # pruning still works on the compacted files' fresh stats:
    # compaction merged Jan+Mar rows per bucket, so a Feb window prunes
    # to zero only if disjoint -- here every bucket spans Jan..Mar, so
    # the plan keeps them but the result is still exact
    assert_read_equals_filter(spark, t, {"ts": FEB_RANGE})
    # a fully-out-of-range window prunes everything
    assert n_files(t.plan_files(ranges={"ts": (dt.datetime(2021, 1, 1), None)})) == 0
    assert t.read(spark, ranges={"ts": (dt.datetime(2021, 1, 1), None)}).count() == 0


def test_append_sort_within_clusters_rows_in_files(spark, tmp_path):
    """append(sort_within=['ts']) must leave each bucket file internally
    ts-sorted so pushed-down range predicates can skip row groups inside
    files the zone maps keep."""
    import pyarrow.parquet as pq

    t = mk(str(tmp_path / "t"))
    mixed = (
        rows(spark, JAN, "a").unionByName(rows(spark, MAR, "c"))
        .unionByName(rows(spark, FEB, "b"))
    )
    t.append(spark, mixed, batch_id=0, sort_within=["ts"])
    plan = t.plan_files()
    assert plan["plain"] and not plan["delta_resolved"]
    for rel in plan["plain"]:
        ts = pq.read_table(str(tmp_path / "t" / rel), columns=["ts"])["ts"].to_pylist()
        assert ts == sorted(ts), rel
    # result unaffected by the physical clustering
    assert t.read(spark).count() == 24
    assert_read_equals_filter(spark, t, {"ts": FEB_RANGE})


def test_rebucket_and_drop_column_keep_zone_coverage(spark, tmp_path):
    """Full-rewrite maintenance ops must re-harvest zone maps for the
    files they write, or one rebucket/drop_column would permanently
    blind every future range-pruned read."""
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"), batch_id=0)
    t.rebucket(spark, 2)
    m = t.manifest()
    allf = {f for fl in m["buckets"].values() for f in fl}
    assert allf and set(m["stats"]) == allf
    assert n_files(t.plan_files(ranges={"ts": (MAR, None)})) == 0
    t2 = LakeTable.load(str(tmp_path / "t"))
    t2.drop_column(spark, "value")
    m = t2.manifest()
    allf = {f for fl in m["buckets"].values() for f in fl}
    assert allf and set(m["stats"]) == allf
    assert n_files(t2.plan_files(ranges={"ts": (MAR, None)})) == 0
    assert t2.read(spark, ranges={"ts": (JAN, FEB)}).count() == 8


def test_ranges_on_unknown_column_is_clean_error(spark, tmp_path):
    t = mk(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="unknown columns"):
        t.read(spark, ranges={"nope": (1, 2)})


def test_nan_rows_survive_open_ended_float_range(spark, tmp_path):
    """Parquet min/max EXCLUDE NaN and Spark orders NaN above every
    double, so a file pruned on max < lo could hide NaN rows that
    satisfy col >= lo. The planner must keep such files for open-ended
    upper bounds (and the zone itself is withheld when the writer
    suppressed a chunk's stats)."""
    t = mk(str(tmp_path / "t"))
    data = [("a0", JAN, 1.0), ("a1", JAN, 2.0), ("a2", JAN, float("nan"))]
    t.append(spark, spark.createDataFrame(
        data, "url string, ts timestamp, value double"), batch_id=0)
    got = t.read(spark, ranges={"value": (50.0, None)}).collect()
    # Spark: NaN >= 50.0 is true (NaN sorts above all doubles)
    assert [r["url"] for r in got] == ["a2"]
    # with BOTH bounds the NaN fails <= hi, so pruning to zero is sound
    assert t.read(spark, ranges={"value": (50.0, 60.0)}).count() == 0


def test_datetime_bound_on_date_column_never_prunes_boundary(spark, tmp_path):
    """A datetime bound on a DATE column must not string-compare against
    ISO date zones ('2020-01-16' < '2020-01-16T00:00:00' would prune the
    boundary day). Type-mismatched bounds never prune; the residual
    filter still applies them via Spark's own cast semantics."""
    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("d", T.DateType())]
    )
    t = LakeTable.create(str(tmp_path / "t"), schema, key="url", bucket_count=2)
    t.append(spark, spark.createDataFrame(
        [("a", dt.date(2020, 1, 15)), ("b", dt.date(2020, 1, 16))],
        schema), batch_id=0)
    got = t.read(spark, ranges={"d": (dt.datetime(2020, 1, 16), None)})
    assert [r["url"] for r in got.collect()] == ["b"]
    # a true date bound does prune
    plan = t.plan_files(ranges={"d": (dt.date(2021, 1, 1), None)})
    assert n_files(plan) == 0


def test_year_999_timestamp_does_not_poison_zone(spark, tmp_path):
    """strftime('%Y') would print year 999 unpadded ('999-...'), which
    sorts AFTER '2024-...' and would flip the file's zone: a window
    below 2024 would then prune the file and lose its 2024 rows."""
    t = mk(str(tmp_path / "t"))
    t.append(spark, spark.createDataFrame(
        [("bad", dt.datetime(999, 1, 1), 0.0), ("good", MAR, 1.0)],
        "url string, ts timestamp, value double"), batch_id=0)
    got = t.read(spark, ranges={"ts": (FEB, dt.datetime(2020, 6, 1))})
    assert [r["url"] for r in got.collect()] == ["good"]


def test_ts_pruning_respects_session_timezone(spark, tmp_path):
    """Naive datetime bounds are session-timezone values while footer
    stats are UTC wall-clock; the planner must convert the bound, or a
    non-UTC session would prune files holding in-range rows."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        t = mk(str(tmp_path / "t"))
        # local 2020-01-20 20:00 EST == 2020-01-21 01:00 UTC in stats
        t.append(spark, spark.createDataFrame(
            [("a", dt.datetime(2020, 1, 20, 20, 0), 1.0)],
            "url string, ts timestamp, value double"), batch_id=0)
        rng = {"ts": (None, dt.datetime(2020, 1, 20, 23, 59))}
        assert n_files(t.plan_files(ranges=rng)) == 1  # NOT pruned
        assert t.read(spark, ranges=rng).count() == 1
        # and a genuinely-disjoint local window still prunes
        assert n_files(
            t.plan_files(ranges={"ts": (dt.datetime(2020, 2, 1), None)})) == 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_cli_plan_verb_explains_pruning(spark, tmp_path, capsys):
    """`plan --range ts:...` parses bounds to the column's type from the
    manifest schema and reports scanned vs pruned file counts --
    manifest-only, no Spark session."""
    import json

    from yadamu___yet_another_data_migration_utility_spark.cli import main

    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"), batch_id=0)
    t.append(spark, rows(spark, MAR, "c"), batch_id=1)
    rc = main(["plan", "--table-root", str(tmp_path / "t"),
               "--range", "ts:2020-03-01.."])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["files_pruned"] > 0
    assert out["files_scanned"] + out["files_pruned"] == out["files_total"]
    assert out["files_scanned"] == len(out["plain"])
    # a bound with a time-of-day (':' inside LO) must parse intact
    rc = main(["plan", "--table-root", str(tmp_path / "t"),
               "--range", "ts:2020-03-01T12:30:00..2020-04-01"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["files_pruned"] > 0
    rc = main(["plan", "--table-root", str(tmp_path / "t"),
               "--range", "nope:1..2"])
    assert rc == 2
    # malformed bound and string-column bound: clean exit, no traceback
    rc = main(["plan", "--table-root", str(tmp_path / "t"),
               "--range", "ts:garbage.."])
    assert rc == 2
    rc = main(["plan", "--table-root", str(tmp_path / "t"),
               "--range", "url:a..z"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["files_pruned"] == 0  # strings never prune
    # boolean typos must error like every other type, not parse False
    schema2 = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("b", T.BooleanType())]
    )
    t2 = LakeTable.create(str(tmp_path / "t2"), schema2, key="url", bucket_count=2)
    t2.append(spark, spark.createDataFrame([("a", True)], schema2), batch_id=0)
    rc = main(["plan", "--table-root", str(tmp_path / "t2"),
               "--range", "b:maybe..true"])
    assert rc == 2


def test_stale_stats_format_is_quarantined(spark, tmp_path):
    """Zones stamped with an older stats_format must never be trusted by
    the planner (the pre-fix harvester could write unsound zones), and
    a rebase must not launder them into a freshly stamped manifest."""
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"), batch_id=0)
    assert n_files(t.plan_files(ranges={"ts": (MAR, None)})) == 0

    def downgrade(m):
        m["stats_format"] = 1

    _doctor_head(t, downgrade)
    # stale format: planner ignores the zones entirely -> no pruning
    assert n_files(t.plan_files(ranges={"ts": (MAR, None)})) == n_files(
        t.plan_files())
    # a new commit re-stamps but must NOT inherit the stale entries
    t.append(spark, rows(spark, MAR, "c"), batch_id=1)
    m = t.manifest()
    assert m["stats_format"] == 2
    jan_files = {
        f for fl in t.manifest(m["version"] - 1)["buckets"].values() for f in fl
    }
    assert not (set(m["stats"]) & jan_files)  # stale zones dropped
    # pruning works again for the freshly harvested files only
    plan = t.plan_files(ranges={"ts": (None, FEB)})
    assert all(f in jan_files for f in plan["plain"])


def test_offset_style_session_timezone_never_crashes_reads(spark, tmp_path):
    """Spark accepts offset-style timeZone values ZoneInfo cannot parse
    ('+08:00'); pruning must silently stand down, never crash the read
    -- pruning is an optimization, not a correctness dependency."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "+08:00")
    try:
        t = mk(str(tmp_path / "t"))
        t.append(spark, rows(spark, JAN, "a"), batch_id=0)
        got = t.read(spark, ranges={"ts": (MAR, None)})
        assert got.count() == 0  # residual filter still exact
        # ts bound unprunable under the unparseable tz -> full plan kept
        assert n_files(t.plan_files(ranges={"ts": (MAR, None)}, tz="+08:00")) \
            == n_files(t.plan_files())
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_plan_files_validates_columns_like_read(spark, tmp_path):
    t = mk(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="unknown columns"):
        t.plan_files(ranges={"nope": (1, 2)})


# ---------------------------------------------------------------------
# Property: for ANY batch sequence (append/merge/delete, any value
# distribution) and ANY range, the pruned read equals filter-after-read.
# Deterministic tests pin the known layouts; this pins the space between
# them (esp. zones interacting with tombstones and delta buckets).
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BATCHES = st.lists(
    st.tuples(
        st.sampled_from(["append", "merge"]),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # key idx
                st.integers(min_value=0, max_value=50),  # value
                st.sampled_from("IID"),                  # op (merge only)
            ),
            min_size=1, max_size=6,
        ),
    ),
    min_size=1, max_size=4,
)
RANGE = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
    st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=BATCHES, rng=RANGE)
def test_pruned_read_equals_filtered_read(spark, tmp_path_factory, batches, rng):
    num_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    root = str(tmp_path_factory.mktemp("zprop") / "t")
    t = LakeTable.create(root, num_schema, key="url", bucket_count=4)
    lsn = 0
    for b, (kind, events) in enumerate(batches):
        if kind == "append":
            rows_ = [(f"k{k}", v) for k, v, _ in events]
            t.append(spark, spark.createDataFrame(rows_, "url string, v long"),
                     batch_id=b)
        else:
            rows_ = []
            for k, v, op in events:
                lsn += 1
                rows_.append(
                    (f"k{k}", None if op == "D" else v, op, lsn))
            t.merge(
                spark,
                spark.createDataFrame(rows_, "url string, v long, op string, lsn long"),
                batch_id=b,
            )
    lo, hi = rng
    got = sorted(
        map(tuple, t.read(spark, ranges={"v": (lo, hi)}).collect()))
    base = t.read(spark)
    if lo is not None:
        base = base.filter(F.col("v") >= lo)
    if hi is not None:
        base = base.filter(F.col("v") <= hi)
    assert got == sorted(map(tuple, base.collect()))


def _doctor_head(t, mutate):
    """Test-only corruption injection: rewrite the head manifest file in
    place (production manifests are immutable; fsck exists precisely for
    manual surgery like this)."""
    import json

    m = t.manifest()
    mutate(m)
    with open(t._manifest_path(m["version"]), "w") as fh:
        json.dump(m, fh)


def test_fsck_flags_stale_and_malformed_stats(spark, tmp_path):
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"), batch_id=0)
    assert t.validate()["ok"]

    def bad(m):
        m["stats"]["ghost/file.parquet"] = {"value": [0.0, 1.0]}
        first = next(iter(f for fl in m["buckets"].values() for f in fl))
        m["stats"].setdefault(first, {})["nope"] = [0.0, 1.0]
        m["stats"][first]["value"] = [9.0, 1.0]  # min > max

    _doctor_head(t, bad)
    r = t.validate()
    assert not r["ok"]
    text = "\n".join(r["issues"])
    assert "unreferenced file" in text
    assert "unknown column 'nope'" in text
    assert "min > max" in text


def test_deep_fsck_catches_narrowed_zone(spark, tmp_path):
    """A zone narrower than the file's real footer min/max is the one
    corruption that turns pruning into silent data loss -- deep fsck
    must flag it (and a clean table must pass)."""
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"), batch_id=0)
    r = t.validate(spark, deep=True)
    assert r["ok"] and r["checked"]["stats_verified"] > 0

    def narrow(m):
        rel = next(iter(m["stats"]))
        lo, hi = m["stats"][rel]["value"]
        m["stats"][rel]["value"] = [lo + 0.5, hi]

    _doctor_head(t, narrow)
    r = t.validate(spark, deep=True)
    assert not r["ok"]
    assert any("narrower than footer" in i for i in r["issues"])


def test_numeric_ranges_and_missing_stats_are_safe(spark, tmp_path):
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"), batch_id=0)
    # value in [3, 5] -- numeric zone maps
    got = t.read(spark, ranges={"value": (3.0, 5.0)})
    assert sorted(r["url"] for r in got.collect()) == ["a3", "a4", "a5"]
    # a mistyped bound must not crash the planner or wrongly prune
    plan = t.plan_files(ranges={"value": ("x", None)})
    assert n_files(plan) == n_files(t.plan_files())


# ---------------------------------------------------------------------------
# delete_where: predicate DELETE as a zone-pruned copy-on-write rewrite
# ---------------------------------------------------------------------------


def test_delete_where_rewrites_only_matching_files(spark, tmp_path):
    """Files provably disjoint from the range carry over by reference
    (same relative paths); only candidate files rewrite. The summary
    reports the rewrite footprint."""
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"))
    jan_files = {f for fl in t.manifest()["buckets"].values() for f in fl}
    t.append(spark, rows(spark, FEB, "b"))
    all_files = {f for fl in t.manifest()["buckets"].values() for f in fl}
    n_feb_files = len(all_files - jan_files)

    v, n = t.delete_where(spark, predicate="value >= 4.0", ranges={"ts": FEB_RANGE})
    assert v == t.current_version() and n == 4  # b4..b7
    m = t.manifest()
    kept_files = {f for fl in m["buckets"].values() for f in fl}
    assert jan_files <= kept_files  # untouched, not rewritten
    assert m["summary"]["files_rewritten"] == n_feb_files
    got = {r["url"] for r in t.read(spark).collect()}
    assert got == {f"a{i}" for i in range(8)} | {f"b{i}" for i in range(4)}
    # nothing in range -> no commit, version unchanged
    assert t.delete_where(
        spark, ranges={"ts": (dt.datetime(2021, 1, 1), dt.datetime(2021, 2, 1))}
    ) == (None, 0)
    assert t.current_version() == v


def test_delete_where_folds_delta_buckets_and_emits_changes(spark, tmp_path):
    """A delta-touched bucket resolves whole and folds to a fresh base
    (deltas cleared); the commit is a snapshot-diff boundary, so
    read_changes emits the removed rows as deletes. NULL predicate
    evaluations keep the row (SQL DELETE semantics)."""
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"))
    t.merge(spark, rows(spark, FEB, "a", op="U"), batch_id=1)  # all keys updated
    t.append(spark, spark.createDataFrame(
        [("nullv", MAR, None)], "url string, ts timestamp, value double"))
    v_before = t.current_version()

    v, n = t.delete_where(spark, predicate="value >= 6.0")
    assert n == 2  # a6, a7 (post-update values; NULL row kept)
    m = t.manifest()
    assert not any(m["deltas"].values())  # folded
    assert m["summary"]["buckets_folded"] >= 1
    got = {(r["url"], str(r["ts"])) for r in t.read(spark, public=True)
           .select("url", "ts").collect()}
    assert got == {(f"a{i}", str(FEB)) for i in range(6)} | {("nullv", str(MAR))}

    ch = t.read_changes(spark, v_before)
    dels = {r["url"] for r in ch.filter(F.col("_change_type") == "delete").collect()}
    assert dels == {"a6", "a7"}
    # deep fsck stays clean after the fold
    rep = t.validate(spark, deep=True)
    assert rep["ok"], rep
    # the NULL row is deletable by an explicit IS NULL
    v2, n2 = t.delete_where(spark, predicate="value IS NULL")
    assert n2 == 1
    assert "nullv" not in {r["url"] for r in t.read(spark).collect()}


def test_delete_where_requires_a_condition(spark, tmp_path):
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"))
    with pytest.raises(ValueError, match="predicate and/or ranges"):
        t.delete_where(spark)


def test_update_where_old_row_semantics_and_pruning(spark, tmp_path):
    """UPDATE assignments all evaluate against the OLD row (one select,
    not chained rewrites), results cast back to the column type, and
    the rewrite is pruned to candidate files like delete_where. Updated
    rows get a fresh _lsn above the audit chain; untouched rows keep
    theirs."""
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"))
    jan_files = {f for fl in t.manifest()["buckets"].values() for f in fl}
    t.append(spark, rows(spark, FEB, "b"))

    # both assignment operands come from the OLD row; the results cast
    # back to the columns' types so the schema never drifts
    v, n = t.update_where(
        spark, {"value": "value + 100", "ts": "ts + INTERVAL 1 DAY"},
        predicate="value >= 6.0", ranges={"ts": FEB_RANGE})
    assert n == 2  # b6, b7
    m = t.manifest()
    assert m["summary"]["operation"] == "update_where"
    assert m["summary"]["rows_updated"] == 2
    # JAN files are provably disjoint from FEB_RANGE -> carried over
    assert jan_files <= {f for fl in m["buckets"].values() for f in fl}
    got = {r["url"]: (float(r["value"]), r["ts"].day, r["_lsn"])
           for r in t.read(spark).collect()}
    assert got["b6"][0] == 106.0 and got["b6"][1] == FEB.day + 1
    assert got["b7"][0] == 107.0 and got["b7"][1] == FEB.day + 1
    assert got["b5"] == (5.0, FEB.day, None)  # untouched append row
    # updated rows got the fresh stamp (chain is empty -> 1)
    assert got["b6"][2] == got["b7"][2] == 1

    # locked columns and unknown columns are clean errors
    with pytest.raises(ValueError, match="merge key / engine"):
        t.update_where(spark, {"url": "'x'"}, predicate="true")
    with pytest.raises(ValueError, match="unknown columns"):
        t.update_where(spark, {"nope": "1"}, predicate="true")
    with pytest.raises(ValueError, match="at least one assignment"):
        t.update_where(spark, {}, predicate="true")


def test_update_where_propagates_through_mirror(spark, tmp_path):
    """The fresh-LSN stamp makes an out-of-band UPDATE win the
    downstream monotonic apply: a mirror replica converges to the
    updated value across the snapshot-diff window."""
    from yadamu___yet_another_data_migration_utility_spark.streaming.stream import (
        mirror,
    )

    t = mk(str(tmp_path / "src"))
    t.merge(spark, rows(spark, JAN, "a", n=4, op="I"), batch_id=0)
    rep_root = str(tmp_path / "rep")
    mirror(spark, t, rep_root, poll_seconds=0.01)

    v, n = t.update_where(spark, {"value": "value * 10"},
                          predicate="value >= 2.0")
    assert n == 2  # a2, a3
    rep, _ = mirror(spark, t, rep_root, poll_seconds=0.01)
    src = {(r["url"], float(r["value"])) for r in t.read(spark, public=True)
           .select("url", "value").collect()}
    dst = {(r["url"], float(r["value"])) for r in rep.read(spark, public=True)
           .select("url", "value").collect()}
    assert src == dst == {("a0", 0.0), ("a1", 1.0), ("a2", 20.0), ("a3", 30.0)}


# ---------------------------------------------------------------------------
# string zone maps + key-envelope lookup pruning
# ---------------------------------------------------------------------------


def test_string_zone_maps_prune_and_stay_exact(spark, tmp_path):
    """String columns carry footer min/max envelopes (UTF-8 byte order
    == python codepoint order), so url-range scans skip disjoint files;
    the pruned read equals the filtered read and deep fsck stays
    clean."""
    t = mk(str(tmp_path / "t"))
    t.append(spark, rows(spark, JAN, "a"))
    t.append(spark, rows(spark, JAN, "b"))
    full = n_files(t.plan_files())
    plan = t.plan_files(ranges={"url": ("b", "c")})
    assert 0 < n_files(plan) < full  # a-files provably disjoint
    got = {r["url"] for r in t.read(
        spark, ranges={"url": ("b", "c")}).collect()}
    assert got == {f"b{i}" for i in range(8)}
    rep = t.validate(spark, deep=True)
    assert rep["ok"], rep


def test_oversized_string_bounds_are_not_stored(spark, tmp_path):
    """A column whose min/max exceed the cap gets no zone entry (the
    manifest must not carry document bodies), and range reads on it
    stay exact through the residual filter."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("body", T.StringType()),
    ])
    t = LakeTable.create(str(tmp_path / "t"), schema, key="url",
                         bucket_count=2)
    t.append(spark, spark.createDataFrame(
        [("a", "x" * 500), ("b", "y" * 500)], "url string, body string"))
    stats = t.manifest()["stats"]
    assert all("body" not in fz for fz in stats.values())
    assert any("url" in fz for fz in stats.values())  # short col still zoned
    got = {r["url"] for r in t.read(
        spark, ranges={"body": ("y", "z")}).collect()}
    assert got == {"b"}


def test_lookup_prunes_files_by_key_envelope(spark, tmp_path):
    """Point lookups ride the [min(keys), max(keys)] envelope through
    the key zone maps: with url-disjoint files in ONE bucket, a lookup
    plans only the file(s) that can hold the keys -- the plan the read
    executes is observable via plan_files with the same range."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("val", T.StringType()),
    ])
    t = LakeTable.create(str(tmp_path / "t"), schema, key="url",
                         bucket_count=1)  # everything hashes to bucket 0
    t.append(spark, spark.createDataFrame(
        [(f"a{i}", "v1") for i in range(8)], "url string, val string")
        .coalesce(1))
    t.append(spark, spark.createDataFrame(
        [(f"b{i}", "v1") for i in range(8)], "url string, val string")
        .coalesce(1))
    assert n_files(t.plan_files()) == 2

    env = t.plan_files(ranges={"url": ("a3", "a5")})
    assert n_files(env) == 1  # the b-file is provably disjoint

    rows_ = t.lookup(spark, ["a3", "a5"]).collect()
    assert {r["url"] for r in rows_} == {"a3", "a5"}
    # an envelope spanning both files still finds everything
    rows_ = t.lookup(spark, ["a7", "b0"]).collect()
    assert {r["url"] for r in rows_} == {"a7", "b0"}
    # missing keys yield no rows, with the envelope applied
    assert t.lookup(spark, ["a35"]).count() == 0
