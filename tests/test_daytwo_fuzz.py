"""Seeded random interleavings of the day-2 surfaces -- branches +
fast-forward, WAP stage/publish/abort, snapshot rollback, CHECK
constraints, additive schema evolution, compaction -- against an
independent Python model of the visible final state. The deterministic
suites pin each surface alone; this pins their COMPOSITIONS (the three
newest families interacting), the same style as the maintenance x
replay stress loops in test_streaming.py.

The model: a dict key -> row, updated by the same LWW/constraint/
fence rules the engine documents. Every committed version snapshots
the model so a rollback can restore it exactly. lsn is a global
monotonic counter (WAL semantics), so LWW is simply "latest applied
event wins"."""

from __future__ import annotations

import copy
import random

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F  # noqa: F401

from yadamu___yet_another_data_migration_utility_spark.operators.apply import (
    apply_batch,
)
from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
    LakeTable,
)

BASE = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("val", T.StringType()),
])

KEYS = [f"k{i}" for i in range(6)]


def _df(spark, rows, extra_col=None):
    cols = "url string, val string, op string, lsn long"
    if extra_col:
        cols += f", {extra_col} string"
    return spark.createDataFrame(rows, cols)


class Model:
    """Visible-state oracle: {key: {col: val, '_lsn': lsn}}."""

    def __init__(self):
        self.rows: dict[str, dict] = {}
        self.checks: dict[str, str] = {}  # name -> banned val prefix

    def apply_events(self, events, extra_col=None):
        for ev in events:
            if extra_col:
                url, val, op, lsn, extra = ev
            else:
                url, val, op, lsn = ev
                extra = None
            if op == "D":
                self.rows.pop(url, None)
                continue
            if any(val is not None and val.startswith(p)
                   for p in self.checks.values()):
                continue  # quarantined by CHECK
            row = {"url": url, "val": val, "_lsn": lsn}
            if extra_col:
                row[extra_col] = extra
            self.rows[url] = row


def _read_state(spark, t):
    cols = [f.name for f in t.schema().fields]
    out = {}
    for r in t.read(spark).collect():
        d = {c: r[c] for c in cols}
        out[d["url"]] = {k: v for k, v in d.items() if v is not None
                         or k in ("url", "val", "_lsn")}
    return out


def _model_state(m: Model):
    return {k: {c: v for c, v in row.items() if v is not None
                or c in ("url", "val", "_lsn")}
            for k, row in m.rows.items()}


@pytest.mark.parametrize("seed,backend", [(11, "local"), (23, "local"),
                                          (37, "objectfs")])
def test_day2_composition_fuzz(spark, tmp_path, seed, backend):
    rng = random.Random(seed)
    fs = None
    if backend == "objectfs":
        # the deployable pyarrow backend must survive the same random
        # compositions the POSIX backend does
        from yadamu___yet_another_data_migration_utility_spark.sources.fsio import (
            ObjectFS,
        )

        fs = ObjectFS()
    t = LakeTable.create(str(tmp_path / "lake"), BASE, key="url",
                         bucket_count=4, merge_mode="mor", fs=fs)
    model = Model()
    lsn = [0]
    bid = [0]
    snapshots: dict[int, Model] = {t.current_version(): copy.deepcopy(model)}
    extra_cols: list[str] = []

    def _events(n, extra_col=None, poison=False):
        out = []
        for _ in range(n):
            lsn[0] += 1
            k = rng.choice(KEYS)
            op = rng.choice("IIUUD")
            val = (None if op == "D"
                   else ("bad" + str(lsn[0]) if poison and rng.random() < 0.5
                         else f"v{lsn[0]}"))
            ev = [k, val, op, lsn[0]]
            if extra_col:
                ev.append(None if op == "D" else f"x{lsn[0]}")
            out.append(tuple(ev))
        return out

    def _merge(events, extra_col=None):
        bid[0] += 1
        apply_batch(t, _df(spark, events, extra_col), batch_id=bid[0],
                    run_extract=False, dedup="none")
        model.apply_events(events, extra_col)
        snapshots[t.current_version()] = copy.deepcopy(model)

    # seed data so rollback targets exist
    _merge(_events(8))

    for step in range(14):
        op = rng.choice(
            ["merge", "merge", "poison_merge", "wap", "branch",
             "rollback", "constraint", "compact", "evolve"])
        if op == "merge":
            _merge(_events(rng.randint(2, 6)))
        elif op == "poison_merge":
            # violating non-delete rows quarantine; the batch still lands
            _merge(_events(rng.randint(2, 5), poison=True))
        elif op == "evolve":
            c = f"c{len(extra_cols)}"
            extra_cols.append(c)
            _merge(_events(rng.randint(2, 4), extra_col=c), extra_col=c)
        elif op == "wap":
            bid[0] += 1
            events = _events(rng.randint(2, 4))
            t.stage_merge(spark, _df(spark, events), batch_id=bid[0])
            if rng.random() < 0.5:
                assert t.publish_staged(bid[0]) is not None
                model.apply_events(events)
                snapshots[t.current_version()] = copy.deepcopy(model)
            else:
                t.abort_staged(bid[0])  # model unchanged
        elif op == "branch":
            name = f"b{step}"
            br = t.create_branch(name)
            bevents = _events(rng.randint(2, 4))
            bid[0] += 1
            apply_batch(br, _df(spark, bevents), batch_id=bid[0],
                        run_extract=False, dedup="none")
            if rng.random() < 0.6:
                t.fast_forward(name)  # adopt: model applies
                model.apply_events(bevents)
                snapshots[t.current_version()] = copy.deepcopy(model)
            else:
                t.drop_branch(name)  # discard: model unchanged
        elif op == "rollback":
            targets = [v for v in snapshots if v < t.current_version()]
            if len(targets) < 2:
                continue
            tgt = rng.choice(targets)
            t.rollback_to(tgt)
            # the fence ledger reverts WITH the state; constraints stay
            # (they are head metadata the rollback build inherits)
            reverted = copy.deepcopy(snapshots[tgt])
            reverted.checks = dict(model.checks)
            model.rows = reverted.rows
            snapshots[t.current_version()] = copy.deepcopy(model)
        elif op == "constraint":
            if model.checks and rng.random() < 0.4:
                name = rng.choice(sorted(model.checks))
                t.drop_constraint(name)
                del model.checks[name]
            else:
                name = f"ck{step}"
                # forbid 'bad%' vals on new writes only (validate=False:
                # the current state may already hold quarant-skipped rows)
                t.add_constraint(spark, name, "val NOT LIKE 'bad%'",
                                 validate=False)
                model.checks[name] = "bad"
            snapshots[t.current_version()] = copy.deepcopy(model)
        elif op == "compact":
            t.compact(spark, all_deltas=True)
            snapshots[t.current_version()] = copy.deepcopy(model)

        assert _read_state(spark, t) == _model_state(model), (
            f"seed={seed} diverged after step {step} ({op})")

    # final fsck: the interleaving left a healthy table
    assert t.validate()["ok"]
