"""Regenerate ``gate_history.json`` from the driver's CORRECTNESS files.

The external correctness gate samples the HEAD ~50 entries of
``plans.QUERIES`` each round, so the catalog must iterate
least-recently-verified first.  Rather than hand-rotating a priority
list (which went stale in r3), the order is derived from
``gate_history.json``: query name -> newest round with a fully green
external row (rows + schema + hash matched, no error).

Run after each round's CORRECTNESS_r{N}.json lands::

    python -m yadamu___yet_another_data_migration_utility_spark.plans.gate_history [repo_root]

The tool scans ``CORRECTNESS_r*.json`` in the repo root (default: four
levels up from this file), folds every fully-green row into the map,
and rewrites ``gate_history.json`` next to this module.  Queries never
seen green sort as round 0 — i.e. first — so brand-new catalog entries
are automatically front-loaded for the next gate.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
HISTORY_PATH = os.path.join(_HERE, "gate_history.json")


def _row_green(v: dict) -> bool:
    """A driver row counts only when every recorded check passed.

    ``hash_match`` may be ``None`` for rows-only (non-SQL-expressible)
    checks; those still count as green per the driver's own contract.
    """
    return bool(
        v.get("rows_match")
        and v.get("schema_match")
        and (v.get("hash_match") in (True, None))
        and not v.get("err")
    )


def rebuild(repo_root: str, max_round: int | None = None) -> dict:
    """Fold every fully-green driver row into {query: newest round}.

    ``max_round`` ignores CORRECTNESS files from rounds newer than it --
    used by the regeneration-freshness test, since the driver drops a
    new round's file AFTER the last commit of that round (the committed
    map can therefore lag by exactly one round, never more)."""
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        try:
            with open(path, "r", encoding="utf-8") as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for query, verdict in rows.items():
            if isinstance(verdict, dict) and _row_green(verdict):
                last_green[query] = max(last_green.get(query, 0), rnd)
    return dict(sorted(last_green.items()))


def main(argv: list[str]) -> int:
    default_root = os.path.abspath(os.path.join(_HERE, "..", ".."))
    repo_root = argv[1] if len(argv) > 1 else default_root
    hist = rebuild(repo_root)
    with open(HISTORY_PATH, "w", encoding="utf-8") as fh:
        json.dump(hist, fh, indent=1, sort_keys=True)
        fh.write("\n")
    rounds: dict[int, int] = {}
    for rnd in hist.values():
        rounds[rnd] = rounds.get(rnd, 0) + 1
    print(f"gate_history.json: {len(hist)} queries; per-round counts "
          f"{dict(sorted(rounds.items()))}; wrote {HISTORY_PATH}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main(sys.argv))
