"""Mechanical driver-window selection (VERDICT r09 item 4).

The verification driver certifies only the FIRST 50 entries of
``__spark_entry__.queries()`` each round.  Through round 9 the window
was hand-curated; with certification debt at zero the policy is now
steady-state rotation: **each round's window is the 50 stalest
hard-oracle queries** — oldest driver-green round first, never-certified
queries (new registrations) ahead of everything, ties broken by name.
Rows-only-by-design specs (``oracle is None``) are excluded: the driver
records only a weak rows-present check for them, so a window slot is
wasted on them (their hard-oracle siblings rotate instead).

``stalest_window()`` derives the selection from the committed
``CORRECTNESS_r*.json`` ledger; ``tests/test_registry.py`` asserts the
registry's ``_DRIVER_WINDOW`` equals it, so a new round's rotation is a
mechanical re-run of ``python tools/driver_window.py`` — no curation.

A query's last-green round is the newest round whose row has
``rows_match and schema_match and (hash_match or err == 'no_oracle')``.
(``no_oracle`` rows only matter for rows-only specs, which are excluded
from the window anyway, but the ledger keeps them for completeness.)
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ledger(repo: str = REPO, upto_round: int | None = None) -> dict[str, int]:
    """query name -> newest green round number (absent = never green).

    ``upto_round`` (exclusive) pins the ledger a window was derived
    from: round N's window uses rounds < N, so the selection stays
    reproducible after the driver lands CORRECTNESS_rN itself."""
    greens: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if upto_round is not None and rnd >= upto_round:
            continue
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") or row.get("err") == "no_oracle")
            )
            if ok:
                greens[name] = max(greens.get(name, 0), rnd)
    return greens


def ever_recorded(repo: str = REPO, upto_round: int | None = None) -> set[str]:
    """Names that appear in ANY committed CORRECTNESS file (green or
    not).  Rows-only specs record ``rows_match: None`` so they never
    enter :func:`ledger`; this weaker ledger decides whether a rows-only
    spec has had its one debut driver row yet."""
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        if upto_round is not None and int(m.group(1)) >= upto_round:
            continue
        with open(path) as fh:
            seen.update(json.load(fh))
    return seen


def stalest_window(
    names: list[str],
    rows_only: set[str],
    n: int = 50,
    repo: str = REPO,
    upto_round: int | None = None,
) -> tuple[list[str], list[str]]:
    """Partition ``names`` into (window, rotation).

    ``window`` = never-driver-run rows-only debuts first (each rows-only
    spec earns exactly one window slot, for its debut rows-present
    record — VERDICT r13 item 2), then the stalest hard-oracle queries
    (never-certified first, oldest green round next, name tie-break) up
    to ``n`` total.  ``rotation`` = the rest, freshest-last, with
    already-debuted rows-only specs at the very end (they never re-enter
    the window).
    """
    last = ledger(repo, upto_round)
    seen = ever_recorded(repo, upto_round)
    hard = [q for q in names if q not in rows_only]
    debut = sorted(q for q in names if q in rows_only and q not in seen)

    def staleness(q: str) -> tuple[int, str]:
        return (last.get(q, 0), q)

    ordered = sorted(hard, key=staleness)
    n_hard = max(0, n - len(debut))
    window = debut[:n] + ordered[:n_hard]
    # overflow debuts (more never-recorded rows-only specs than window
    # slots — practically impossible, but window+rotation MUST
    # partition `names`) head the rotation: next in line to debut
    rotation = (
        debut[n:]
        + ordered[n_hard:]
        + sorted(q for q in names if q in rows_only and q in seen)
    )
    return window, rotation


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    from neo4j_to_clickhouse_spark.plans import QUERIES

    rows_only = {n for n, s in QUERIES.items() if s.oracle is None}
    from neo4j_to_clickhouse_spark.plans.queries import _WINDOW_ROUND

    window, rotation = stalest_window(
        list(QUERIES), rows_only, upto_round=_WINDOW_ROUND
    )
    last = ledger(upto_round=_WINDOW_ROUND)
    print(f"# window for round {_WINDOW_ROUND} "
          f"(ledger = rounds < {_WINDOW_ROUND})")
    print("_DRIVER_WINDOW = [")
    for q in window:
        print(f'    "{q}",  # last green: r{last.get(q, 0):02d}')
    print("]\n\n_ROTATION = [")
    for q in rotation:
        tag = "rows-only" if q in rows_only else f"r{last.get(q, 0):02d}"
        print(f'    "{q}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
