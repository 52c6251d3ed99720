"""Compute the next round's _PRIORITY list from recorded driver results.

The driver's CORRECTNESS file only records the first 50 registered keys
per round, so dict order decides which operators get the hard
driver-vs-DuckDB signal. The standing rotation policy
(cloud2sql_spark/registry.py:_PRIORITY) orders keys as:

  1. keys whose LATEST driver row is red (repair + re-prove first);
  2. keys changed since their last green row (pass their names as CLI
     args — code changes are invisible to this script);
  3. keys with no driver row at all (new registrations);
  4. stalest-first re-proofs (oldest latest-green round, alphabetical
     within a round) filling the remaining slots.

Usage: python scripts/rotation_plan.py [changed-key ...]
Prints a summary table plus a ready-to-paste Python list of the first
50 keys (and the overflow), so building next round's window is
mechanical instead of hand-counted.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SLOTS = 50
# How many queued keys the carryover comment previews (the queue itself is
# the full overflow list, stalest-first — see the printed header).
CARRYOVER_PREVIEW = 10


def latest_rows() -> dict[str, tuple[int, bool]]:
    """key -> (round of most recent driver row, was it green)."""
    out: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for key, row in data.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") is not False)
                and not row.get("err")
            )
            out[key] = (rnd, green)  # later files overwrite: latest wins
    return out


def main() -> None:
    changed = list(dict.fromkeys(sys.argv[1:]))  # dedup, keep order
    from cloud2sql_spark.registry import queries

    registered = list(queries())
    rows = latest_rows()
    stale_rows = {k: v for k, v in rows.items() if k not in registered}

    reds = sorted(k for k in registered if k in rows and not rows[k][1])
    untested = sorted(k for k in registered if k not in rows)
    unknown_changed = [k for k in changed if k not in registered]
    # a changed key that is red or never-tested already holds a slot in
    # its own segment — keeping it in `changed` too would double-count
    # it and silently push a legitimate stale key out of the window
    changed = [
        k
        for k in changed
        if k in registered and k not in reds and k not in untested
    ]
    covered = set(reds) | set(changed) | set(untested)
    rest = sorted(
        (k for k in registered if k not in covered and k in rows),
        key=lambda k: (rows[k][0], k),
    )

    plan = reds + changed + untested + rest
    window, overflow = plan[:SLOTS], plan[SLOTS:]

    print(f"registered: {len(registered)}  with driver rows: "
          f"{len(registered) - len(untested)}  reds: {len(reds)}  "
          f"changed (given): {len(changed)}  never-tested: {len(untested)}")
    if unknown_changed:
        print(f"WARNING: changed keys not in registry: {unknown_changed}")
    if stale_rows:
        print(f"note: {len(stale_rows)} recorded keys no longer registered "
              f"(renames/removals): {sorted(stale_rows)[:5]}...")
    by_round: dict[int, int] = {}
    for k in window:
        rnd = rows.get(k, (0, False))[0]
        by_round[rnd] = by_round.get(rnd, 0) + 1
    print("window staleness (round -> slots; 0 = never tested):",
          dict(sorted(by_round.items())))
    free = max(0, SLOTS - len(reds) - len(changed) - len(untested))
    print(f"free slots for NEW registrations next round (cap): {free}")

    print(f"\n_PRIORITY window ({len(window)} keys):")
    print("_PRIORITY = [")
    for k in window:
        print(f'    "{k}",')
    print("]")
    if overflow:
        # PREVIEW only (ADVICE r07): the real next-round queue is ALL of
        # `overflow`, stalest-first; this just shows its head so the
        # printed plan stays short.
        nxt = overflow[:CARRYOVER_PREVIEW]
        print(f"\n# next-round carryover preview (first {len(nxt)} of "
              f"{len(overflow)} queued keys, stalest-first):")
        for k in nxt:
            print(f"#   {k} (r{rows[k][0]:02d})")


if __name__ == "__main__":
    main()
