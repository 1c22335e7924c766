"""Report driver-slot coverage across rounds — the rotation helper.

The round driver records only the FIRST 50 `queries()` entries in its
CORRECTNESS file. This script reads every CORRECTNESS_r*.json in the
repo root and reports, for each registered query, which rounds gave
it a driver row — so the next round's _MUST_VERIFY list can rotate
in whichever queries have gone longest without external signature.

    python scripts/rotate_slots.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entry

    registered = list(entry.queries())
    rounds: dict[str, set[str]] = {}
    for fp in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = os.path.basename(fp)[len("CORRECTNESS_"):-len(".json")]
        rounds[rnd] = set(json.load(open(fp)))
    never, stale = [], []
    print(f"{'query':38s} driver rows")
    for q in registered:
        seen = [r for r, keys in rounds.items() if q in keys]
        print(f"{q:38s} {' '.join(seen) if seen else '-'}")
        if not seen:
            never.append(q)
        elif seen[-1] != max(rounds):
            stale.append(q)
    print(f"\nregistered: {len(registered)}  rounds: {sorted(rounds)}")
    print(f"never driver-verified ({len(never)}): {never}")
    print(f"not in the LATEST round's 50 ({len(stale)}): {stale[:20]}"
          f"{' ...' if len(stale) > 20 else ''}")
    print("\nrotation rule: put `never` first, then the longest-stale, "
          "into _MUST_VERIFY (cap 50); stable 2x-green queries fill "
          "the rest via _STABLE_PREFERRED.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
