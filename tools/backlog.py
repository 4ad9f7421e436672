"""Print the driver-verification backlog AND the evidence-age ranking
that drives the staleness-first window rotation (policy documented next
to `_FIRST50` in __spark_entry__.py, adopted round 11 per VERDICT r10
§next#1):

- backlog: registered queries never seen in any CORRECTNESS_r*.json and
  not in the current _FIRST50 window (must reach zero every round);
- age report: for every registered query, the LATEST round it appeared
  in a driver window, sorted oldest-first (ties alphabetical) — the
  window's slot-(c) candidates are read straight off the top.

Usage: python tools/backlog.py [--ages N]   (N = rows to print, def 60)
       python tools/backlog.py --freeze     (stamp WINDOW_FREEZE.json)

--freeze records a sha256 of every registry query's SOURCE + ORACLE at
window-composition time into WINDOW_FREEZE.json.  The companion test
(tests/test_registry_contract.py::test_window_freeze_covers_all_edits)
fails when any query's hash differs from the stamp and the query is NOT
in _FIRST50 — the r8/r14 lesson, mechanized (VERDICT r14 §next#1: 8
family queries were re-planned AFTER the r14 window froze, so the round
closed with no driver hash on the shipped plans).  Re-run --freeze after
every window edit; the diff of WINDOW_FREEZE.json shows exactly which
queries changed since the last freeze.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import re
import sys
import textwrap
from collections import Counter

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402

FREEZE_FILE = "WINDOW_FREEZE.json"


def source_hash(name: str) -> str:
    """sha256 over the query's function source + oracle SQL (the two
    inputs the driver's correctness gate exercises)."""
    fn, sql = entrymod._REGISTRY[name]
    src = inspect.getsource(fn)
    return hashlib.sha256(
        (src + "\0" + (sql or "")).encode("utf-8")
    ).hexdigest()


def freeze() -> None:
    stamp = {n: source_hash(n) for n in sorted(entrymod._REGISTRY)}
    with open(FREEZE_FILE, "w") as f:
        json.dump(stamp, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"froze {len(stamp)} query hashes -> {FREEZE_FILE}")


def evidence_rounds() -> dict[str, int]:
    """name -> latest CORRECTNESS round that checked it (0 = never)."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f).group(1))
        for k in json.load(open(f)):
            last[k] = max(last.get(k, 0), rnd)
    return last


def main() -> None:
    if "--freeze" in sys.argv:
        freeze()
        return
    n_show = 60
    if "--ages" in sys.argv:
        n_show = int(sys.argv[sys.argv.index("--ages") + 1])
    last = evidence_rounds()
    names = list(entrymod.queries().keys())
    window = set(entrymod._FIRST50)
    ever = {n for n in names if last.get(n, 0) > 0}
    backlog = [n for n in names if n not in ever and n not in window]
    print(
        f"registry={len(names)} ever-verified={len(ever)} "
        f"window={len(window)} backlog={len(backlog)}"
    )
    if backlog:
        print(textwrap.fill(", ".join(backlog), width=74))
    dist = Counter(last.get(n, 0) for n in names)
    print("evidence-round distribution:", dict(sorted(dist.items())))
    ranked = sorted(names, key=lambda n: (last.get(n, 0), n))
    print(f"oldest-evidence-first (top {n_show}; * = in current window):")
    for n in ranked[:n_show]:
        mark = "*" if n in window else " "
        print(f"  r{last.get(n, 0):02d} {mark} {n}")


if __name__ == "__main__":
    main()
