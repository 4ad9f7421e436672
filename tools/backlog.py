"""Print the driver-verification backlog: registered queries that have
never appeared in any CORRECTNESS_r*.json window and are not in the
current _FIRST50 window.  Used to plan each round's window rotation
(VERDICT r6 §next#3/#6: never let new batches outpace verification).

Usage: python tools/backlog.py
"""

from __future__ import annotations

import glob
import json
import sys
import textwrap

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    ever: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        ever |= set(json.load(open(f)).keys())
    names = list(entrymod.queries().keys())
    window = set(entrymod._FIRST50)
    backlog = [n for n in names if n not in ever and n not in window]
    print(
        f"registry={len(names)} ever-verified={len(ever & set(names))} "
        f"window={len(window)} backlog={len(backlog)}"
    )
    print(textwrap.fill(", ".join(backlog), width=74))


if __name__ == "__main__":
    main()
