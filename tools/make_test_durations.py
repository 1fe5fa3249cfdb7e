"""Regenerate tests/durations.json from a `pytest --durations=0` log.

The fast test tier (`pytest -m "not slow"`) is driven by PER-TEST measured
durations (VERDICT r4 next-item 4: module-granular tiering deselected 53% of
the suite, including every cheap test inside the heavy modules). conftest.py
marks a test `slow` when its recorded duration exceeds the threshold; tests
with no record run in the fast tier (new tests stay visible until the manifest
is regenerated).

    python -m pytest tests/ -q --durations=0 > /tmp/suite.log
    python tools/make_test_durations.py /tmp/suite.log

Only 'call' phases count (setup/teardown are negligible here); durations are
summed per test id and written as {"tests/test_x.py::test_y": seconds}.
"""
from __future__ import annotations

import json
import os
import re
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "durations.json")

# pytest --durations=0 lines look like:
#   123.45s call     tests/test_ops.py::test_something
LINE = re.compile(r"^\s*(\d+\.\d+)s\s+(call|setup|teardown)\s+(\S+)")


def main(path: str) -> None:
    durations: dict[str, float] = {}
    with open(path) as f:
        for line in f:
            m = LINE.match(line)
            if not m or m.group(2) != "call":
                continue
            test_id = m.group(3)
            durations[test_id] = durations.get(test_id, 0.0) + float(m.group(1))
    if not durations:
        raise SystemExit(f"no duration lines found in {path} — run pytest "
                         "with --durations=0 (and let it FINISH; the table "
                         "prints at the end)")
    with open(OUT, "w") as f:
        json.dump(dict(sorted(durations.items(), key=lambda kv: -kv[1])), f,
                  indent=0)
        f.write("\n")
    total = sum(durations.values())
    print(f"wrote {OUT}: {len(durations)} tests, {total:.0f}s total 'call' time")
    for tid, d in sorted(durations.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {d:8.1f}s {tid}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/full_suite_durations.log")
