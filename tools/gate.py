"""Single pre-record verification gate — run this before committing ANY
registry/operator change and before recording verification numbers in
notes or commit messages.

Runs, in order, failing fast:
  1. python -m pytest tests/ -x -q
  2. python tools/plan_audit.py <sf_dir>
  3. python tools/verify_local.py <sf_dir>

Exists because of the round-4 ordering bug: q162/q163 landed AFTER the
commit that recorded "plan audit 0 flagged", shipping a stale claim and
a red audit. One command, one exit code — a query can no longer land
behind the recorded numbers.

Usage: python tools/gate.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import subprocess
import sys
import time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

STEPS = [
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"]),
    ("plan_audit", [sys.executable, "tools/plan_audit.py", SF_DIR]),
    ("verify_local", [sys.executable, "tools/verify_local.py", SF_DIR]),
]


def main() -> int:
    for name, cmd in STEPS:
        t0 = time.time()
        print(f"=== gate: {name} ===", flush=True)
        rc = subprocess.call(cmd, cwd="/root/repo")
        dt = time.time() - t0
        if rc != 0:
            print(f"GATE FAILED at {name} (rc={rc}, {dt:.1f}s)")
            return rc
        print(f"=== gate: {name} OK ({dt:.1f}s) ===", flush=True)
    print("GATE GREEN: pytest + plan_audit + verify_local all passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
