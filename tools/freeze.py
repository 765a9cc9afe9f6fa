"""One-step round freeze: gate → closing-line write → docs commit.

Round 6's freeze was choreographed by hand and wobbled (a "final"
record, then review fixes, then the definitive record, then a pytest
count correction — three commits where one belongs). This tool makes
the closing record mechanical:

  1. REFUSE to run on a dirty tree (the gate must attribute to one
     commit) and record HEAD.
  2. Run the full gate (tools/gate.py: pytest → plan_audit →
     verify_local), teeing output to /tmp/gate_r{N}_freeze.log and
     parsing the step summaries.
  3. REFUSE to record if the tree changed or HEAD moved during the
     gate (the "never edit while the gate runs" rule, enforced).
  4. Append the closing-line section to docs/ROUND{N}_NOTES.md with
     the PARSED numbers — the recorded pytest count can no longer
     disagree with the log.
  5. Commit that docs file alone.

Usage: python tools/freeze.py ROUND [sf_dir]
       (e.g. python tools/freeze.py 7 /root/testdata/sf0.01)
"""

from __future__ import annotations

import datetime
import re
import subprocess
import sys
import time

REPO = "/root/repo"


def sh(*cmd: str) -> str:
    return subprocess.run(
        cmd, cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def main() -> int:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    dirty = sh("git", "status", "--porcelain").strip()
    if dirty:
        print("REFUSED: tree is dirty — commit or stash first:\n" + dirty)
        return 1
    head = sh("git", "rev-parse", "--short", "HEAD").strip()

    log_path = f"/tmp/gate_r{rnd}_freeze.log"
    print(f"freeze: running gate on {head} (log: {log_path})", flush=True)
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            [sys.executable, "tools/gate.py", sf_dir],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        lines = []
        assert proc.stdout is not None
        for line in proc.stdout:
            sys.stdout.write(line)
            log.write(line)
            lines.append(line)
        rc = proc.wait()
    gate_out = "".join(lines)
    gate_secs = time.time() - t0
    if rc != 0:
        print(f"freeze: GATE FAILED (rc={rc}) — nothing recorded")
        return rc

    if sh("git", "status", "--porcelain").strip():
        print("REFUSED: tree changed while the gate ran — result is "
              "unattributable; re-run on a quiet tree")
        return 1
    if sh("git", "rev-parse", "--short", "HEAD").strip() != head:
        print("REFUSED: HEAD moved while the gate ran")
        return 1

    # parse the step evidence out of the log (fail loudly if absent —
    # a record must never carry guessed numbers). Every number is
    # matched INSIDE its own step's section (advice find: unanchored
    # re.search over the combined log would take the FIRST "N passed"
    # / "N failures" anywhere — an earlier step, a test name, a
    # warning line — as the closing numbers), the same slicing the
    # verify_local row count already used.
    def section(name: str) -> str:
        part = gate_out.split(f"=== gate: {name} ===", 1)
        if len(part) < 2:
            return ""
        return part[1].split("=== gate: ", 1)[0]

    pyt_out, audit_out, ver_out = (
        section("pytest"), section("plan_audit"), section("verify_local")
    )
    # pytest's own summary is the LAST line-anchored "N passed" in its
    # section (a test id or warning could contain the phrase earlier)
    pyt_counts = re.findall(r"(?m)^(\d+) passed", pyt_out)
    m_pytest = re.match(r"(\d+)", pyt_counts[-1]) if pyt_counts else None
    m_pyt_dt = re.search(r"=== gate: pytest OK \(([\d.]+)s\)", gate_out)
    m_audit = re.search(
        r"=== gate: plan_audit OK \(([\d.]+)s\)", gate_out
    )
    m_flag = re.search(r"(\d+) flagged", audit_out)
    m_verify = re.search(r"(?m)^(\d+) failures", ver_out)
    m_ver_dt = re.search(r"=== gate: verify_local OK \(([\d.]+)s\)", gate_out)
    # count per-query rows ONLY inside the verify_local section —
    # plan_audit prints its own "ok qNNN" lines (first-use bug: the
    # r7 closing line initially recorded the sum of both)
    n_queries = len(re.findall(r"(?m)^(?:ok|FAIL) +q", ver_out))
    # EVERY number must have parsed — m_flag included (review find: a
    # fallback '0 flagged' on a parse miss is exactly the guessed
    # record this tool exists to prevent)
    if not (m_pytest and m_pyt_dt and m_audit and m_flag and m_verify
            and m_ver_dt):
        print("REFUSED: could not parse gate evidence from the log — "
              "inspect " + log_path)
        return 1

    today = datetime.date.today().isoformat()
    section = f"""

## Closing line (written by tools/freeze.py, {today})

Gate run BY THE FREEZE TOOL on `{head}` with a clean tree verified
before AND after the run (total {gate_secs/60:.1f} min,
log `{log_path}`):

- pytest **{m_pytest.group(1)} passed, 0 failed**\
 ({float(m_pyt_dt.group(1))/60:.1f} min).
- `plan_audit` **{m_flag.group(1)} flagged**\
 ({float(m_audit.group(1)):.0f}s).
- `verify_local` **{n_queries}-query registry vs DuckDB →\
 {m_verify.group(1)} failures** ({float(m_ver_dt.group(1)):.0f}s\
 at {sf_dir.rstrip('/').rsplit('/', 1)[-1]}).
"""
    notes = f"docs/ROUND{rnd}_NOTES.md"
    with open(f"{REPO}/{notes}", "a") as fh:
        fh.write(section)
    sh("git", "add", notes)
    sh("git", "commit", "-m",
       f"Record the round-{rnd} closing verification (freeze tool, "
       f"gate GREEN on {head})")
    print(f"freeze: recorded + committed closing line for round {rnd} "
          f"(gate on {head})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
