#!/usr/bin/env python
"""Close-sweep attestation (VERDICT r08 #1).

Round 8's recorded 268/268 close sweep was followed by ten more code
commits, leaving the final tree without a recorded full-registry
attestation — the judge had to re-verify 17 queries by hand. This
tool makes the ordering mechanical:

  python tools/close_attest.py run
      Runs the full-registry oracle sweep at sf0.01 AND sf0.001
      (tools/selfcheck.py, the driver's gate), then prints ONE
      attestation line embedding the current HEAD sha, the sweep
      results and the timestamp. Paste it into BASELINE.md's close
      block (or redirect-append).

  python tools/close_attest.py check
      Parses the LAST `close-attest:` line in BASELINE.md and fails
      (exit 1) if any non-doc file changed in commits after the
      attested sha, or if the working tree has non-doc modifications.
      Doc-only commits after the sweep are fine — the attestation
      covers code, not prose.

Run `check` as the final action before the round snapshot.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# files whose changes do NOT invalidate a code attestation
_DOC_RE = re.compile(
    r"""(?x)^(
        .*\.md$ |
        PROGRESS\.jsonl$ |
        BENCH_r\d+\.json$ |
        CORRECTNESS_r\d+\.json$ |
        SELFCHECK_r\d+\.json$ |
        LEAKCHECK\.json$ |
        COPYCHECK\.json$ |
        VERDICT.*$ | ADVICE.*$ | BASELINE\.json$
    )"""
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def _next_round() -> int:
    """Round number for the SELFCHECK artifact = latest driver
    CORRECTNESS round + 1 (the sweep we attest is the one the CURRENT
    round's driver gate will sample)."""
    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    return (max(rounds) + 1) if rounds else 1


def run() -> int:
    head = _git("rev-parse", "--short", "HEAD")
    results = []
    # machine-diffable close artifact (VERDICT r11 #3): the sf0.01
    # sweep — the driver gate's SF — lands in SELFCHECK_r{N}.json in
    # the driver's exact CORRECTNESS format, covering ALL registry
    # names including those past the driver's 50-name window
    selfcheck_json = os.path.join(REPO, f"SELFCHECK_r{_next_round():02d}.json")
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
        # stderr folded into stdout (ADVICE r09): a crashing sweep
        # previously reported '<no output>' because the traceback
        # went to the discarded stderr pipe
        cmd = [sys.executable, os.path.join(REPO, "tools", "selfcheck.py"),
               "--sf", sf]
        if sf.endswith("sf0.01"):
            cmd += ["--json", selfcheck_json]
        proc = subprocess.run(
            cmd,
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        tail = (proc.stdout.strip().splitlines() or ["<no output>"])[-1]
        results.append(f"{os.path.basename(sf)}: {tail}")
        if proc.returncode != 0:
            print(f"SWEEP FAILED at {sf}:\n{proc.stdout[-4000:]}",
                  file=sys.stderr)
            return 1
    stamp = time.strftime("%Y-%m-%d %H:%M:%S %Z")
    print(f"close-attest: HEAD={head} at {stamp} — "
          + "; ".join(results))
    return 0


def check() -> int:
    baseline = open(os.path.join(REPO, "BASELINE.md")).read()
    attests = re.findall(r"close-attest: HEAD=([0-9a-f]{7,40})", baseline)
    if not attests:
        print("no close-attest line in BASELINE.md — run "
              "`python tools/close_attest.py run` and record it",
              file=sys.stderr)
        return 1
    sha = attests[-1]
    changed = [
        f for f in _git(
            "diff", "--name-only", f"{sha}..HEAD"
        ).splitlines()
        if f and not _DOC_RE.match(f)
    ]
    # porcelain rename entries read 'R  old -> new'; test the NEW
    # path (ADVICE r09 — previously the whole 'old -> new' string hit
    # the doc regex and renames were always flagged stale)
    dirty = [
        line[3:].strip().split(" -> ")[-1]
        for line in _git("status", "--porcelain").splitlines()
        if line
        and not _DOC_RE.match(line[3:].strip().split(" -> ")[-1])
    ]
    if changed or dirty:
        print("attestation STALE — non-doc changes after the attested "
              f"sweep at {sha}:", file=sys.stderr)
        for f in changed:
            print(f"  committed: {f}", file=sys.stderr)
        for f in dirty:
            print(f"  uncommitted: {f}", file=sys.stderr)
        return 1
    print(f"close attestation OK: no non-doc change since {sha}")
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    sys.exit({"run": run, "check": check}[mode]())
