"""Round-close artifact regeneration — run as the LAST step of a round,
then commit the result so the snapshot commit IS the round's HEAD
(r4 verdict #3: artifacts must never predate the final code commit).

Regenerates, in order:

1. ``CORRECTNESS_LOCAL_r{N}.json`` — the full oracle sweep at sf0.01
   (every registered query, driver-shaped per-query verdicts).
2. ``PLANS.md`` — the physical-plan audit (tools/plan_audit.py).

Usage:

    python tools/round_close.py <round-number>   # e.g. 5
    python tools/round_close.py --check          # post-commit clean gate

Exits non-zero if any query fails its oracle — a failing round must not
snapshot. After it succeeds: review `git diff PLANS.md`, update the
COVERAGE.md snapshot paragraph, commit everything together as the final
commit of the round, then run `--check` (exits non-zero on a dirty
tree — r11 hygiene item #5: the close commit must leave `git status`
clean).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) == 2 and sys.argv[1] == "--check":
        return check_clean()
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    # r10 verdict hygiene item: ADVICE.md must reflect the close HEAD —
    # every advice item re-adjudicated (FIXED with a test pointer, or
    # explicitly open) under a current-round status header.
    advice = os.path.join(REPO, "ADVICE.md")
    with open(advice) as fh:
        if f"round-{rnd} close" not in fh.read():
            print(
                f"[round-close] ADVICE.md lacks a 'round-{rnd} close' "
                "status header — re-adjudicate the advice items at HEAD "
                "before snapshotting"
            )
            return 3
    env = dict(os.environ)
    env["CORRECTNESS_JSON_OUT"] = os.path.join(
        REPO, f"CORRECTNESS_LOCAL_r{rnd}.json"
    )
    print(f"[round-close] full oracle sweep -> CORRECTNESS_LOCAL_r{rnd}.json")
    rc = subprocess.call(
        [sys.executable, "tools/check_correctness.py", "/root/testdata/sf0.01"],
        cwd=REPO,
        env=env,
    )
    if rc != 0:
        print("[round-close] oracle sweep FAILED — fix before snapshotting")
        return rc
    print("[round-close] regenerating PLANS.md")
    # pin the SF: PLANS.md diffs are only reviewable against the same data
    # regime (broadcast thresholds flip join strategies across SFs)
    rc = subprocess.call(
        [sys.executable, "tools/plan_audit.py", "/root/testdata/sf0.01"],
        cwd=REPO,
        env=os.environ,
    )
    if rc != 0:
        print("[round-close] plan audit FAILED")
        return rc
    print(
        "[round-close] done. Review `git diff PLANS.md`, refresh the "
        "COVERAGE.md snapshot paragraph, commit as the round's final "
        "commit, then run `python tools/round_close.py --check` — the "
        "ritual is not finished until that passes."
    )
    return 0


def check_clean() -> int:
    """Post-commit gate (r11 verdict hygiene item #5): the close commit
    must leave a CLEAN working tree. Round 11 left a stale
    BENCH_LOCAL_latest.json modified at HEAD (a bad-boot log newer than
    the committed best boot), which misleads anyone diffing the close
    state. Run this as the literal last step of the ritual."""
    dirty = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    if dirty:
        print(
            "[round-close --check] WORKING TREE DIRTY at close — commit "
            "or discard before the round ends:\n" + dirty
        )
        return 4
    print("[round-close --check] clean tree — close complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
