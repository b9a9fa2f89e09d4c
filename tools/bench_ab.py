"""Interleaved A/B bench forensics: classify a >20% bench mover as
environment drift vs code regression, mechanically.

Three consecutive rounds (5-7) saw ±20% near-uniform in-suite drift that
needed manual worktree forensics each time; this scripts the procedure
that settled it (round 7's b25 adjudication). ALTERNATING runs between
two trees inside the same machine phase is the discriminator a plain
re-run can't give: environment drift moves both trees in lockstep, a
code regression separates them.

Usage: python tools/bench_ab.py <query> <ref_sha> [rounds]

Creates a detached `git worktree` of <ref_sha>, then alternates
`bench.py --one <query>` current-tree / ref-tree for <rounds> pairs
(default 4; each --one is itself 1 warm-up + 3 timed runs, median).
Prints one JSON line: per-tree medians and spreads, the cur/ref ratio,
and the call:

- "regression": current tree >20% slower than ref in the SAME
  interleaved session;
- "improvement": >20% faster;
- "drift": trees statistically together — whatever moved in the
  round's in-suite numbers was the environment, not the code.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _one(tree: str, query: str) -> float:
    proc = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py"), "--one", query],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=tree,
    )
    line = (proc.stdout.strip().splitlines() or [""])[-1]
    try:
        return float(json.loads(line)["sec"])
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            f"bench --one {query} failed in {tree}: "
            f"{(proc.stderr or line)[-400:]}"
        ) from exc


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    query, ref_sha = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    ref_tree = tempfile.mkdtemp(prefix=f"ab_{ref_sha}_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", ref_tree, ref_sha],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    cur, ref = [], []
    try:
        for i in range(rounds):
            cur.append(_one(REPO, query))
            ref.append(_one(ref_tree, query))
            print(
                f"# pair {i + 1}/{rounds}: cur={cur[-1]:.3f}s "
                f"ref={ref[-1]:.3f}s",
                file=sys.stderr,
            )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", ref_tree],
            cwd=REPO,
            capture_output=True,
        )
    mc, mr = statistics.median(cur), statistics.median(ref)
    ratio = mc / mr if mr > 0 else float("inf")
    verdict = (
        "regression" if ratio > 1.2
        else "improvement" if ratio < 1 / 1.2
        else "drift"
    )
    print(json.dumps({
        "query": query,
        "ref_sha": ref_sha,
        "pairs": rounds,
        "cur_median": round(mc, 3),
        "cur_spread": [round(min(cur), 3), round(max(cur), 3)],
        "ref_median": round(mr, 3),
        "ref_spread": [round(min(ref), 3), round(max(ref), 3)],
        "ratio_cur_over_ref": round(ratio, 3),
        "verdict": verdict,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
