"""Interleaved env-A/B for the AQE minPartitionSize bench default.

Round-14 context: AQE's coalescing targets BYTES; Arrow stages cost
compute per row far above their bytes, and at bench scale the default
1m floor can coalesce a heavy Arrow stage onto too few tasks. The
first round-14 session probed this one-shot in a noisy phase (b22
1.7->1.1 s, b25/b35 neutral-to-worse pre-rewrite) and deferred the
decision to a proper interleaved measurement.

This is that measurement: for each query, ALTERNATE `bench.py --one`
subprocesses with SPARK_GRAFT_MIN_PARTITION_SIZE set to the candidate
vs left at the default, inside the same machine phase — the same
drift-cancelling discipline as tools/bench_ab.py, with the env var as
the treatment instead of the tree.

Usage: python tools/min_partition_probe.py <value> <query> [query ...]
       [--pairs N]
Prints one JSON line per query and a summary.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _one(env_value: str | None, query: str) -> float:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MIN_PARTITION_SIZE", None)
    if env_value is not None:
        env["SPARK_GRAFT_MIN_PARTITION_SIZE"] = env_value
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--one", query],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    line = (proc.stdout.strip().splitlines() or [""])[-1]
    return json.loads(line)["sec"]


def main() -> None:
    value = sys.argv[1]
    pairs = 3
    args = sys.argv[2:]
    if "--pairs" in args:
        i = args.index("--pairs")
        pairs = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    summary = {}
    for query in args:
        cur, ref = [], []
        for p in range(pairs):
            cur.append(_one(value, query))
            ref.append(_one(None, query))
            print(
                f"# {query} pair {p+1}/{pairs}: "
                f"treat={cur[-1]:.3f}s default={ref[-1]:.3f}s",
                flush=True,
            )
        rec = {
            "query": query,
            "value": value,
            "pairs": pairs,
            "treat_median": round(statistics.median(cur), 3),
            "treat_spread": [min(cur), max(cur)],
            "default_median": round(statistics.median(ref), 3),
            "default_spread": [min(ref), max(ref)],
        }
        rec["ratio_treat_over_default"] = round(
            rec["treat_median"] / rec["default_median"], 3
        )
        print(json.dumps(rec), flush=True)
        summary[query] = rec["ratio_treat_over_default"]
    print(json.dumps({"value": value, "ratios": summary}), flush=True)


if __name__ == "__main__":
    main()
