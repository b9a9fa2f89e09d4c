"""Per-job profile of one bench query: where does the wall-clock go?

Runs ``bench.py``'s query function once warm, then timed, and dumps the
Spark-UI REST view of every job that ran during the timed invocation:
job duration, stage names, task counts, shuffle bytes. This is the
section-1 "measure first" tool — the bench gives one number per query;
this splits it into the jobs the operator actually launched, so the
optimization target is a mechanism, not a guess.

Usage: python tools/profile_query.py <query> [--runs N]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    runs = 1
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    import bench
    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name=f"profile_{name}")
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_machinery(spark)
    fn = bench.BENCHES[name]
    for _ in range(2):
        fn(spark)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"
    jobs_before = {j["jobId"] for j in _api(base, "/jobs")}

    t0 = time.time()
    for _ in range(runs):
        fn(spark)
    wall = time.time() - t0

    time.sleep(0.5)
    jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before]
    jobs.sort(key=lambda j: j["jobId"])
    stages = {s["stageId"]: s for s in _api(base, "/stages?status=complete")}

    total_job = 0.0
    print(f"=== {name}: wall {wall:.3f}s over {runs} run(s), {len(jobs)} jobs ===")
    from datetime import datetime

    def _ts(s: str) -> float:
        return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    prev_comp = t0
    for j in jobs:
        sub = _ts(j["submissionTime"])
        try:
            comp = _ts(j["completionTime"])
        except Exception:
            comp = sub
        gap = sub - prev_comp
        prev_comp = max(prev_comp, comp)
        dur = 0.0
        srd = swr = inp = 0
        names = []
        for sid in j["stageIds"]:
            s = stages.get(sid)
            if not s:
                continue
            dur += s.get("executorRunTime", 0) / 1000.0
            srd += s.get("shuffleReadBytes", 0)
            swr += s.get("shuffleWriteBytes", 0)
            inp += s.get("inputBytes", 0)
            names.append(
                f"{s['name'].splitlines()[0][:60]}"
                f"[{s['numCompleteTasks']}t {s.get('executorRunTime',0)/1000:.2f}s]"
            )
        total_job += comp - sub
        desc = (j.get("description") or j.get("name") or "")[:80]
        print(
            f"job {j['jobId']:>4} gap {gap:6.3f}s dur {comp-sub:6.3f}s "
            f"execRun {dur:6.2f}s in {inp>>20}MB sh {srd>>10}/{swr>>10}KB | {desc}"
        )
        for n in names:
            print(f"       - {n}")
    print(
        f"=== sum(job wall) {total_job:.2f}s vs measured {wall:.3f}s "
        f"(rest = driver planning/collect gaps) ==="
    )
    spark.stop()


if __name__ == "__main__":
    main()
