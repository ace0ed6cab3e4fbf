"""Structural cost probe: #jobs / #stages / #tasks one query schedules.

Usage: python tools/jobcount.py name1,name2,... [--sf DIR]

For each registry query: one untimed warm-up (file index, class loading,
any per-session memo the operator legitimately builds), then a measured
run executed under a job group so the scheduler's own accounting gives
the exact number of jobs, stages and tasks the query costs. Those counts
are machine-independent — the co-tenant-noise-proof companion to
bench.py's wall-clock numbers (guide §1: measure first; §2: the lever is
fewer passes/shuffles, which is exactly what these counts surface).

Wall time is printed too, but the counts are the signal.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lime_on_spark_spark.plans import registry  # noqa: E402
from lime_on_spark_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("jobcount")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        fn = qs[name]
        spark.catalog.clearCache()
        sc._jvm.System.gc()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        spark.catalog.clearCache()
        sc._jvm.System.gc()
        group = f"measure-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                # Skipped stages report numTasks but never ran; count only
                # stages that submitted at least one task.
                if sinfo is not None and sinfo.numActiveTasks + sinfo.numCompletedTasks + sinfo.numFailedTasks > 0:
                    n_stages += 1
                    n_tasks += sinfo.numCompletedTasks
        print(json.dumps({
            "query": name,
            "jobs": len(job_ids),
            "stages_run": n_stages,
            "tasks": n_tasks,
            "wall_sec": round(wall, 3),
        }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
