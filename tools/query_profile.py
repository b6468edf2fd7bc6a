"""Per-query job/stage profile (round 11).

Runs one or more declared queries warm and reports, for each: min
wall over the timed iters, the number of Spark JOBS the single call
fired (every job beyond the final count() is a barrier — a scalar
gate, a persist materialization, an eager checkpoint — each paying
the fixed job floor), total stages, and total tasks. High job counts
on a sub-5s query usually dominate its wall at bench scale.

Usage::

    python tools/query_profile.py <sf_dir> <query> [query ...]
        [--iters N | --iters=N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # Accept both ``--iters N`` and ``--iters=N`` (ADVICE r11: the
    # detached-N form used to be consumed as a query name).
    argv = sys.argv[1:]
    args: list[str] = []
    iters = 2
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--iters":
            if i + 1 >= len(argv):
                raise SystemExit("--iters requires a value")
            iters = int(argv[i + 1])
            i += 2
            continue
        if a.startswith("--iters="):
            iters = int(a.split("=", 1)[1])
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    sf_dir = args[0]
    names = args[1:]

    import __spark_entry__ as entry
    from jaccard_join_duckdb_spark import get_spark

    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    spark = get_spark(
        app_name="jjds-profile",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.session.timeZone": "UTC",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entry.queries(), **getattr(entry, "extra_queries", dict)()}
    tracker = spark.sparkContext.statusTracker()

    for name in names:
        # untimed warm-up (JIT + file listing)
        spark.catalog.clearCache()
        qs[name](spark, sf_dir).count()
        best = None
        jobs = stages = tasks = 0
        for i in range(iters):
            spark.catalog.clearCache()
            group = f"profile-{name}-{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            if best is None or dt < best:
                best = dt
                job_ids = tracker.getJobIdsForGroup(group)
                jobs = len(job_ids)
                stages = tasks = 0
                for j in job_ids:
                    info = tracker.getJobInfo(j)
                    if info is None:
                        continue
                    stages += len(info.stageIds)
                    for s in info.stageIds:
                        si = tracker.getStageInfo(s)
                        if si is not None:
                            tasks += si.numTasks
        print(
            f"{name}: {best:.2f}s min of {iters} | jobs={jobs} "
            f"stages={stages} tasks={tasks} rows={n}",
            flush=True,
        )


if __name__ == "__main__":
    main()
