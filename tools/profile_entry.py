"""Profile registry entries: per-job wall time vs driver-side gaps.

Runs each named entry exactly like bench.py (noop-forced) in a session
with event logging enabled, then parses the event log to attribute the
entry's wall time to Spark job execution vs driver-side gaps (planning,
py4j round-trips, manifest/filesystem work).  The split tells you which
lever matters for an entry: few long jobs → optimize the plan; many
tiny jobs + big gap share → cut job count / driver work.

Usage:
    python tools/profile_entry.py q_text_index q_join_view ...
    python tools/profile_entry.py --top 15        # slowest from bench_details.json
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if names and names[0] == "--top":
        n = int(names[1]) if len(names) > 1 else 15
        with open(os.path.join(repo, "bench_details.json")) as f:
            d = json.load(f)
        names = [k for k, _ in sorted(d["queries"].items(),
                                      key=lambda kv: kv[1], reverse=True)[:n]]
    evdir = tempfile.mkdtemp(prefix="spark_events_")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    from ydb_cdc_processor_spark.session import get_spark

    spark = get_spark("profile-entry", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{evdir}",
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")

    from ydb_cdc_processor_spark.registry import QUERIES

    # warm-up
    QUERIES["q_project_retype"](spark, SF_DIR).limit(10).count()

    # the cdc_* engine entries are not registry queries — skip them here
    # (profile them via tools/bench_subset.py --cdc + the event log)
    skipped = [n for n in names if n not in QUERIES]
    if skipped:
        print(f"skipping non-registry entries: {skipped}", file=sys.stderr)
    names = [n for n in names if n in QUERIES]

    results = {}
    for name in names:
        sc = spark.sparkContext
        sc.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        _force(QUERIES[name](spark, SF_DIR))
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        results[name] = {"wall": wall}

    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)

    path = None
    for f in os.listdir(evdir):
        if app_id in f:
            path = os.path.join(evdir, f)
    if path is not None and os.path.isdir(path):  # rolling v2 layout
        for f in os.listdir(path):
            if f.startswith("events"):
                path = os.path.join(path, f)
                break
    jobs = []  # (start_ms, end_ms, desc, n_tasks)
    job_start = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                job_start[ev["Job ID"]] = (
                    ev["Submission Time"],
                    props.get("spark.job.description", ""),
                    sum(s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])))
            elif et == "SparkListenerJobEnd":
                st = job_start.pop(ev["Job ID"], None)
                if st:
                    jobs.append((st[0], ev["Completion Time"], st[1], st[2]))

    print(f"{'entry':<34} {'wall':>7} {'jobs':>5} {'job_s':>7} "
          f"{'gap_s':>7} {'gap%':>5} {'tasks':>6}")
    for name, r in results.items():
        tag = f"PROFILE:{name}"
        mine = [j for j in jobs if j[2] == tag]
        job_ms = sum(e - s for s, e, _, _ in mine)
        ntasks = sum(t for _, _, _, t in mine)
        wall = r["wall"]
        gap = wall - job_ms / 1000.0
        print(f"{name:<34} {wall:7.2f} {len(mine):5d} {job_ms/1000:7.2f} "
              f"{gap:7.2f} {100*gap/wall:4.0f}% {ntasks:6d}")
        results[name].update(n_jobs=len(mine), job_s=job_ms / 1000.0,
                             gap_s=gap, n_tasks=ntasks)
    out = os.path.join(repo, "tools", "profile_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"written: {out}")


if __name__ == "__main__":
    main()
