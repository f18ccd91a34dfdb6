#!/usr/bin/env python3
"""Profile one catalog query: run graft.Bench <query> in a fresh JVM
with the Spark event log on, then summarize per-stage wall time,
task-time sums, shuffle bytes, and spill from the log. Quick
attribution for "where does this query's time go" (guide §1/§7).

Usage: profile_query.py QUERY [--sf DIR] [--cpus N]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

OPENS = [
    "--add-opens=java.base/" + p + "=ALL-UNNAMED"
    for p in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar",
    ]
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="graft_events_")
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = args.sf
    env["SPARK_GRAFT_CPUS"] = args.cpus
    env["SPARK_GRAFT_WARMUP"] = "on"
    cmd = (
        ["java"] + OPENS + [
            "-Xmx16g",
            "-Dspark.eventLog.enabled=true",
            f"-Dspark.eventLog.dir={evdir}",
            "-Dspark.eventLog.compress=false",
            "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.Bench",
        ] + args.queries
    )
    out = subprocess.run(cmd, env=env, capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith('{"metric"'):
            j = json.loads(line)
            print("bench:", json.dumps(j.get("queries")), "failed:",
                  j.get("failed"))
    if out.returncode != 0:
        print(out.stderr[-3000:])
        sys.exit(1)

    # Bench restarts the session after warm-up -> two event logs; the
    # SECOND (newest) app is the timed pass.
    logs = sorted(
        (os.path.join(evdir, f) for f in os.listdir(evdir)
         if not f.startswith(".")),
        key=os.path.getmtime)
    if not logs:
        print("no event log found in", evdir)
        sys.exit(1)
    path = logs[-1]
    if os.path.isdir(path):  # rolling event log: a dir of part files
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.startswith("events_"))
        path = parts if parts else [
            os.path.join(path, f) for f in os.listdir(path)
            if not f.startswith("appstatus")]

    stages = {}   # (stageId, attempt) -> dict
    jobs = {}     # jobId -> (desc, [stageIds])
    paths = path if isinstance(path, list) else [path]
    for raw in (line for p in paths for line in open(p)):
        try:
            e = json.loads(raw)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            desc = e.get("Properties", {}).get(
                "spark.job.description") or e.get("Properties", {}).get(
                "callSite.short", "")
            jobs[e["Job ID"]] = (desc, [s["Stage ID"]
                                        for s in e["Stage Infos"]])
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            key = si["Stage ID"]
            sub = si["Submission Time"] if "Submission Time" in si else None
            comp = si.get("Completion Time")
            stages[key] = {
                "name": si["Stage Name"],
                "tasks": si["Number of Tasks"],
                "wall": (comp - sub) / 1000.0 if sub and comp else 0.0,
                "taskTime": 0.0, "cpuTime": 0.0, "shufRead": 0,
                "shufWrite": 0, "input": 0, "spillD": 0, "fetchWait": 0.0,
                "maxTask": 0.0,
            }
        elif ev == "SparkListenerTaskEnd":
            key = e["Stage ID"]
            st = stages.get(key)
            if st is None:
                stages[key] = st = {
                    "name": "?", "tasks": 0, "wall": 0.0, "taskTime": 0.0,
                    "cpuTime": 0.0, "shufRead": 0, "shufWrite": 0,
                    "input": 0, "spillD": 0, "fetchWait": 0.0,
                    "maxTask": 0.0}
            ti = e.get("Task Info", {})
            tm = e.get("Task Metrics") or {}
            dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) \
                / 1000.0
            st["taskTime"] += dur
            st["maxTask"] = max(st["maxTask"], dur)
            st["cpuTime"] += tm.get("Executor CPU Time", 0) / 1e9
            srm = tm.get("Shuffle Read Metrics", {})
            st["shufRead"] += srm.get("Local Bytes Read", 0) + \
                srm.get("Remote Bytes Read", 0)
            st["fetchWait"] += srm.get("Fetch Wait Time", 0) / 1000.0
            st["shufWrite"] += tm.get(
                "Shuffle Write Metrics", {}).get("Shuffle Bytes Written", 0)
            st["input"] += tm.get("Input Metrics", {}).get("Bytes Read", 0)
            st["spillD"] += tm.get("Disk Bytes Spilled", 0)

    def mb(b):
        return f"{b/1048576:.1f}M" if b else "-"

    rows = sorted(stages.items(), key=lambda kv: -kv[1]["wall"])
    print(f"\n{'stage':>5} {'wall_s':>7} {'tsk_s':>7} {'cpu_s':>7} "
          f"{'n':>4} {'maxT':>6} {'in':>8} {'sRd':>8} {'sWr':>8} "
          f"{'spill':>7}  name")
    for sid, st in rows[:args.top]:
        print(f"{sid:>5} {st['wall']:>7.2f} {st['taskTime']:>7.1f} "
              f"{st['cpuTime']:>7.1f} {st['tasks']:>4} "
              f"{st['maxTask']:>6.2f} {mb(st['input']):>8} "
              f"{mb(st['shufRead']):>8} {mb(st['shufWrite']):>8} "
              f"{mb(st['spillD']):>7}  {st['name'][:70]}")
    tot = sum(st["wall"] for st in stages.values())
    print(f"\nstages: {len(stages)}  sum(stage wall): {tot:.2f}s  "
          f"jobs: {len(jobs)}  log: {path}")


if __name__ == "__main__":
    main()
