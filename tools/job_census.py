#!/usr/bin/env python3
"""List every Spark job of a single-query Bench run: job id, wall ms,
callSite, and the root execution it belongs to. Attribution for
job-count work (guide §1/§2 fixed costs)."""
import json, os, subprocess, sys, tempfile, argparse

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OPENS = ["--add-opens=java.base/" + p + "=ALL-UNNAMED" for p in [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar"]]

ap = argparse.ArgumentParser()
ap.add_argument("query")
ap.add_argument("--sf", default="/root/testdata/sf0.1")
ap.add_argument("--cpus", default="32")
args = ap.parse_args()

evdir = tempfile.mkdtemp(prefix="graft_jobs_")
env = dict(os.environ)
env["SPARK_GRAFT_SF_DIR"] = args.sf
env["SPARK_GRAFT_CPUS"] = args.cpus
env["SPARK_GRAFT_WARMUP"] = "on"
cmd = (["java"] + OPENS + [
    "-Xmx16g", "-Dspark.eventLog.enabled=true",
    f"-Dspark.eventLog.dir={evdir}", "-Dspark.eventLog.compress=false",
    "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
    "graft.Bench", args.query])
out = subprocess.run(cmd, env=env, capture_output=True, text=True)
for line in out.stdout.splitlines():
    if line.startswith('{"metric"'):
        j = json.loads(line)
        print("bench:", json.dumps(j.get("queries")), "failed:", j.get("failed"))
logs = sorted((os.path.join(evdir, f) for f in os.listdir(evdir)
               if not f.startswith(".")), key=os.path.getmtime)
path = logs[-1]
if os.path.isdir(path):
    parts = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.startswith("events_"))
else:
    parts = [path]
jobs = {}
for raw in (l for p in parts for l in open(p)):
    try:
        e = json.loads(raw)
    except json.JSONDecodeError:
        continue
    ev = e.get("Event")
    if ev == "SparkListenerJobStart":
        props = e.get("Properties", {})
        jobs[e["Job ID"]] = {
            "t0": e["Submission Time"],
            "site": props.get("callSite.short", ""),
            "exec": props.get("spark.sql.execution.root.id",
                              props.get("spark.sql.execution.id", "")),
            "nstages": len(e["Stage Infos"]),
            "t1": None}
    elif ev == "SparkListenerJobEnd":
        if e["Job ID"] in jobs:
            jobs[e["Job ID"]]["t1"] = e["Completion Time"]
prev_end = None
from collections import Counter
sites = Counter()
print(f"{'job':>4} {'gap_ms':>7} {'wall_ms':>8} {'exec':>5} {'nst':>4}  callSite")
for jid in sorted(jobs):
    j = jobs[jid]
    gap = (j["t0"] - prev_end) if prev_end is not None else 0
    wall = (j["t1"] - j["t0"]) if j["t1"] else -1
    prev_end = j["t1"] or j["t0"]
    sites[j["site"]] += 1
    print(f"{jid:>4} {gap:>7} {wall:>8} {j['exec']:>5} {j['nstages']:>4}  {j['site']}")
print("\njobs:", len(jobs))
for s, n in sites.most_common(20):
    print(f"{n:>4}  {s}")
