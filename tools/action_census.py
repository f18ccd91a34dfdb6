#!/usr/bin/env python3
"""Group a single-query Bench run's jobs by root SQL execution and
attribute each execution to its action call site (from stage names).
Shows per-execution job count + wall + gap — the fixed-cost census."""
import json, os, subprocess, sys, tempfile, argparse
from collections import defaultdict

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

evdir = tempfile.mkdtemp(prefix="graft_act_")
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
parts = (sorted(os.path.join(path, f) for f in os.listdir(path)
                if f.startswith("events_"))
         if os.path.isdir(path) else [path])
jobs, stage2job, stagename, execsite = {}, {}, {}, {}
for raw in (l for p in parts for l in open(p)):
    try:
        e = json.loads(raw)
    except json.JSONDecodeError:
        continue
    ev = e.get("Event")
    if ev == "SparkListenerJobStart":
        props = e.get("Properties", {})
        jid = e["Job ID"]
        jobs[jid] = {"t0": e["Submission Time"], "t1": None,
                     "exec": props.get("spark.sql.execution.root.id",
                                       props.get("spark.sql.execution.id", "?"))}
        for s in e["Stage Infos"]:
            stage2job[s["Stage ID"]] = jid
            stagename[s["Stage ID"]] = s.get("Stage Name", s.get("Name", "?"))
    elif ev == "SparkListenerJobEnd":
        if e["Job ID"] in jobs:
            jobs[e["Job ID"]]["t1"] = e["Completion Time"]
    elif ev == "SparkListenerSQLExecutionStart":
        execsite[str(e.get("executionId"))] = (e.get("description") or "")[:90]
execs = defaultdict(lambda: {"jobs": [], "t0": None, "t1": None})
for jid in sorted(jobs):
    j = jobs[jid]
    ex = execs[j["exec"]]
    ex["jobs"].append(jid)
    if ex["t0"] is None:
        ex["t0"] = j["t0"]
    ex["t1"] = j["t1"] or j["t0"]
    # attribute: prefer a non-AQE stage name in this job
    names = [stagename[s] for s, jj in stage2job.items() if jj == jid]
    good = [n for n in names if "withThreadLocalCaptured" not in n]
    j["site"] = good[0] if good else (names[0] if names else "?")
prev = None
print(f"{'exec':>5} {'njobs':>5} {'gap_ms':>7} {'wall_ms':>8}  desc / sites")
tot_gap = tot_wall = 0
for exid in sorted(execs, key=lambda k: execs[k]["t0"]):
    ex = execs[exid]
    gap = (ex["t0"] - prev) if prev is not None else 0
    wall = ex["t1"] - ex["t0"]
    prev = ex["t1"]
    tot_gap += gap; tot_wall += wall
    sites = {jobs[j]["site"] for j in ex["jobs"]}
    desc = execsite.get(exid, "")
    print(f"{exid:>5} {len(ex['jobs']):>5} {gap:>7} {wall:>8}  {desc} | {'; '.join(sorted(sites))[:120]}")
print(f"\nexecs: {len(execs)}  jobs: {len(jobs)}  sum gap: {tot_gap}ms  sum wall: {tot_wall}ms")
