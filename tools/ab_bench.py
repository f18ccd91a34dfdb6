#!/usr/bin/env python3
"""Fresh-JVM A/B of specific queries between two classes dirs.

Interleaves reps (A,B,A,B,...) so a box-noise burst hits both sides,
compares per-query MIN across reps (the noise protocol: scheduler
noise is one-sided).

Usage: ab_bench.py --a CLASSES_A --b CLASSES_B [--reps N] [--sf DIR] q ...
"""
import argparse, json, os, subprocess, sys

OPENS = ["--add-opens=java.base/" + p + "=ALL-UNNAMED" for p in [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar"]]


def run(classes, sf, queries):
    cmd = (["java"] + OPENS + ["-Xmx16g", "-cp",
           classes + ":/opt/spark/jars/*", "graft.Bench"] + queries)
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf
    env["SPARK_GRAFT_CPUS"] = env.get("SPARK_GRAFT_CPUS", "32")
    env.pop("SPARK_GRAFT_WARMUP", None)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env)
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(p.stderr[-2000:])
        raise SystemExit("no bench JSON")
    d = json.loads(lines[-1])
    if d.get("failed"):
        raise SystemExit("failed: %s" % d["failed"])
    return d["queries"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    ra, rb = [], []
    for i in range(args.reps):
        ra.append(run(args.a, args.sf, args.queries))
        rb.append(run(args.b, args.sf, args.queries))
    print(f"{'query':28s} {'A(min)':>8s} {'B(min)':>8s} {'B/A':>6s}")
    for q in args.queries:
        amin = min(r[q] for r in ra)
        bmin = min(r[q] for r in rb)
        print(f"{q:28s} {amin:8.2f} {bmin:8.2f} {bmin/amin:6.2f}")


if __name__ == "__main__":
    main()
