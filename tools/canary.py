#!/usr/bin/env python3
"""Pinned bench canary (round-7 measurement governance): run the fixed
query subset in tools/canary_queries.txt ISOLATED — a fresh JVM per
rep, Bench's full warm-up ON — and report per-query min/median/max
across reps. The min is the comparison number across rounds
(single-box scheduler noise is one-sided); the max-min spread is the
session's noise band, printed so drift can't hide in it.

Usage: canary.py [--sf DIR] [--reps N] [--classes CP] [--out FILE]
Run on a QUIET box: no sbt, no corpus generation, nothing else.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

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


def canary_queries():
    path = os.path.join(HERE, "canary_queries.txt")
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(line)
    return out


def run_rep(classes, sf, queries):
    cmd = (
        ["java"] + OPENS + ["-Xmx16g", "-cp",
         classes + ":/opt/spark/jars/*", "graft.Bench"] + queries
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf
    env["SPARK_GRAFT_CPUS"] = env.get("SPARK_GRAFT_CPUS", "32")
    env.pop("SPARK_GRAFT_WARMUP", None)  # warm-up ON — the protocol
    p = subprocess.run(cmd, capture_output=True, text=True, env=env)
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not line:
        sys.stderr.write(p.stderr[-2000:])
        raise SystemExit("no bench JSON line")
    d = json.loads(line[-1])
    if d.get("failed"):
        raise SystemExit("failed queries: %s" % d["failed"])
    return d["queries"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--classes",
                    default=os.path.join(REPO, "target/scala-2.13/classes"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    qs = canary_queries()
    reps = []
    for r in range(args.reps):
        reps.append(run_rep(args.classes, args.sf, qs))
        done = sum(reps[-1].values())
        print("rep %d/%d: subtotal %.1f s" % (r + 1, args.reps, done),
              file=sys.stderr)

    rows = []
    for q in sorted(qs):
        vals = sorted(rep[q] for rep in reps)
        rows.append((q, vals[0], statistics.median(vals), vals[-1]))

    print("%-24s %8s %8s %8s %7s" % ("query", "min", "median", "max",
                                     "spread"))
    for q, lo, med, hi in rows:
        print("%-24s %8.2f %8.2f %8.2f %6.0f%%"
              % (q, lo, med, hi, 100.0 * (hi - lo) / lo if lo else 0))
    tot = sum(r[1] for r in rows)
    print("%-24s %8.2f  (sum of per-query mins over %d reps)"
          % ("TOTAL(min)", tot, args.reps))

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "sf": args.sf, "reps": args.reps, "classes": args.classes,
                "queries": {q: {"min": lo, "median": med, "max": hi}
                            for q, lo, med, hi in rows},
                "total_min": tot,
            }, f, indent=1, sort_keys=True)
        print("wrote %s" % args.out, file=sys.stderr)


if __name__ == "__main__":
    main()
