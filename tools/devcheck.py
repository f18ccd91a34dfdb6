#!/usr/bin/env python3
"""Local imitation of the driver's correctness gate.

Runs graft.Verify on a scale factor, then re-runs every oracle SQL in
DuckDB over the same parquet tables and diffs the results (columns
sorted by name, rows sorted by all columns, values compared after
float rounding). Dev-only tool — the shipped library has no Python.

Usage: python3 tools/devcheck.py [sfdir] [--only q_name,...] [--skip-run]
"""
import json, math, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT = "/tmp/verify_out"
ONLY = None
for i, a in enumerate(sys.argv):
    if a == "--only":
        ONLY = set(sys.argv[i + 1].split(","))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def classpath():
    jars = "/opt/spark/jars/*"
    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    return f"{classes}:{jars}"


def run_verify():
    opens = []
    for p in ["java.base/java.lang", "java.base/java.lang.invoke",
              "java.base/java.lang.reflect", "java.base/java.io",
              "java.base/java.net", "java.base/java.nio",
              "java.base/java.util", "java.base/java.util.concurrent",
              "java.base/java.util.concurrent.atomic",
              "java.base/sun.nio.ch", "java.base/sun.nio.cs",
              "java.base/sun.security.action",
              "java.base/sun.util.calendar"]:
        opens += ["--add-opens", f"{p}=ALL-UNNAMED"]
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    cmd = ["java", *opens, "-Xmx8g", "-Dspark.ui.enabled=false",
           "-cp", classpath(), "graft.Verify", SF, OUT,
           *(sorted(ONLY) if ONLY else [])]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print(line)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)


def norm_val(v):
    # Type-tagged: the driver hashes values, so a DuckDB HUGEINT that
    # pandas renders as float64 (e.g. an uncast window sum) must NOT
    # compare equal to a Spark int64 — Python's 0.0 == 0 would hide it.
    if v is None:
        return None
    import numpy as np
    if isinstance(v, (bool, np.bool_)):  # before int: bool <: int
        return ("b", bool(v))
    if isinstance(v, float):  # covers numpy.float64 (subclass)
        if math.isnan(v):
            return "NaN"
        return ("f", round(v, 6))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    return v


def table_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_val(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def main():
    import duckdb
    import pandas as pd

    if "--skip-run" not in sys.argv:
        run_verify()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    with open(os.path.join(OUT, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_noracle = 0
    for name in sorted(os.listdir(OUT)):
        d = os.path.join(OUT, name)
        if not os.path.isdir(d):
            continue
        if ONLY and name not in ONLY:
            continue
        got = pd.read_parquet(d)
        if name not in oracles:
            print(f"  ~ {name}: no oracle, rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        gc, gr = table_rows(got)
        ec, er = table_rows(exp)
        if gc != ec:
            print(f"  ✗ {name}: COLS spark={gc} duckdb={ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"  ✗ {name}: ROWS spark={len(gr)} duckdb={len(er)}")
            n_fail += 1
        elif gr != er:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b]
            print(f"  ✗ {name}: {len(diffs)} differing rows; first: "
                  f"spark={diffs[0][0]} duckdb={diffs[0][1]}")
            n_fail += 1
        else:
            print(f"  ✓ {name}: {len(gr)} rows")
            n_pass += 1
    print(f"PASS={n_pass} FAIL={n_fail} NO-ORACLE={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
