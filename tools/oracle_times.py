#!/usr/bin/env python3
"""Per-oracle DuckDB cost profiler / CI gate.

Usage: python3 tools/oracle_times.py <oracle_sql_dir_or_json> <sf_dir> \
          [--limit-cpu 60] [--only name1,name2] [--json out.json]

Runs each oracle SQL in its own subprocess (fresh DuckDB connection,
same view registration as tools/check.py), measures wall + CPU time,
and FAILS (exit 1) if any single oracle exceeds --limit-cpu seconds of
CPU. This is the guard for the driver's CORRECTNESS sweep budget: the
sum over all oracles is what the driver pays at sf0.01.
"""
import sys, os, json, glob, time, subprocess, argparse

WORKER = r'''
import sys, time, os, resource, duckdb
sql_path, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
sql = open(sql_path).read()
t0 = time.monotonic()
n = len(con.sql(sql).fetchall())
wall = time.monotonic() - t0
ru = resource.getrusage(resource.RUSAGE_SELF)
print(f"RESULT {wall:.3f} {ru.ru_utime + ru.ru_stime:.3f} {n}")
'''

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src"); ap.add_argument("sf_dir")
    ap.add_argument("--limit-cpu", type=float, default=60.0)
    ap.add_argument("--timeout", type=float, default=300.0)
    ap.add_argument("--only", default="")
    ap.add_argument("--json", default="")
    a = ap.parse_args()

    if a.src.endswith(".json"):
        oracles = json.load(open(a.src))
        items = sorted(oracles.items())
    else:
        items = sorted((os.path.basename(p)[:-4], open(p).read())
                       for p in glob.glob(f"{a.src}/*.sql"))
    if a.only:
        keep = set(a.only.split(","))
        items = [(n, s) for n, s in items if n in keep]

    os.makedirs("/tmp/oracle_prof", exist_ok=True)
    rows, failures = [], []
    for name, sql in items:
        sp = f"/tmp/oracle_prof/{name}.sql"
        open(sp, "w").write(sql)
        t0 = time.monotonic()
        try:
            out = subprocess.run([sys.executable, "-c", WORKER, sp, a.sf_dir],
                                 capture_output=True, text=True, timeout=a.timeout)
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
            if out.returncode != 0 or not line:
                rows.append((name, None, None, None, "ERROR"))
                failures.append((name, out.stderr.strip()[-300:]))
                print(f"[ERR ] {name}: {out.stderr.strip()[-200:]}")
                continue
            wall, cpu, n = line[0].split()[1:]
            wall, cpu, n = float(wall), float(cpu), int(n)
            status = "SLOW" if cpu > a.limit_cpu else "ok"
            if status == "SLOW":
                failures.append((name, f"cpu {cpu:.1f}s > limit {a.limit_cpu}s"))
            rows.append((name, wall, cpu, n, status))
            print(f"[{status:4}] {name}: wall {wall:7.2f}s  cpu {cpu:7.2f}s  rows {n}")
        except subprocess.TimeoutExpired:
            rows.append((name, a.timeout, None, None, "TIMEOUT"))
            failures.append((name, f"wall timeout {a.timeout}s"))
            print(f"[TIME] {name}: exceeded {a.timeout}s wall")
    total_wall = sum(r[1] for r in rows if r[1] is not None)
    total_cpu = sum(r[2] for r in rows if r[2] is not None)
    print(f"\nTOTAL: wall {total_wall:.1f}s  cpu {total_cpu:.1f}s over {len(rows)} oracles")
    top = sorted((r for r in rows if r[2] is not None), key=lambda r: -r[2])[:15]
    print("Top by CPU:")
    for name, wall, cpu, n, st in top:
        print(f"  {cpu:7.2f}s cpu  {wall:7.2f}s wall  {name}")
    if a.json:
        json.dump({"total_wall": total_wall, "total_cpu": total_cpu,
                   "oracles": [{"name": r[0], "wall": r[1], "cpu": r[2],
                                "rows": r[3], "status": r[4]} for r in rows]},
                  open(a.json, "w"), indent=1)
    if failures:
        print(f"\n{len(failures)} FAILURES (cpu limit {a.limit_cpu}s):")
        for n, why in failures:
            print(f"  {n}: {why}")
        sys.exit(1)

if __name__ == "__main__":
    main()
