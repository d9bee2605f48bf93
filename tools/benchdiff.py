#!/usr/bin/env python3
"""Per-query bench regression gate over BENCH_local.json artifacts.

Usage:
  python3 tools/benchdiff.py                 # new=BENCH_local.json, old=HEAD's copy
  python3 tools/benchdiff.py NEW.json OLD.json

Compares per-query STEADY seconds (the attributable pass — cold mixes in
codegen/JIT warm-up) between two bench artifacts and FAILS (exit 1) when
any query regressed more than RATIO_MAX with more than ABS_FLOOR_SEC of
absolute growth. Both gates are required: a 0.1 s -> 0.2 s blip is
jitter, not a plan regression, and a 5 s -> 6 s drift is real work even
though the ratio is small — hence the separate absolute-growth report.

New/removed queries are informational (the suite is expected to grow).
Host load is printed from each artifact's env so a loaded-host run is
readable as such rather than as a code regression.
"""
import json
import subprocess
import sys

RATIO_MAX = 1.5       # steady ratio above this AND ...
ABS_FLOOR_SEC = 0.5   # ... absolute growth above this = regression
ABS_ALERT_SEC = 1.5   # pure absolute growth worth flagging even at low ratio


def steady(doc):
    return {k: v for k, v in doc["full"]["queries_steady"].items() if v >= 0}


def load_new_old(argv):
    new_path = argv[1] if len(argv) > 1 else "BENCH_local.json"
    with open(new_path) as f:
        new = json.load(f)
    if len(argv) > 2:
        with open(argv[2]) as f:
            old = json.load(f)
        old_name = argv[2]
    else:
        # previous committed artifact: BENCH_local.json as of HEAD
        blob = subprocess.run(
            ["git", "show", "HEAD:BENCH_local.json"],
            capture_output=True, text=True, check=True).stdout
        old = json.loads(blob)
        old_name = "HEAD:BENCH_local.json"
    return new, new_path, old, old_name


def main(argv):
    new, new_name, old, old_name = load_new_old(argv)
    ns, os_ = steady(new), steady(old)

    def describe(name, doc, qs):
        env = doc["full"].get("env", {})
        gc = doc.get("summary", {}).get("gc_total_ms", "?")
        print(f"{name}  ({len(qs)} queries, steady {sum(qs.values()):.1f} s, "
              f"loadavg {env.get('loadavg', '?')}, "
              f"heap {env.get('heap_max_mb', '?')} MB, gc {gc} ms)")

    describe(f"new: {new_name}", new, ns)
    describe(f"old: {old_name}", old, os_)
    # GC tax is the classic confounder for uniform 1.5-2.5x drift across
    # UNRELATED queries (allocation-heavy neighbors get collected during
    # later queries' timing windows): a large gc_total_ms gap between the
    # artifacts means per-query ratios are environment, not plans. The
    # threshold is 2.5x (was 5x): a measured 4.2x GC gap produced five
    # phantom >1.5x flags that all cleared under SPARK_GRAFT_ONLY
    # isolation (1.9/4.2/4.9 s vs 1.6/4.0/5.1 committed).
    try:
        g_new = float(new["summary"]["gc_total_ms"])
        g_old = float(old["summary"]["gc_total_ms"])
        if g_old > 0 and (g_new / g_old > 2.5 or g_old / g_new > 2.5):
            print(f"WARNING: gc_total_ms differs {g_new / g_old:.1f}x between "
                  "artifacts — uniform per-query drift below is likely GC/host "
                  "noise, not plan regressions; re-run on a quiet host before "
                  "acting on individual rows")
    except (KeyError, TypeError, ValueError, ZeroDivisionError):
        pass

    added = sorted(set(ns) - set(os_))
    removed = sorted(set(os_) - set(ns))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")

    regressions, alerts, improved = [], [], []
    for k in sorted(set(ns) & set(os_)):
        a, b = os_[k], ns[k]
        if a <= 0:
            continue
        ratio, delta = b / a, b - a
        if ratio > RATIO_MAX and delta > ABS_FLOOR_SEC:
            regressions.append((k, a, b, ratio))
        elif delta > ABS_ALERT_SEC:
            alerts.append((k, a, b, ratio))
        elif ratio < 1 / RATIO_MAX and -delta > ABS_FLOOR_SEC:
            improved.append((k, a, b, ratio))

    for title, rows in (("REGRESSED", regressions),
                        ("grew (absolute)", alerts),
                        ("improved", improved)):
        if rows:
            print(f"\n{title}:")
            for k, a, b, r in sorted(rows, key=lambda t: -t[3]):
                print(f"  {k:30s} {a:7.2f} s -> {b:7.2f} s  ({r:.2f}x)")

    if regressions:
        print(f"\nFAIL: {len(regressions)} per-query steady regression(s) "
              f"beyond {RATIO_MAX}x (+{ABS_FLOOR_SEC} s floor)")
        return 1
    print(f"\nOK: no steady regression beyond {RATIO_MAX}x "
          f"(+{ABS_FLOOR_SEC} s floor) across {len(set(ns) & set(os_))} shared queries")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
