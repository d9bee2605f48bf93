#!/usr/bin/env python3
"""Summarize the scale-probe benches into SCALING.md.

Usage: python3 tools/scaling_summary.py X1.json X10.json N [out.md]

Reads two Bench artifacts produced against the ScaleReplica corpora
(same query list, factor-N data) and emits a per-query table of steady
seconds, ratio, and the empirical scaling exponent
log(tN/t1)/log(N). Exponent ≈ 1 is linear; ≲ 0.5 usually means the
query is dominated by fixed job/driver latency at this scale; ≳ 1.3 is
flagged SUPER-LINEAR and deserves a plan audit.
"""
import json
import math
import sys


def main(argv):
    with open(argv[1]) as f:
        a = json.load(f)
    with open(argv[2]) as f:
        b = json.load(f)
    n = float(argv[3])
    qa = a["full"]["queries_steady"]
    qb = b["full"]["queries_steady"]
    rows = []
    for k in sorted(set(qa) & set(qb)):
        t1, tn = qa[k], qb[k]
        if t1 <= 0 or tn <= 0:
            continue
        ratio = tn / t1
        exp = math.log(ratio) / math.log(n) if ratio > 0 else float("nan")
        rows.append((k, t1, tn, ratio, exp))
    rows.sort(key=lambda r: -r[4])
    lines = [
        "| query | steady 1x (s) | steady %dx (s) | ratio | exponent |" % int(n),
        "| --- | --- | --- | --- | --- |",
    ]
    for k, t1, tn, ratio, exp in rows:
        flag = " **SUPER-LINEAR**" if exp > 1.3 else ""
        lines.append(f"| `{k}` | {t1:.2f} | {tn:.2f} | {ratio:.2f}x | {exp:.2f}{flag} |")
    total1 = sum(r[1] for r in rows)
    totaln = sum(r[2] for r in rows)
    lines.append(f"| **total** | {total1:.1f} | {totaln:.1f} | "
                 f"{totaln / total1:.2f}x | "
                 f"{math.log(totaln / total1) / math.log(n):.2f} |")
    out = "\n".join(lines)
    print(out)
    if len(argv) > 4:
        with open(argv[4], "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
