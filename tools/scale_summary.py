#!/usr/bin/env python3
"""Summarize BENCH_SF1.json (the ScaleSuite growth ledger).

Usage: python3 tools/scale_summary.py [BENCH_SF1.json]

Prints the headline (factor, totals, effective growth), any
failed/timeout/superlinear queries, and the top-N queries by growth
factor and by absolute scaled time — the reading order for deciding
whether a query's scaling is the plan's fault or fixed-overhead noise.
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SF1.json"
d = json.load(open(path))

print(f"factor={d['factor']}  n={d['n_queries']}  "
      f"base_total={d['base_total']:.1f}s  scaled_total={d['scaled_total']:.1f}s  "
      f"effective_growth={d['scaled_total']/max(d['base_total'],1e-9):.2f}x")
print(f"scaled_rows={d['scaled_rows']}")
print(f"loadavg {d['loadavg_start']} -> {d['loadavg_end']}  "
      f"cpu_probe_ms={d['cpu_probe_ms']}")
for k in ("base_not_ok", "scaled_failed", "scaled_timeout", "superlinear"):
    if d.get(k):
        print(f"{k}: {d[k]}")

q = d["queries"]
ranked = [(n, v) for n, v in q.items() if v.get("x") is not None]
ranked.sort(key=lambda kv: kv[1]["x"], reverse=True)

print("\ntop 15 by growth factor (x):")
for n, v in ranked[:15]:
    print(f"  {v['x']:7.2f}x  base={v['base']:7.3f}s scaled={v['scaled']:8.3f}s"
          f"  shuffle={v['scaled_shuffle']/1e6:8.1f}MB  {n}")

by_abs = sorted(q.items(), key=lambda kv: kv[1]["scaled"], reverse=True)
print("\ntop 15 by absolute scaled time:")
for n, v in by_abs[:15]:
    x = f"{v['x']:.2f}x" if v.get("x") is not None else "n/a"
    print(f"  {v['scaled']:8.3f}s  ({x})  shuffle={v['scaled_shuffle']/1e6:8.1f}MB  {n}")

sub = [n for n, v in ranked if v["x"] <= d["factor"]]
print(f"\nqueries at or below linear growth (x <= {d['factor']}): "
      f"{len(sub)}/{len(ranked)}")
