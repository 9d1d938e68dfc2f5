#!/usr/bin/env python3
"""Cross-decade shuffle-byte growth gate over two ScaleSuite ledgers.

Usage: python3 tools/shuffle_growth.py <smaller.json> <larger.json>
       (e.g. BENCH_SF1.json BENCH_SFx26.json)

Why this exists: the in-run `superlinear_shuffle` list in a single ledger
compares the scaled run against the sf0.1 base, and that ratio OVER-READS
whenever a join crosses the broadcast threshold between the two fixtures —
at sf0.1 AQE broadcasts the small side (zero shuffle on that edge), at 10×
it correctly switches to sort-merge, and a linear query reads as 20×-80×
byte growth (measured: q_graph_assortativity plans 2 BHJ + 2 SMJ at sf0.1
vs 4 SMJ at f10). Comparing two POST-TRANSITION fixtures (f10 → f26, both
past the broadcast boundary for every fixture-scaled table) removes the
artifact: a linear query's scaled_shuffle must grow ≈ f2/f1, a quadratic
one ≈ (f2/f1)².

Flags scaled_shuffle growth > (f2/f1) × 1.5 for linear-model queries and
> (f2/f1)² × 1.5 for the ledgers' declared quadratic baselines, with a
64 MB floor on the larger run (KB-sized shuffles are metadata noise).
Exit 1 if any query is flagged.
"""
import json
import sys

small = json.load(open(sys.argv[1]))
large = json.load(open(sys.argv[2]))
ratio = large["factor"] / small["factor"]
quad = set(large.get("quadratic_baselines", {}))

flagged = []
rows = []
for q, lv in large["queries"].items():
    sv = small["queries"].get(q)
    if sv is None:
        continue
    s_sh, l_sh = sv.get("scaled_shuffle", 0), lv.get("scaled_shuffle", 0)
    if l_sh < 64 * 1024 * 1024 or s_sh <= 0:
        continue
    growth = l_sh / s_sh
    budget = (ratio * ratio if q in quad else ratio) * 1.5
    rows.append((growth, q, s_sh, l_sh, budget))
    if growth > budget:
        flagged.append(q)

rows.sort(reverse=True)
print(f"factors {small['factor']} -> {large['factor']} (ratio {ratio:.2f}); "
      f"{len(rows)} queries above the 64 MB floor")
for growth, q, s_sh, l_sh, budget in rows[:15]:
    mark = " FLAG" if growth > budget else ""
    print(f"  {q:30s} {s_sh/2**20:9.1f}MB -> {l_sh/2**20:9.1f}MB  "
          f"x{growth:6.2f} (budget {budget:.2f}){mark}")
if flagged:
    print(f"FLAGGED: {flagged}")
    sys.exit(1)
print("shuffle growth clean: every query within its cost-model budget")
