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
vs 4 SMJ at f10). Comparing two bigger fixtures shrinks but does NOT
eliminate the artifact — different tables cross the boundary at different
decades (the TPC-H fact joins shuffle ~0 MB at f10 and 100-300 MB at f26,
exactly when orders/customer outgrow the broadcast threshold), so the gate
CLASSIFIES instead of hard-failing on any ratio:

  - smaller-run shuffle < 4 MB            → `boundary` (the query was
    still broadcasting at the smaller fixture; no meaningful ratio —
    the equi-join plan pins in PlanSpec are the check that matters)
  - growth ≤ (f2/f1)·1.5                  → clean (linear cost model)
  - ≤ (f2/f1)²·1.5                        → `transition band` (reported;
    a second boundary crossing or a declared-quadratic component).
    Boundary crossings include AQE RUNTIME conversions the static plan
    does not show: q_tpch_q21 prints an identical 2-BHJ/4-SMJ tree at
    f10 and f26, yet moves 34 MB vs 313 MB — at f10 the nation-pruned
    lineitem side is small enough for AQE's runtime SMJ→BHJ rewrite,
    at f26 it is not. Correct behavior at both scales.
  - > (f2/f1)²·1.5                        → FLAG, exit 1 (faster than
    quadratic is a defect under every declared cost model)

Quadratic-by-construction rows — the ledgers' declared baselines plus the
brute-force ground-truth evaluation family (their query set grows WITH the
corpus by design: sims volume = queries × corpus; the production twins are
the LSH/IVF rows) — are budgeted at (f2/f1)² from the start.

With THREE decades on disk, pass the earliest as `--prior earliest.json`:
a row the two-point compare flags gets reclassified `transition` when its
prior-decade byte growth sat within the LINEAR budget — a genuinely
quadratic component would have grown superlinearly in the prior decade
too, while a second broadcast-edge crossing (verified r15: both flagged
rows, q_decontam_ngram and q_entity_resolution, plan BroadcastHashJoin on
the heavy edge at f26 and SortMergeJoin at f52 — correct planner behavior
at both scales) is linear before the edge converts. The reclassification
is printed with its prior-decade evidence, never silent.
"""
import argparse
import json
import sys

# Ground-truth evaluation rows whose shuffle is queries × corpus BY
# DESIGN (the query set scales with the corpus — the eval workload a
# growing corpus implies). Their production twins are the LSH/IVF paths.
GROUND_TRUTH_QUADRATIC = {
    "q_sim_topk_brute", "q_sim_recall", "q_sim_rp_topk", "q_sim_rp_recall",
    "q_sim_binary_recall", "q_sim_quant_topk", "q_sim_pq_recall",
    "q_sim_ivfpq_res_recall", "q_sim_int8_recall",
}

ap = argparse.ArgumentParser(
    description="Cross-decade shuffle-byte growth gate")
ap.add_argument("small", help="smaller-factor ScaleSuite ledger JSON")
ap.add_argument("large", help="larger-factor ScaleSuite ledger JSON")
ap.add_argument("--prior", default=None, metavar="LEDGER",
                help="earliest-decade ledger for flag reclassification")
ap.add_argument("--write-classes", action="store_true",
                help="persist the classification back into the LARGER "
                     "ledger as a `shuffle_classes` section, so the "
                     "committed artifact is self-describing instead of "
                     "the adjudication living only in README prose")
ap.add_argument("--adjudicate", action="append", default=[],
                metavar="NAME=EVIDENCE",
                help="reclassify a flagged row as a boundary crossing "
                     "with EXPLICIT executed-plan evidence (e.g. a "
                     "PlanProbe BHJ->SMJ printout) — the r15/r16 manual "
                     "adjudication path, now recorded in the artifact "
                     "instead of only README prose; never silent, the "
                     "evidence string is persisted verbatim")
cli = ap.parse_args()
prior = json.load(open(cli.prior)) if cli.prior else None
small = json.load(open(cli.small))
large = json.load(open(cli.large))
ratio = large["factor"] / small["factor"]
quad = set(large.get("quadratic_baselines", {})) | GROUND_TRUTH_QUADRATIC


def row_shuffle(row):
    """Scaled shuffle bytes from either ledger shape: ScaleSuite rows
    carry scaled_shuffle; ScaleGraph (targeted-decade) rows carry
    shuffle + status."""
    if row.get("status") not in (None, "ok"):
        return None
    if "scaled_shuffle" in row:
        return row["scaled_shuffle"]
    return row.get("shuffle")


# ScaleGraph ledgers also price the materialized builds per decade —
# include them (they carry the suite's LARGEST shuffles by design, and
# their declared cost models are the point of the fourth decade).
def rows_of(ledger):
    rows = dict(ledger["queries"])
    for name, row in ledger.get("materializations", {}).items():
        if "scaled_status" in row and row["scaled_status"] != "ok":
            continue
        rows.setdefault(name, row)
    return rows


large_rows = rows_of(large)
small_rows = rows_of(small)
boundary, clean, transition, flagged = [], [], [], []
for q, lv in sorted(large_rows.items()):
    sv = small_rows.get(q)
    if sv is None:
        continue
    s_sh, l_sh = row_shuffle(sv), row_shuffle(lv)
    if s_sh is None or l_sh is None:
        continue
    if l_sh < 64 * 1024 * 1024:
        continue
    if s_sh < 4 * 1024 * 1024:
        boundary.append((q, s_sh, l_sh))
        continue
    growth = l_sh / s_sh
    lin = ratio * 1.5
    qd = ratio * ratio * 1.5
    row = (growth, q, s_sh, l_sh)
    if q in quad:
        (clean if growth <= qd else flagged).append(row)
    elif growth <= lin:
        clean.append(row)
    elif growth <= qd:
        transition.append(row)
    else:
        flagged.append(row)


def show(rows, label):
    if not rows:
        return
    print(f"{label} ({len(rows)}):")
    for growth, q, s_sh, l_sh in sorted(rows, reverse=True):
        print(f"  {q:30s} {s_sh/2**20:9.1f}MB -> {l_sh/2**20:9.1f}MB"
              f"  x{growth:6.2f}")


# Three-decade reclassification: a flagged row whose PRIOR-decade byte
# growth sat within the linear budget is a second broadcast-edge
# crossing, not a quadratic component (which would have been superlinear
# in the prior decade too). Evidence printed, never silent.
reclassified = []
if prior is not None and flagged:
    p_ratio = small["factor"] / prior["factor"]
    still = []
    for row in flagged:
        growth, q, s_sh, l_sh = row
        pv = rows_of(prior).get(q, {})
        p_sh = row_shuffle(pv) or 0
        if p_sh > 0 and s_sh / p_sh <= p_ratio * 1.5:
            transition.append(row)
            evidence = (f"prior decade ({prior['factor']}x -> "
                        f"{small['factor']}x) grew x{s_sh/p_sh:.2f} <= "
                        f"linear budget {p_ratio*1.5:.2f} — second "
                        f"broadcast-edge crossing, not quadratic")
            reclassified.append({"name": q, "evidence": evidence})
            print(f"reclassified {q}: {evidence}")
        else:
            still.append(row)
    flagged = still
# Explicit-evidence adjudication: a flagged row named in --adjudicate
# moves to the transition band with the evidence persisted beside it.
for spec in cli.adjudicate:
    name, _, evidence = spec.partition("=")
    if not evidence:
        sys.exit(f"--adjudicate needs NAME=EVIDENCE, got {spec!r}")
    hits = [row for row in flagged if row[1] == name]
    if not hits:
        sys.exit(f"--adjudicate {name}: not in the flagged set "
                 f"{[q for _, q, _, _ in flagged]}")
    for row in hits:
        flagged.remove(row)
        transition.append(row)
        reclassified.append({"name": name, "evidence": evidence})
        print(f"adjudicated {name}: {evidence}")
print(f"factors {small['factor']} -> {large['factor']} "
      f"(ratio {ratio:.2f}; linear budget {ratio*1.5:.2f}, "
      f"quadratic budget {ratio*ratio*1.5:.2f})")
print(f"clean: {len(clean)}  transition-band: {len(transition)}  "
      f"boundary-crossing: {len(boundary)}  flagged: {len(flagged)}")
show(transition, "transition band (report — second boundary crossing or "
     "an undeclared quadratic component)")
if boundary:
    print(f"boundary-crossing (broadcast at the smaller fixture; plan "
          f"pins are the check): {[q for q, _, _ in boundary]}")
show(flagged, "FLAGGED (faster than quadratic)")

if cli.write_classes:
    def named(rows):
        return [{"name": q, "small_shuffle": s, "large_shuffle": l,
                 "growth": round(g, 2)}
                for g, q, s, l in sorted(rows, reverse=True)]
    large["shuffle_classes"] = {
        "vs": cli.small, "vs_factor": small["factor"],
        "ratio": round(ratio, 4),
        "linear_budget": round(ratio * 1.5, 4),
        "quadratic_budget": round(ratio * ratio * 1.5, 4),
        "clean": sorted(q for _, q, _, _ in clean),
        "transition": named(transition),
        "boundary": [{"name": q, "small_shuffle": s, "large_shuffle": l}
                     for q, s, l in boundary],
        "flagged": named(flagged),
        "reclassified": reclassified,
    }
    with open(cli.large, "w") as f:
        json.dump(large, f, separators=(",", ":"))
        f.write("\n")
    print(f"shuffle_classes section written into {cli.large}")
sys.exit(1 if flagged else 0)
