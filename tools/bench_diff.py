#!/usr/bin/env python3
"""Compare two bench JSON artifacts, normalized for host speed.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold]

Prints per-query ratios (new/old), optionally normalized by the
cpu_probe_ms each artifact carries (r11+): if both files have a probe,
ratios are divided by probe_new/probe_old so a slower container does not
read as an engine regression. Queries above `threshold` (default 2.0)
after normalization are listed as regressions; exit 1 if any.

Accepts either the full artifact (target/bench.json / BENCH_FULL.json)
or a driver BENCH_r*.json whose `queries` map holds only the slowest
subset — comparison runs over the intersection.
"""
import json, sys

# 1-min loadavg gap above which the NEW artifact was recorded under
# materially more host contention than the old one. The single-core
# md5 probe CANNOT see 32-thread contention — in the r16 round the probe
# read the loaded host as FASTER (44 -> 34 ms) and amplified phantom
# regressions by 1/0.77 — so when the NEW side is loaded by this much,
# rows above threshold are demoted to suspects instead of failing the
# gate. The gap is DIRECTIONAL (r18, per the r17 advice): when the OLD
# artifact was the loaded one and the new run is quiet, an
# above-threshold row was just CONFIRMED on a quiet host — demoting it
# would weaken the gate in exactly the direction the r16 incident
# taught; such rows stay hard regressions, flagged with the old-side
# load as supporting evidence.
LOAD_GAP = 1.5


def load(path):
    raw = open(path).read().strip()
    # tolerate an sbt "[info] " prefix on captured lines
    if raw.startswith("[info] "):
        raw = raw[len("[info] "):]
    return json.loads(raw)


def load1(artifact):
    """1-min loadavg at recording start, or None (pre-r16 artifacts)."""
    s = artifact.get("loadavg_start")
    try:
        return float(s.split()[0]) if s else None
    except (ValueError, AttributeError):
        return None


def diff(old, new, threshold=2.0):
    """Probe-normalized per-query comparison of two loaded artifacts.

    Returns (rows, regressions, suspects, norm, both_probed,
    old_loaded): rows are (query, old_sec, new_sec, normalized_ratio)
    sorted worst-first; regressions is the subset above `threshold` that
    is ALSO slower in raw wall time (> 1.25x) AND whose NEW artifact was
    not recorded under materially higher host load than the old one;
    suspects are (row, reason) pairs above `threshold` normalized that
    fail one of those demotion checks — reported for adjudication, never
    silently dropped. old_loaded reports the symmetric case (the OLD
    artifact carried the contention): an above-threshold row then stands
    as a regression only if its RAW wall ratio also clears the full
    threshold — old-side contention can distort the probe itself (an
    inflated old probe shrinks norm = pn/po and inflates every
    normalized ratio), so a row that is above threshold only AFTER
    normalization against a loaded baseline is a suspect to re-measure,
    not a verdict. Raw wall against an inflated old_sec UNDER-reads, so
    raw > threshold cannot be a load phantom.

    Why the raw floor: the probe exists to catch a SLOWER container
    masking a real regression (r11: raw 1.6-2.5x on a quiet host, probe
    agreed — normalization cleared the engine). The symmetric artifact
    is a FASTER probe on a raw-equal run: the single-core md5 chain
    sped up 96 -> 45 ms between the r14 and r15 containers while the
    32-thread suite total fell 443 -> 362 s raw, and pure normalization
    read that as 55 uniform ~2.1x "regressions" — half of them with
    new_raw < old_raw, which no engine regression can produce. But the
    fixed 1.25x floor is blind to a genuine regression the faster host
    partially absorbs (host 2.1x faster + engine 2.5x slower -> raw
    1.19x <= 1.25, normalized 2.5x > 2.0): such rows are returned as
    suspects — above threshold after normalization, under the raw floor
    — so the caller prints them for adjudication (re-measure in
    isolation) instead of the gate eating them.

    Why the load check: both artifacts carry loadavg_start (r16+). When
    the NEW artifact's 1-min load exceeds the old's by LOAD_GAP, the new
    run was measured under contention the probe cannot represent (r16:
    the driver bench ran at loadavg 2.94 rising to 5.04 and flagged
    q_triangles at 2.01x, while the quiet re-run of the same HEAD was
    FASTER than the prior round). Such rows demote to suspects with a
    "loaded host" reason — re-record on a quiet host to adjudicate. The
    check is one-sided: contention on the OLD side makes old_sec too
    big and ratios too SMALL, so a row still above threshold against a
    loaded old artifact is a regression a quiet re-run just confirmed —
    demoting it (the pre-r18 abs() behavior) would have let genuine
    regressions ride a historically-loaded baseline through the gate.
    """
    po, pn = old.get("cpu_probe_ms"), new.get("cpu_probe_ms")
    both_probed = bool(po and pn and po > 0 and pn > 0)
    norm = (pn / po) if both_probed else 1.0
    lo, ln = load1(old), load1(new)
    # Directional: only NEW-side contention inflates new_sec and warrants
    # demotion. OLD-side contention inflates old_sec, which UNDER-reads
    # ratios — an above-threshold row despite a loaded old artifact was
    # confirmed by the quiet new run and must stay a hard regression.
    new_loaded = (lo is not None and ln is not None and ln - lo > LOAD_GAP)
    old_loaded = (lo is not None and ln is not None and lo - ln > LOAD_GAP)
    load_reason = (f"loaded host (loadavg_start {lo:.2f} vs {ln:.2f})"
                   if new_loaded else None)
    oq, nq = old["queries"], new["queries"]
    rows = []
    for q in sorted(set(oq) & set(nq)):
        if oq[q] <= 0:
            continue
        rows.append((q, oq[q], nq[q], (nq[q] / oq[q]) / norm))
    rows.sort(key=lambda r: -r[3])
    over = [r for r in rows if r[3] > threshold]
    regressions, suspects = [], []
    for r in over:
        if new_loaded:
            suspects.append((r, load_reason))
        elif old_loaded and r[2] / r[1] <= threshold:
            # The old-side load that inflated old_sec can also have
            # inflated the old PROBE, shrinking norm and inflating every
            # normalized ratio — the raw 1.25x floor alone does not rule
            # that phantom out. Demand the raw ratio clear the full
            # threshold before a loaded baseline convicts a row.
            suspects.append((r, "old side loaded — above threshold only "
                                f"after probe normalization (raw "
                                f"{r[2]/r[1]:.2f}x <= {threshold}x); "
                                "re-measure against a quiet baseline"))
        elif r[2] / r[1] > 1.25:
            regressions.append(r)
        else:
            suspects.append((r, "raw <= 1.25x floor — container drift or "
                                "a regression absorbed by a faster host"))
    return rows, regressions, suspects, norm, both_probed, old_loaded


def main(old_path, new_path, threshold=2.0):
    old, new = load(old_path), load(new_path)
    po, pn = old.get("cpu_probe_ms"), new.get("cpu_probe_ms")
    rows, regressions, suspects, norm, both_probed, old_loaded = \
        diff(old, new, threshold)
    if both_probed:
        print(f"host normalization: probe {po} -> {pn} ms "
              f"(dividing ratios by {norm:.2f})")
    else:
        print("no probe in one/both artifacts: raw ratios "
              "(host drift not separable)")
    lo, ln = load1(old), load1(new)
    if lo is not None and ln is not None:
        note = ""
        if ln - lo > LOAD_GAP:
            note = (f" — NEW side loaded by > {LOAD_GAP}, above-threshold "
                    f"rows demote to suspect (single-core probe can't see "
                    f"32-thread contention)")
        elif old_loaded:
            note = (f" — OLD side was the loaded one; above-threshold rows "
                    f"stand only if their RAW ratio also clears the "
                    f"threshold (old-side load can distort the probe "
                    f"normalization itself)")
        print(f"loadavg_start: {lo:.2f} -> {ln:.2f}{note}")
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    if not common:
        print("no common queries")
        return 1
    print(f"{len(common)} common queries; "
          f"totals {sum(oq[q] for q in common):.1f}s -> "
          f"{sum(nq[q] for q in common):.1f}s "
          f"(normalized ratio "
          f"{(sum(nq[q] for q in common)/sum(oq[q] for q in common))/norm:.2f}x)")
    for q, o, n, r in rows[:10]:
        flag = "  <-- REGRESSION" if r > threshold else ""
        print(f"  {q:30s} {o:8.3f}s -> {n:8.3f}s  {r:5.2f}x{flag}")
    if suspects:
        print(f"{len(suspects)} SUSPECT row(s): above {threshold}x "
              f"normalized but demoted — re-measure in isolation to "
              f"adjudicate:")
        for (q, o, n, r), reason in suspects:
            print(f"  {q:30s} {o:8.3f}s -> {n:8.3f}s  {r:5.2f}x norm, "
                  f"{n/o:5.2f}x raw — {reason}")
    if regressions:
        print(f"{len(regressions)} queries above {threshold}x normalized")
        return 1
    print(f"no query above {threshold}x normalized")
    return 0


if __name__ == "__main__":
    th = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sys.exit(main(sys.argv[1], sys.argv[2], th))
