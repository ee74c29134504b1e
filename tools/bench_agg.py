#!/usr/bin/env python3
"""Aggregate N single-run BENCH_full artifacts into the round record.

Usage: python3 tools/bench_agg.py [--prev PREV_RECORD.json] OUT.json \
           RUN1.json RUN2.json ...

Emits the committed round artifact with BOTH series (VERDICT r12
item 6 — round-over-round diffs were polluted by ~8% box-load drift):

  - "queries":            per-query raw medians (seconds), the series
                          every earlier round carried;
  - "queries_normalized": per-query median of (time / that run's
                          calibration-probe median) — unit is
                          "probe-multiples", a dimensionless number
                          that cancels box drift because the fixed
                          2M-row probe slows down exactly when the box
                          does.  Cross-round comparison of THIS series
                          isolates code effects from machine load.
  - "probe_median_sec":   the median probe value across runs, so a
                          normalized value converts back to seconds.

The per-run probe median is median(before, mid, after) from the run's
own calibration block; runs whose probes disagree wildly (max/min > 2)
are flagged in "calibration_flags" but still included — the normalized
series is exactly what absorbs that.

With --prev (the PREVIOUS round's committed record, e.g.
BENCH_full_r14.json), the output also carries a "regressions" block —
every query whose NORMALIZED median moved >1.25x vs that record, plus
queries added/removed — so round-over-round adjudication is mechanical
in the committed artifact instead of a judge recomputing it (r14
VERDICT item 2). Each entry: {query, prev, now, ratio}; dispositions
belong in SCALING.md next to the round's record.
"""
import json
import statistics
import sys


REGRESSION_RATIO = 1.25  # normalized round-over-round flag threshold


def regressions_vs(prev_path, norm):
    """Flag every query whose normalized median moved >1.25x vs the
    previous round's record AFTER dividing out the catalog-median
    ratio (the systematic shift). Both directions flag: slowdowns AND
    speedups need a disposition — an unexplained speedup is a
    measurement or semantics change until adjudicated.

    Why the double normalization: the calibration probe cancels CPU
    drift, but a uniform environment change it does not measure
    (scheduler latency, page cache, IO) shifts EVERY query's
    probe-multiple by a constant — the first r15 aggregation saw 150
    of 273 queries 'move' by exactly the catalog-median x0.78. What
    needs adjudication is what moved DIFFERENTLY from the catalog, so
    entries flag on ratio / median(ratio). The systematic shift itself
    is reported once as "systematic_shift" (worth a one-line
    disposition of its own when far from 1.0).

    Sub-probe-scale queries (normalized < 0.5 in both rounds, i.e.
    faster than half the 2M-row calibration probe) are exempt: their
    medians are dominated by scheduling jitter, not plan cost."""
    prev = json.load(open(prev_path))
    pnorm = prev.get("queries_normalized")
    if not pnorm:
        return {"prev_record": prev_path,
                "error": "previous record has no queries_normalized"}
    ratios = {}
    for q in sorted(set(norm) & set(pnorm)):
        a, b = pnorm[q], norm[q]
        if a <= 0 or b <= 0 or max(a, b) < 0.5:
            continue
        ratios[q] = (b / a, a, b)
    shift = (statistics.median(r for r, _, _ in ratios.values())
             if ratios else 1.0)
    flagged = []
    for q, (ratio, a, b) in ratios.items():
        rel = ratio / shift
        if rel > REGRESSION_RATIO or rel < 1 / REGRESSION_RATIO:
            flagged.append({"query": q, "prev": a, "now": b,
                            "ratio": round(ratio, 2),
                            "vs_shift": round(rel, 2)})
    flagged.sort(key=lambda e: -e["vs_shift"])
    return {"prev_record": prev_path, "threshold": REGRESSION_RATIO,
            "noise_floor_norm": 0.5,
            "systematic_shift": round(shift, 3),
            "added": sorted(set(norm) - set(pnorm)),
            "removed": sorted(set(pnorm) - set(norm)),
            "flagged": flagged}


def main() -> None:
    argv = sys.argv[1:]
    prev_path = None
    if argv and argv[0] == "--prev":
        prev_path, argv = argv[1], argv[2:]
    out_path, run_paths = argv[0], argv[1:]
    runs = [json.load(open(p)) for p in run_paths]
    names = sorted(runs[0]["queries"].keys())
    for r in runs:
        if sorted(r["queries"].keys()) != names:
            sys.exit("run files disagree on the query set")

    probes, flags = [], []
    for p, r in zip(run_paths, runs):
        c = r["calibration"]
        vals = [v for v in (c["before"], c.get("mid", -1), c["after"])
                if v and v > 0]
        if not vals:
            sys.exit(f"run {p}: no positive calibration probes "
                     f"(calibration={c!r}) — rerun or drop this file")
        probes.append(statistics.median(vals))
        if max(vals) / min(vals) > 2:
            flags.append(p)

    # Bench.scala records a FAILED query's time as a negative number and
    # computes each run's "value" as sum(abs(t)).  Median over signed
    # per-run times, then abs(), matches that convention — a query that
    # failed in the median run contributes its magnitude to the total
    # instead of subtracting from it (r13 ADVICE, medium).
    raw = {n: round(abs(statistics.median(
        [r["queries"][n] for r in runs])), 3) for n in names}
    norm = {n: round(abs(statistics.median(
        [r["queries"][n] / pm for r, pm in zip(runs, probes)])), 2)
        for n in names}
    errors = sorted({e for r in runs for e in r.get("errors", [])})

    rec = {
        "metric": "total",
        "value": round(sum(raw.values()), 3),
        "unit": "sec",
        "phase": runs[-1].get("phase", "midround"),
        "run_at": runs[-1].get("run_at"),
        "aggregation": (
            f"per-query median of {len(runs)} runs; queries_normalized = "
            "median(time / run probe median), dimensionless — cancels box "
            "drift (see tools/bench_agg.py)"),
        "run_totals": [round(r["value"], 3) for r in runs],
        "probe_medians_sec": [round(p, 4) for p in probes],
        "probe_median_sec": round(statistics.median(probes), 4),
        "calibration_flags": flags,
        "queries": raw,
        "queries_normalized": norm,
        "errors": errors,
        "calibration": runs[-1]["calibration"],
        "loadavg": runs[-1]["loadavg"],
        "cpu_sec": round(sum(r["cpu_sec"] for r in runs) / len(runs), 1),
        "sf": runs[-1]["sf"],
        "n_queries": len(names),
    }
    if prev_path:
        rec["regressions"] = regressions_vs(prev_path, norm)
    with open(out_path, "w") as f:
        json.dump(rec, f)
        f.write("\n")
    print(f"wrote {out_path}: total={rec['value']}s over {len(names)} "
          f"queries, {len(runs)} runs, probe_median={rec['probe_median_sec']}s"
          + (f", FLAGGED: {flags}" if flags else ""))
    if prev_path:
        r = rec["regressions"]
        fl = r.get("flagged", [])
        print(f"regressions vs {prev_path}: systematic_shift="
              f"{r.get('systematic_shift')}, {len(fl)} flagged "
              + ", ".join(f"{e['query']} x{e['ratio']}"
                          f"({e['vs_shift']} vs shift)" for e in fl[:10]))


if __name__ == "__main__":
    main()
