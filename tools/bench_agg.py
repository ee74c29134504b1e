#!/usr/bin/env python3
"""Aggregate N single-run BENCH_full artifacts into the round record.

Usage: python3 tools/bench_agg.py OUT.json RUN1.json RUN2.json ...

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
"""
import json
import statistics
import sys


def main() -> None:
    out_path, run_paths = sys.argv[1], sys.argv[2:]
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
    with open(out_path, "w") as f:
        json.dump(rec, f)
        f.write("\n")
    print(f"wrote {out_path}: total={rec['value']}s over {len(names)} "
          f"queries, {len(runs)} runs, probe_median={rec['probe_median_sec']}s"
          + (f", FLAGGED: {flags}" if flags else ""))


if __name__ == "__main__":
    main()
