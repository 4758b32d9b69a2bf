#!/usr/bin/env python3
"""Automated isolated-recheck protocol (r8 verdict task #5).

The per-round full boards run every query once in one shared JVM, so
individual entries can drift for non-engine reasons (board position,
GC, JIT warm-up depth). The r8 round hand-drove "isolated median-of-N
recheck for anything outside its historical band" and missed two
queries; this tool automates it:

  1. Build each query's HISTORICAL BAND from the committed bench
     artifacts (bench/*.json at the matching scale; every committed
     number is an observation).
  2. Diff a new board against the band: out-of-band = newValue >
     max(band) * TOL (default 1.30) and newValue - max(band) > ABS
     (default 0.5s — sub-second queries swing multiples on noise).
  3. Emit the SPARK_GRAFT_BENCH_ONLY list and (with --run) execute the
     isolated recheck at SPARK_GRAFT_REPEAT=9 (the r9 A/B showed
     repeat=3 medians carry +-0.4s cross-JVM noise; see SCALING.md r9),
     then classify each entry: RECHECK_OK (isolated median back inside
     band*TOL) or REGRESSED (still out) into a JSON report.

Usage:
  python3 tools/recheck.py --board newboard.json --scale sf1 \
      [--sfdir /tmp/sf1] [--run] [--out bench/recheck_rN.json]

The machine must be IDLE for --run (the bench protocol rule).
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys

TOL = 1.30
ABS = 0.5

# Band observations adjudicated INVALID (r13 VERDICT #6): a committed
# artifact row can measure a plan that no longer exists — keeping it in
# the band re-flags a known-honest number every round. Each entry drops
# observations below min_valid_s for (scale, query), with the diagnosis
# on record; purges are reported in the JSON artifact so a reader sees
# what the band excludes and why.
#   i5_knn_impute @ sf1: pre-r12 rows (0.66-0.96 s) timed a Catalyst
#   join-elimination artifact — count() deleted the kNN subtree
#   entirely, so the sub-second history measured NO kNN work at all
#   (diagnosed r12, SCALING.md "the i5 stale band"). The operator's
#   honest readings are 2.0-2.7 s.
BAND_PURGES = {
    ("sf1", "i5_knn_impute"): {
        "min_valid_s": 1.5,
        "reason": "pre-r12 observations timed a Catalyst join-eliminated "
                  "plan (kNN subtree deleted under count(); diagnosed "
                  "r12, SCALING.md) — not the operator",
    },
}


def load_queries(path):
    try:
        with open(path) as f:
            d = json.load(f)
    except (json.JSONDecodeError, OSError) as e:
        # an empty/truncated artifact (e.g. a board run that died before
        # writing) must not kill the whole band build
        print(f"[recheck] skipping unreadable {path}: {e}", file=sys.stderr)
        return {}
    return d.get("queries", {})


def scale_of(path, explicit):
    name = os.path.basename(path)
    if "sf01" in name or "sf0.1" in name:
        return "sf0.1"
    if "sf10" in name:  # the sf10 probe must not pollute the sf1 band
        return "sf10"
    if "sf1" in name:
        return "sf1"
    return explicit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--board", required=True, help="new board JSON")
    ap.add_argument("--scale", required=True, choices=["sf0.1", "sf1"])
    ap.add_argument("--sfdir", default=None,
                    help="data dir for --run (default by scale)")
    ap.add_argument("--bench-dir", default="bench")
    ap.add_argument("--tol", type=float, default=TOL)
    ap.add_argument("--abs", dest="abs_s", type=float, default=ABS)
    ap.add_argument("--run", action="store_true",
                    help="execute the isolated recheck (idle machine!)")
    ap.add_argument("--out", default=None, help="write JSON report here")
    ap.add_argument("--extra", default="",
                    help="comma-separated queries to force into the "
                         "isolated run even if in band (verdict MEASURED)")
    args = ap.parse_args()

    # 1. historical bands from every committed artifact at this scale
    bands = {}
    sources = {}
    purged = {}
    for p in sorted(glob.glob(os.path.join(args.bench_dir, "*.json"))):
        if os.path.abspath(p) == os.path.abspath(args.board):
            continue
        if scale_of(p, None) != args.scale:
            continue
        for q, t in load_queries(p).items():
            if not isinstance(t, (int, float)) or t < 0:
                continue
            rule = BAND_PURGES.get((args.scale, q))
            if rule and t < rule["min_valid_s"]:
                purged.setdefault(q, {"reason": rule["reason"],
                                      "dropped": []})
                purged[q]["dropped"].append(
                    {"value": t, "source": os.path.basename(p)})
                continue
            bands.setdefault(q, []).append(t)
            sources.setdefault(q, []).append(os.path.basename(p))
    for q, info in purged.items():
        print(f"[recheck] band purge {q}: dropped "
              f"{len(info['dropped'])} invalid observation(s) "
              f"({info['reason']})")

    new = load_queries(args.board)
    out_of_band = {}
    fresh = []
    for q, t in sorted(new.items()):
        if q not in bands:
            fresh.append(q)  # first measurement IS the band
            continue
        hi = max(bands[q])
        if t > hi * args.tol and t - hi > args.abs_s:
            out_of_band[q] = {"new": t, "band_max": hi,
                              "band": sorted(bands[q]),
                              "sources": sources[q]}

    report = {"scale": args.scale, "board": args.board,
              "tol": args.tol, "abs_s": args.abs_s,
              "n_queries": len(new), "n_fresh": len(fresh),
              "fresh": fresh, "out_of_band": out_of_band,
              "band_purges": purged}
    extra = [q for q in args.extra.split(",") if q and q not in out_of_band]
    names = ",".join(sorted(set(out_of_band) | set(extra)))
    print(f"== {len(new)} queries, {len(fresh)} fresh, "
          f"{len(out_of_band)} out of band")
    for q, info in sorted(out_of_band.items()):
        print(f"   {q}: {info['new']:.2f}s vs band max "
              f"{info['band_max']:.2f}s {info['band']}")
    if names:
        print(f"SPARK_GRAFT_BENCH_ONLY={names}")

    # 2. optional isolated rerun at repeat=9
    if args.run and names:
        sfdir = args.sfdir or ("/tmp/sf1" if args.scale == "sf1"
                               else "/root/testdata/sf0.1")
        env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY=names,
                   SPARK_GRAFT_REPEAT="9", SPARK_GRAFT_SF_DIR=sfdir)
        print(f"[recheck] running isolated repeat=9 on {sfdir} ...",
              file=sys.stderr)
        res = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            env=env, capture_output=True, text=True, check=False)
        line = next((ln for ln in res.stdout.splitlines()
                     if '"metric"' in ln), None)
        if line is None:
            print(res.stdout[-2000:], file=sys.stderr)
            print(res.stderr[-2000:], file=sys.stderr)
            sys.exit(2)
        isolated = json.loads(line[line.index("{"):])["queries"]
        verdicts = {}
        for q, info in out_of_band.items():
            iso = isolated.get(q)
            ok = iso is not None and iso <= info["band_max"] * args.tol
            verdicts[q] = {"isolated_median9": iso,
                           "band_max": info["band_max"],
                           "verdict": "RECHECK_OK" if ok else "REGRESSED"}
            # iso is None when the query crashed or was renamed out of
            # the bench — keep the REGRESSED verdict printable (r9 ADVICE)
            iso_s = "MISSING" if iso is None else f"{iso:.2f}s"
            print(f"   {q}: isolated {iso_s} -> {verdicts[q]['verdict']}")
        for q in extra:
            iso = isolated.get(q)
            verdicts[q] = {"isolated_median9": iso,
                           "board": new.get(q),
                           "band_max": max(bands[q]) if q in bands else None,
                           "verdict": "MEASURED"}
            iso_s = "MISSING" if iso is None else f"{iso:.2f}s"
            print(f"   {q}: isolated {iso_s} (forced, board "
                  f"{new.get(q)})")
        report["isolated"] = verdicts

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"[recheck] report -> {args.out}")
    regressed = [q for q, v in report.get("isolated", {}).items()
                 if v["verdict"] == "REGRESSED"]
    # exit 1 = attention needed: unchecked out-of-band entries (no --run)
    # or entries still out of band after the isolated rerun
    sys.exit(1 if (out_of_band and not args.run) or regressed else 0)


if __name__ == "__main__":
    main()
