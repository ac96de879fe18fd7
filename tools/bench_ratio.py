#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (e.g. sf0.1 vs a derived sf1.0) and
flag super-linear per-query scaling — the VERDICT r6 ask: a quadratic
hiding behind a df-cap or hot-bucket guard shows up as a ratio well
beyond the data growth factor.

Usage: python3 tools/bench_ratio.py <base.json> <scaled.json> <factor>

A query is flagged when its time ratio exceeds factor * SLACK (default
slack 2.5x: noop-sink materialization has fixed per-query overhead that
deflates small-query ratios, and host-load noise inflates individual
medians; the signal sought is ratios of 20x+ at factor 10, not 12x).
Queries on fixed-size fixtures (the doc_id<50 aligner family) naturally
ratio ~1 and are never flagged.
"""
import json, sys

SLACK = 2.5

base, scaled, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
b = json.load(open(base))
s = json.load(open(scaled))
bq, sq = b["queries"], s["queries"]
# host-window sanity: when both artifacts carry the fixed-work calib
# sentinel (r14+ Bench), their ratio is a pure host-speed ratio —
# report it so a contaminated window is visible before per-query ratios
# are interpreted (a calib ratio near 2x explains per-query ratios near
# 2x as host, not engine)
# order-mode sanity: interleaved and grouped repeats sit at measured
# different LEVELS (~1.25x) on identical code — refuse to compare across
# modes silently (pre-r14 artifacts carry no order field = grouped-like)
ob, os_ = b.get("order", "grouped"), s.get("order", "grouped")
if ob != os_:
    print(f"WARNING: order modes differ (base={ob}, scaled={os_}) — "
          f"levels are not comparable (~1.25x protocol shift)")
# estimator sanity: r14+ artifacts' per-query values are min-of-3 while
# pre-r14 artifacts are median-of-3 — min <= median, so mixing biases
# cross-round ratios low by roughly the noise level (pre-r14 files
# carry no stat field = median-like)
sb, ss = b.get("stat", "median_of_3"), s.get("stat", "median_of_3")
if sb != ss:
    print(f"WARNING: stat estimators differ (base={sb}, scaled={ss}) — "
          f"min<=median biases ratios by ~the noise level")
cb, cs = b.get("calib"), s.get("calib")
if cb and cs:
    rb, rs = min(cb), min(cs)
    print(f"calib sentinel: base {rb:.3f}s scaled {rs:.3f}s "
          f"(host-speed ratio x{rs/rb:.2f}; >1.3x means the windows "
          f"are not comparable)")
print(f"{'query':<28}{'base':>9}{'scaled':>9}{'ratio':>8}  flag")
flagged = []
for q in sorted(bq):
    if q not in sq or bq[q] <= 0 or sq[q] <= 0:
        continue
    r = sq[q] / bq[q]
    flag = "SUPER-LINEAR" if r > factor * SLACK else ""
    if flag:
        flagged.append(q)
    print(f"{q:<28}{bq[q]:>9.3f}{sq[q]:>9.3f}{r:>8.2f}  {flag}")
# totals over the SHARED query set only (and symmetric), so a query
# present in one file but not the other can't skew the ratio
tb = sum(v for k, v in bq.items() if k in sq and v > 0 and sq[k] > 0)
ts = sum(v for k, v in sq.items() if k in bq and v > 0 and bq[k] > 0)
if tb > 0:
    print(f"\ntotal {tb:.2f}s -> {ts:.2f}s (x{ts/tb:.2f} at data x{factor:g})")
else:
    print("\nno shared positive-timing queries between the two files")
print("flagged:", flagged if flagged else "none")
