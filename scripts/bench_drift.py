"""Anchor-normalized cross-round bench drift table (VERDICT r14 #6).

Compares two BENCH_DETAIL.json artifacts (previous round vs current)
and reports per-query deltas NORMALIZED by the ``calib_scan_s`` host
anchor ratio, flagging only normalized moves past a threshold —
retiring the ad-hoc noise-adjudication prose that consumed rounds
12-14: three r13-era runs of identical code disagreed ±50% uniformly
with host load, which the fixed-workload anchor makes divisible-out.

normalized_ratio(q) = (cur[q] / prev[q]) / (calib_cur / calib_prev)

A normalized ratio ~1.0 means the query moved exactly as much as the
host did — no code story. Ratios past ``--flag`` (default 1.3) in
either direction are listed as real drift candidates.

Usage::

    python scripts/bench_drift.py PREV_DETAIL.json CUR_DETAIL.json \
        [--flag 1.3] [--stat queries]

Markdown table to stdout (flagged rows first).
"""

from __future__ import annotations

import argparse
import json
import math


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("cur")
    ap.add_argument("--flag", type=float, default=1.3)
    ap.add_argument(
        "--stat", default="queries",
        help="detail key holding per-query seconds (queries=medians, "
        "queries_min=mins)",
    )
    args = ap.parse_args()
    prev = json.load(open(args.prev))
    cur = json.load(open(args.cur))
    cp, cc = prev.get("calib_scan_s"), cur.get("calib_scan_s")
    if not cp or not cc:
        raise SystemExit(
            "both artifacts need a calib_scan_s anchor (r14+)"
        )
    if prev.get("sf") != cur.get("sf"):
        raise SystemExit(
            f"sf mismatch ({prev.get('sf')} vs {cur.get('sf')}): "
            "cross-sf ratios are volume, not drift"
        )
    host_ratio = cc / cp
    qp, qc = prev[args.stat], cur[args.stat]
    rows = []
    for q in sorted(set(qp) & set(qc)):
        raw = qc[q] / qp[q]
        norm = raw / host_ratio
        rows.append((q, qp[q], qc[q], raw, norm))
    flagged = [r for r in rows if r[4] >= args.flag or r[4] <= 1 / args.flag]
    print(
        f"anchor: prev calib {cp} s, cur calib {cc} s, "
        f"host ratio {host_ratio:.3f}; "
        f"{len(flagged)}/{len(rows)} queries flagged at "
        f"|normalized| >= {args.flag}x\n"
    )
    print("| query | prev s | cur s | raw ratio | normalized | flag |")
    print("|---|---|---|---|---|---|")
    for q, a, b, raw, norm in sorted(
        rows, key=lambda r: -abs(math.log(r[4]))
    ):
        mark = "**DRIFT**" if (q, a, b, raw, norm) in flagged else ""
        print(f"| {q} | {a} | {b} | {raw:.2f} | {norm:.2f} | {mark} |")


if __name__ == "__main__":
    main()
