"""Anchor-normalized cross-round bench drift table (VERDICT r14 #6).

Compares two BENCH_DETAIL.json artifacts (previous round vs current)
and reports per-query deltas NORMALIZED by the ``calib_scan_s`` host
anchor ratio, flagging only normalized moves past a threshold —
retiring the ad-hoc noise-adjudication prose that consumed rounds
12-14: three r13-era runs of identical code disagreed ±50% uniformly
with host load, which the fixed-workload anchor makes divisible-out.

Two normalizations, cross-checked:

- calib:  raw_ratio(q) / (calib_cur / calib_prev) — the fixed-scan
  host anchor. First r14→r15 use showed its limit: the anchor itself
  moved 1.4x between rounds (page-cache / JVM-warm state — both runs
  show the same ~2.3x start→end intra-run ramp) while the 39-query
  raw-ratio pack sat at ~0.97, so calib-normalizing manufactured
  uniform pseudo-drift across 24 queries.
- pack:   raw_ratio(q) / median(raw ratios) — self-normalization
  under the "most queries didn't change between adjacent rounds"
  assumption; robust to anchor noise, blind to a genuine uniform
  regression (which the calib column still surfaces).

Flags fire on the PACK column (default 1.3x either direction); the
calib column is printed for the uniform-change check, and a loud
warning fires when the two anchors disagree by >20% — that means one
of them is lying and the round's prose must say which and why.

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
    raws = {q: qc[q] / qp[q] for q in sorted(set(qp) & set(qc))}
    raw_vals = sorted(raws.values())
    pack = raw_vals[len(raw_vals) // 2]
    rows = [
        (q, qp[q], qc[q], raw, raw / host_ratio, raw / pack)
        for q, raw in raws.items()
    ]
    flagged = [r for r in rows if r[5] >= args.flag or r[5] <= 1 / args.flag]
    print(
        f"anchors: calib {cp}→{cc} s (ratio {host_ratio:.3f}), "
        f"pack median raw ratio {pack:.3f}; "
        f"{len(flagged)}/{len(rows)} queries flagged at "
        f"|pack-normalized| >= {args.flag}x"
    )
    if not 0.8 <= host_ratio / pack <= 1.25:
        print(
            f"WARNING: calib and pack anchors disagree "
            f"({host_ratio:.2f} vs {pack:.2f}) — one is unreliable "
            f"for this pair (calib is page-cache/JVM-warm sensitive; "
            f"pack is blind to uniform regressions). Name the cause "
            f"in the round notes."
        )
    print()
    print(
        "| query | prev s | cur s | raw | calib-norm | pack-norm "
        "| flag |"
    )
    print("|---|---|---|---|---|---|---|")
    for q, a, b, raw, cn, pn in sorted(
        rows, key=lambda r: -abs(math.log(r[5]))
    ):
        mark = "**DRIFT**" if (q, a, b, raw, cn, pn) in flagged else ""
        print(
            f"| {q} | {a} | {b} | {raw:.2f} | {cn:.2f} | {pn:.2f} "
            f"| {mark} |"
        )


if __name__ == "__main__":
    main()
