#!/usr/bin/env python3
"""Same-session A/B analysis (VERDICT r18 task 2): paired per-query
ratios between alternating sweeps of two binaries on one host.

Inputs: bench_detail-format JSONL files, alternating A/B/A/B, e.g.
  python3 tools/ab_compare.py --a detail_1_r17.json detail_2_r17.json \
      --b detail_1_r18.json detail_2_r18.json \
      --pin-a bench_baselines/r17_clean_detail.json \
      --pin-b bench_baselines/r18_clean_detail.json

Output: per-side totals, the paired per-line median B/A (code effect at
equal host), and each side's median vs its committed clean pin (host
effect at equal code). Also lists the top paired risers — the lines
where the B binary is genuinely slower than A on the same night."""
import argparse
import json
import statistics


def load(path):
    qs, total = None, None
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        if d.get("metric") == "detail":
            qs, total = d["queries"], d["value"]
    return qs, total


def med_ratio(cur, prior):
    common = sorted(set(cur) & set(prior))
    rs = [(cur[k] / prior[k], k) for k in common if prior[k] > 0 and cur[k] > 0]
    return statistics.median(r for r, _ in rs), rs, len(common)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", nargs="+", required=True, help="side-A details")
    ap.add_argument("--b", nargs="+", required=True, help="side-B details")
    ap.add_argument("--pin-a", help="side A committed clean pin")
    ap.add_argument("--pin-b", help="side B committed clean pin")
    ap.add_argument("--top", type=int, default=10)
    args = ap.parse_args()

    a_runs = [load(p) for p in args.a]
    b_runs = [load(p) for p in args.b]
    for name, runs, paths in (("A", a_runs, args.a), ("B", b_runs, args.b)):
        for (qs, total), p in zip(runs, paths):
            print(f"side {name} {p}: total {total:.2f} s / {len(qs)} queries")

    # host effect: each side vs its own committed clean pin (same code)
    for name, runs, pin in (("A", a_runs, args.pin_a), ("B", b_runs, args.pin_b)):
        if not pin:
            continue
        pq, ptot = load(pin)
        for (qs, total), p in zip(runs, (args.a if name == "A" else args.b)):
            m, _, n = med_ratio(qs, pq)
            print(f"host effect side {name} ({p} vs pin {ptot:.2f}s): "
                  f"median {m:.3f} over {n} lines")

    # code effect: paired B/A per run index (same host window, adjacent)
    per_line = {}
    for i, ((aq, _), (bq, _)) in enumerate(zip(a_runs, b_runs)):
        m, rs, n = med_ratio(bq, aq)
        print(f"paired B/A run {i + 1}: median {m:.3f} over {n} lines")
        for r, k in rs:
            per_line.setdefault(k, []).append(r)
    # median-of-pairs per line, then the distribution over lines
    line_meds = sorted(((statistics.median(v), k) for k, v in per_line.items()),
                      reverse=True)
    overall = statistics.median(m for m, _ in line_meds)
    print(f"paired B/A, median of per-line medians over {len(line_meds)} "
          f"lines: {overall:.3f}")
    print(f"-- top {args.top} paired risers (B slower than A at equal host):")
    for m, k in line_meds[:args.top]:
        a_med = statistics.median(r[0][k] for r in
                                  [(q, t) for q, t in a_runs] if k in r[0])
        print(f"  {k}: {m:.2f}x (A median {a_med:.2f}s)")
    print("-- top paired droppers:")
    for m, k in sorted(line_meds)[:args.top]:
        print(f"  {k}: {m:.2f}x")


if __name__ == "__main__":
    main()
