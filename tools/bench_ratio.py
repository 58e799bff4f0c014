#!/usr/bin/env python3
"""Round-over-round per-query bench ratio table.

The comparator contract (VERDICT r18 task 1): the prior side MUST be a
committed clean bench_detail pin (full per-query detail — bench_detail.json
format, or a provenance-stamped copy under bench_baselines/), NEVER the
truncated stdout tail inside a driver BENCH_r{N}.json. The tail keeps only
the last ~2KB of stdout — a 75-line alphabetical suffix of whatever run the
driver happened to time — so a tail-based median is a comparator artifact,
not a code measurement (r18 lesson: tail median 0.924 vs true clean-to-clean
1.151). Passing a tail-format file is a loud error unless --allow-tail is
given, and even then the script prints a NOISY-COMPARATOR warning on every
output line block.

Usage:
  python3 tools/bench_ratio.py bench_baselines/r18_clean_detail.json
  python3 tools/bench_ratio.py PRIOR_DETAIL --current bench_detail.json \
      --threshold 1.3 --out BENCH_RATIO_r19.md
  python3 tools/bench_ratio.py BENCH_r17.json --allow-tail   # discouraged
"""
import argparse
import json
import re
import statistics
import sys


def load_detail_jsonl(path):
    """Parse a bench_detail-format JSONL file; returns (queries, probes, total)."""
    queries, probes, total = None, None, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            m = d.get("metric")
            if m == "detail":
                queries = d.get("queries")
                total = d.get("value")
            elif m == "probes":
                probes = d
    return queries, probes, total


def load_tail_queries(path):
    """Parse the truncated stdout tail of a driver BENCH_r{N}.json.

    The tail may cut the headline JSON mid-object, so regex-scrape the
    per-query pairs. Truncate at the first '"probe_pre"' so the probe maps
    (whose entries share query names like x_pca_oracle) can never shadow
    the sweep timings, and drop known non-query numeric fields.
    """
    prior = json.load(open(path))
    tail = prior.get("tail", "")
    cut = tail.find('"probe_pre"')
    if cut != -1:
        tail = tail[:cut]
    pairs = dict((k, float(v)) for k, v in
                 re.findall(r'"(\w+)":(\d+\.\d+)', tail))
    for k in ("value", "steal_index", "sf"):
        pairs.pop(k, None)
    return pairs


def is_tail_format(path):
    """A driver BENCH_r{N}.json is a single JSON object with a 'tail' key."""
    try:
        with open(path) as f:
            d = json.load(f)
        return isinstance(d, dict) and "tail" in d
    except (json.JSONDecodeError, ValueError):
        return False  # JSONL detail files fail single-object parse


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("prior", help="committed clean bench_detail pin "
                    "(bench_detail.json format / bench_baselines/*.json)")
    ap.add_argument("threshold", nargs="?", type=float, default=1.3,
                    help="flag rises over this ratio (default 1.3)")
    ap.add_argument("--current", default="bench_detail.json",
                    help="current-side detail file (default bench_detail.json)")
    ap.add_argument("--out", help="write the table to this markdown file")
    ap.add_argument("--allow-tail", action="store_true",
                    help="permit a truncated driver BENCH_r*.json stdout tail "
                         "as the prior (biased: ~75-line suffix of a possibly "
                         "noisy run — never cite its median as a code claim)")
    args = ap.parse_args()

    tail_mode = is_tail_format(args.prior)
    if tail_mode and not args.allow_tail:
        sys.exit(
            f"ERROR: {args.prior} is a driver stdout-tail artifact "
            f"(truncated ~75-line suffix), not a committed per-query detail "
            f"pin. Its median is a comparator artifact (r18: tail said 0.924 "
            f"where clean-to-clean was 1.151). Use a bench_baselines/"
            f"*_clean_detail.json pin, or pass --allow-tail if you really "
            f"want the biased view.")

    cur_q, cur_probes, cur_total = load_detail_jsonl(args.current)
    if cur_q is None:
        sys.exit(f"ERROR: no 'detail' line found in {args.current}")

    lines = []
    if tail_mode:
        lines.append("!! NOISY COMPARATOR: prior side is a truncated driver "
                     "stdout tail (~75-line suffix). Ratios below are NOT a "
                     "code-speed claim.")
        pairs = load_tail_queries(args.prior)
        prior_total = None
    else:
        pairs, prior_probes, prior_total = load_detail_jsonl(args.prior)
        if pairs is None:
            sys.exit(f"ERROR: no 'detail' line found in {args.prior}")

    if cur_probes:
        verdict = "CLEAN" if cur_probes.get("bench_clean") else "DIRTY"
        lines.append(
            f"current steal probes: {verdict} "
            f"(steal_index {cur_probes.get('steal_index')}; "
            f"pre {cur_probes.get('probe_pre')}, "
            f"post {cur_probes.get('probe_post')})")
        if "host_floor_index" in cur_probes:
            lines.append(
                f"current host floor: {cur_probes.get('host_verdict')} "
                f"(host_floor_index {cur_probes.get('host_floor_index')})")
    else:
        lines.append("current steal probes: MISSING (pre-r18 detail format)")

    common = sorted(set(cur_q) & set(pairs))
    ratios = [(cur_q[k] / pairs[k], k) for k in common if pairs[k] > 0]
    ratios.sort(reverse=True)
    med = statistics.median(r for r, _ in ratios)
    totals = (f"; totals {prior_total:.2f} -> {cur_total:.2f} s"
              if prior_total is not None and cur_total is not None else "")
    lines.append(f"common lines: {len(common)}; median ratio {med:.3f}{totals}")
    lines.append(f"-- rises over {args.threshold}x:")
    for r, k in ratios:
        if r > args.threshold:
            lines.append(f"  {k}: {pairs[k]:.2f} -> {cur_q[k]:.2f}  ({r:.2f}x)")
    lines.append("-- biggest drops:")
    for r, k in sorted(ratios)[:8]:
        lines.append(f"  {k}: {pairs[k]:.2f} -> {cur_q[k]:.2f}  ({r:.2f}x)")

    text = "\n".join(lines)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(f"# bench ratio: {args.current} vs {args.prior} "
                    f"(generated by tools/bench_ratio.py)\n\n```\n{text}\n```\n")
        print(f"[written {args.out}]")


if __name__ == "__main__":
    main()
