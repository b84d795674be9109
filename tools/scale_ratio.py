#!/usr/bin/env python3
"""Cross-SF scale-ratio probe report (VERDICT r10 #5).

Usage: python3 tools/scale_ratio.py <bench_small.json> <bench_big.json> \
           <amplification> [out.md]

Reads two graft.Bench full-result JSONs (the bench_result.json the bench
writes in its CWD), computes per-query time ratios big/small on the min-of-N
steady-state numbers, and writes a markdown table sorted by ratio with the
outliers (> 1.5x the amplification factor) flagged for explanation.

A ratio far above the amplification names a superlinear term the small-SF
bench structurally cannot see; a ratio far below it names a fixed-cost query
(driver/setup-bound, or reading a fixture that does not scale with SF).
Dev/analysis tool — runs driver-side, not part of the engine.
"""
import json, sys


def main():
    small_f, big_f, amp = sys.argv[1], sys.argv[2], float(sys.argv[3])
    out = sys.argv[4] if len(sys.argv) > 4 else None
    small = json.load(open(small_f))
    big = json.load(open(big_f))
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(set(qs) & set(qb)):
        r = qb[name] / qs[name] if qs[name] > 0 else float("inf")
        rows.append((r, name, qs[name], qb[name]))
    rows.sort(reverse=True)
    missing = sorted(set(qs) ^ set(qb))

    lines = []
    lines.append(f"| query | small s | big s | ratio | vs {amp:g}x |")
    lines.append("|---|---|---|---|---|")
    n_super = 0
    for r, name, a, b in rows:
        flag = ""
        if r > 1.5 * amp:
            flag = "**SUPERLINEAR?**"
            n_super += 1
        elif r < 0.5 * amp:
            flag = "sublinear/fixed-cost"
        lines.append(f"| {name} | {a:.3f} | {b:.3f} | {r:.2f}x | {flag} |")
    body = "\n".join(lines)
    hdr = (f"small total {small['value']:.2f} s ({small_f}), "
           f"big total {big['value']:.2f} s ({big_f}), "
           f"amplification {amp:g}x, total ratio "
           f"{big['value']/small['value']:.2f}x, "
           f"{n_super} quer{'y' if n_super==1 else 'ies'} above the "
           f"1.5x-amplification flag line")
    if missing:
        hdr += f"\nqueries present in only one run: {', '.join(missing)}"
    text = hdr + "\n\n" + body + "\n"
    if out:
        with open(out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
