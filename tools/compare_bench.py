#!/usr/bin/env python3
"""Cross-round bench comparison (VERDICT r6 item 8): common-set totals +
biggest per-query movers between two BENCH_DETAIL*.json files.

Usage: compare_bench.py OLD.json NEW.json [top_n]
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("steady_sec", d)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"common set: {len(common)} queries  "
          f"{t_old:.1f}s -> {t_new:.1f}s  ({t_new / t_old:.2f}x)")
    print(f"totals:     old {sum(old.values()):.1f}s / {len(old)}q   "
          f"new {sum(new.values()):.1f}s / {len(new)}q")
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): "
              + ", ".join(f"{q} {new[q]:.2f}s" for q in only_new))
    movers = sorted(common, key=lambda q: new[q] - old[q])
    print(f"\nbiggest improvements:")
    for q in movers[:top_n]:
        if new[q] < old[q] - 0.05:
            print(f"  {q}: {old[q]:.2f} -> {new[q]:.2f}s")
    print(f"biggest regressions:")
    for q in reversed(movers[-top_n:]):
        if new[q] > old[q] + 0.05:
            print(f"  {q}: {old[q]:.2f} -> {new[q]:.2f}s")


if __name__ == "__main__":
    main()
