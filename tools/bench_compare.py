#!/usr/bin/env python3
"""Lockstep mover report between two BENCH_local_r*.json artifacts.

Applies the adjudicated-value overrides BASELINE.md records for the
baseline round (the q48 rule: next-round comparisons use the isolated
re-measure, not the noise-inflated full-run number), then flags movers
past the >1.5x-and->0.5s bar in either direction.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [k=v ...]
  where k=v pairs override OLD's per-query seconds (adjudications).
"""
import json, sys

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
for kv in sys.argv[3:]:
    k, v = kv.split("=")
    old[k] = float(v)

shared = sorted(set(old) & set(new))
only_new = sorted(set(new) - set(old))
t_old = sum(old[q] for q in shared)
t_new = sum(new[q] for q in shared)
print(f"shared {len(shared)} queries: {t_old:.1f} -> {t_new:.1f} s "
      f"({t_new / t_old:.3f}x)")
print(f"new queries ({len(only_new)}): "
      f"{sum(new[q] for q in only_new):.2f} s total")
for q in only_new:
    print(f"  NEW  {q:45s} {new[q]:7.2f} s")
movers = []
for q in shared:
    a, b = old[q], new[q]
    if abs(b - a) > 0.5 and (b > 1.5 * a or a > 1.5 * b):
        movers.append((b / a, q, a, b))
print(f"movers past the 1.5x-and-0.5s bar: {len(movers)}")
for r, q, a, b in sorted(movers, reverse=True):
    print(f"  {'SLOW' if r > 1 else 'FAST'} {q:45s} {a:7.2f} -> {b:7.2f}"
          f"  ({r:.2f}x)")
