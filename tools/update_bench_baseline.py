#!/usr/bin/env python3
"""Regenerate tools/bench_baseline.json: per-query best-of (min) wall time
across all prior rounds' BENCH_r*.json artifacts. Bench.scala uses this to
decide when a slow measurement is suspicious (>3x best-known) and worth
spaced escalating retries to ride out host CPU-steal phases.

Run from the repo root: python3 tools/update_bench_baseline.py
"""
import json, glob, re

best = {}
# Full per-query snapshots (the BENCH_r*.json 'tail' is byte-truncated by
# the driver and loses most of the query dict — r11's tail kept 65 of 163
# queries): tools/bench_detail_r*.json are complete per-round copies of
# bench_detail.json, taken at round close.
for f in sorted(glob.glob('tools/bench_detail_r*.json')):
    try:
        d = json.load(open(f))
    except Exception:
        continue
    for k, v in (d.get('queries') or {}).items():
        sec = v.get('sec') if isinstance(v, dict) else v
        if isinstance(sec, (int, float)):
            best[k] = min(best.get(k, 1e9), float(sec))
for f in sorted(glob.glob('BENCH_r*.json')):
    try:
        d = json.load(open(f))
    except Exception:
        continue
    tail = d.get('tail') or ''
    m = re.search(r'\{"metric":"total".*\}', tail)
    if not m:
        continue
    try:
        inner = json.loads(m.group(0))
    except Exception:
        continue
    for k, v in (inner.get('queries') or {}).items():
        if isinstance(v, (int, float)):
            best[k] = min(best.get(k, 1e9), float(v))

# Floors for queries whose historical minimum predates a deliberate
# semantic change (see tools/bench_baseline_overrides.json): the stale
# lucky-weather best would otherwise make honest rows read as >2x
# regressed and defeat Bench.scala's history-vouch retry check forever.
try:
    overrides = json.load(open('tools/bench_baseline_overrides.json'))
except Exception:
    overrides = {}
for k, o in overrides.items():
    if k.startswith('_') or not isinstance(o, dict):
        continue
    floor = o.get('floor_sec')
    if isinstance(floor, (int, float)) and k in best:
        best[k] = max(best[k], float(floor))

out = {k: round(v, 3) for k, v in sorted(best.items())}
json.dump(out, open('tools/bench_baseline.json', 'w'), indent=1)
print(f'{len(out)} queries; sum-of-best {sum(out.values()):.1f}s')
