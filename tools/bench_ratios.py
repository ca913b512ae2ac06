#!/usr/bin/env python3
"""Machine-readable bench adjudication (r18 verdict #4): compare a
bench_detail*.json run against the all-time floors WITH the measured
host-era adjustment applied by arithmetic, so the ">2x raw / >1.5x
adjusted" weak-list check is computed by tools, not argued in prose.

Per query, the operative reading is min(in-suite, isolated) — the
graft.Bench min-over-all-runs discipline. Two ratios:
  ratio_raw = reading / floor
  ratio_adj = reading / adj_floor   (floor + 0.18 s for floors recorded
              in the pre-r16 host era; see tools/floors_table.py)

Output: one JSON object with suite totals (raw + adjusted floor-sum
ratios over the queries present in the run) and the two weak lists.

Usage: python3 tools/bench_ratios.py bench_detail.json
"""
import json, subprocess, sys

RAW_WEAK = 2.0   # the close-protocol raw threshold
ADJ_WEAK = 1.5   # the close-protocol adjusted threshold

bench = json.load(open(sys.argv[1]))
floors = json.loads(subprocess.run(
    [sys.executable, 'tools/floors_table.py', '--json'],
    capture_output=True, text=True, check=True).stdout)

readings = {}
for name, sec in bench.get('queries', {}).items():
    readings[name] = sec
for name, sec in (bench.get('isolated_heavies') or {}).items():
    if name in readings:
        readings[name] = min(readings[name], sec)
    else:
        readings[name] = sec

rows = {}
sum_read = sum_floor = sum_adj = 0.0
for name, sec in sorted(readings.items()):
    qid = name.split('_')[0]
    f = floors.get(qid)
    if not f:
        continue
    sum_read += sec
    sum_floor += f['floor']
    sum_adj += f['adj']
    rows[name] = {
        'sec': round(sec, 3),
        'floor': f['floor'], 'floor_rec': f['rec'], 'adj_floor': f['adj'],
        'ratio_raw': round(sec / f['floor'], 3) if f['floor'] > 0 else None,
        'ratio_adj': round(sec / f['adj'], 3) if f['adj'] > 0 else None,
    }

weak_raw = sorted((n for n, r in rows.items()
                   if r['ratio_raw'] and r['ratio_raw'] > RAW_WEAK),
                  key=lambda n: -rows[n]['ratio_raw'])
weak_adj = sorted((n for n, r in rows.items()
                   if r['ratio_adj'] and r['ratio_adj'] > ADJ_WEAK),
                  key=lambda n: -rows[n]['ratio_adj'])

print(json.dumps({
    'n_queries': len(rows),
    'suite_ratio_raw': round(sum_read / sum_floor, 3) if sum_floor else None,
    'suite_ratio_adjusted': round(sum_read / sum_adj, 3) if sum_adj else None,
    'loadavg_start': bench.get('loadavg_start'),
    'loadavg_end': bench.get('loadavg_end'),
    'weak_raw_gt2x': {n: rows[n]['ratio_raw'] for n in weak_raw},
    'weak_adjusted_gt1_5x': {n: rows[n]['ratio_adj'] for n in weak_adj},
    'queries': rows,
}, indent=1))
