#!/usr/bin/env python3
"""Dev-only: cross-check Bench medians against a TimeProbe sweep.

Usage: compare_probe.py BENCH_DETAIL.json probe_output.txt [ratio_bar]

Reads the bench detail JSON ("queries" medians) and a file of
`PROBE <name> t1 t2 t3 t4 t5` lines (TimeProbe output, sbt prefixes
stripped or not), and reports every query whose bench median exceeds
ratio_bar (default 1.5) x the probe steady state (min of the probe runs —
the probe's first run re-JITs, so min is the steady state). Exit 1 if any
query exceeds the bar: the bench artifact carries a phantom.
"""
import json
import re
import sys

bench_path, probe_path = sys.argv[1], sys.argv[2]
bar = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

bench = json.load(open(bench_path))
medians = bench["queries"]
# Median provenance (round 15): the bench states per query whether the
# published median came from the interleaved sweep or the isolated-steady
# re-measure; surface the split so a reader of this report sees which
# methodology each flagged figure used without opening the JSON.
provenance = bench.get("published_source", {})
n_iso = sum(1 for v in provenance.values() if v == "isolated")
if n_iso:
    print(f"note: {n_iso} medians published from isolated-steady re-measure "
          f"(marked [isolated] below)")
n_man = sum(1 for v in provenance.values() if v == "manifest")
if n_man:
    print(f"note: {n_man} medians served from the resume manifest "
          f"(measured by an earlier same-code invocation; marked [manifest])")
probes = {}
for line in open(probe_path):
    m = re.search(r"PROBE (\S+) ([0-9. ]+)$", line.strip())
    if m:
        probes[m.group(1)] = min(float(x) for x in m.group(2).split())

missing = sorted(set(medians) - set(probes))
if missing:
    print(f"note: {len(missing)} queries not probed: {', '.join(missing)}")

bad = []
for name in sorted(set(medians) & set(probes)):
    # only flag real seconds: a sub-0.5 s bench median ratios wildly on
    # scheduler jitter without meaning anything. The probe side is floored
    # at 10 ms so a steady state that formats as 0.00 can't make a 0.6 s
    # median flag with ratio inf.
    med, steady = medians[name], max(probes[name], 0.01)
    if med > bar * steady and med > 0.5:
        bad.append((name, med, steady))
for name, med, steady in bad:
    ratio = med / steady
    src = provenance.get(name)
    tag = f" [{src}]" if src in ("isolated", "manifest") else ""
    print(f"PHANTOM? {name}: bench median {med:.2f}s vs probe steady {steady:.2f}s "
          f"({ratio:.1f}x){tag}")
print(f"{len(set(medians) & set(probes))} compared, {len(bad)} over the {bar}x bar")
sys.exit(1 if bad else 0)
