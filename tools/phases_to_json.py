#!/usr/bin/env python3
"""Convert a Profile* tool's stdout into a bench/ JSON artifact
(r12 VERDICT task #8: phase studies must live as bench/ JSON, not
SCALING.md prose). Lines like
  [tag] <phase name>: 3.45 s         (ProfileHotDeck style)
  [tag] <phase name>   3.45 s  jobs=12  jobWall=4.5 s
become {"phases": {...}, "counts": {...}}; 'x = N' lines become counts.
Usage: python3 tools/phases_to_json.py <tag> <out.json> < tool.log
"""
import json
import re
import sys

tag, out = sys.argv[1], sys.argv[2]
phases, counts = {}, {}
pat_time = re.compile(
    rf"\[{re.escape(tag)}\]\s+(.*?)[:\s]\s*([\d.]+)\s*s(?:\s+jobs=\s*(\d+)\s+jobWall=\s*([\d.]+)\s*s)?\s*$")
pat_count = re.compile(rf"\[{re.escape(tag)}\]\s+([\w ]+?)\s*=\s*(\d+)\s*$")
for line in sys.stdin:
    line = line.replace("[info] ", "").rstrip()
    m = pat_time.search(line)
    if m:
        name = m.group(1).strip().rstrip(":")
        ent = {"sec": float(m.group(2))}
        if m.group(3):
            ent["jobs"] = int(m.group(3))
            ent["job_wall_sec"] = float(m.group(4))
        phases[name] = ent
        continue
    m = pat_count.search(line)
    if m:
        counts[m.group(1).strip()] = int(m.group(2))
with open(out, "w") as f:
    json.dump({"tool": tag, "phases": phases, "counts": counts}, f,
              indent=1, sort_keys=True)
print(f"[phases_to_json] {len(phases)} phases, {len(counts)} counts -> {out}")
