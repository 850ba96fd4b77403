"""Merge suite-result JSONs produced by separate eval.run invocations.

Round-5 recovery utility: an eval killed by its watchdog timeout leaves a
partial per-suite JSON (incremental writes — eval/run.py:201); the missing
agent tiers can be re-run with ``--agents N --out-dir <tmp>`` and folded
back in here.  Rows are deduplicated on (map_name, seed, num_agents) with
later files winning.

Usage: python profiles/merge_results.py OUT BASE EXTRA [EXTRA...]
"""

import json
import sys


def main(argv):
    out, *srcs = argv
    rows, seen = [], {}
    for path in srcs:
        with open(path) as f:
            for r in json.load(f):
                key = (r.get("map_name"), r.get("seed"), r.get("num_agents"))
                if key in seen:
                    rows[seen[key]] = r
                else:
                    seen[key] = len(rows)
                    rows.append(r)
    rows.sort(key=lambda r: (r.get("num_agents", 0), str(r.get("map_name")),
                             r.get("seed") or 0))
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}: {len(rows)} rows from {len(srcs)} files")


if __name__ == "__main__":
    main(sys.argv[1:])
