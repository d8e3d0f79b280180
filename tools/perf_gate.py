#!/usr/bin/env python
"""TPU perf gate: run bench.py and fail if vs_baseline falls below the
floor in PERF_BUDGET.json (the reference enforces wall-time budgets per
acceptance config, test/SmallTest/execution_time.sh + Makefile:54-61)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(os.path.join(REPO, "PERF_BUDGET.json")) as fh:
        budget = json.load(fh)
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=3600)
    sys.stderr.write(r.stderr[-2000:])
    line = r.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    print(line)
    floor = budget["min_vs_baseline"]
    if result["vs_baseline"] < floor:
        print(f"PERF GATE FAILED: vs_baseline {result['vs_baseline']} "
              f"< floor {floor}", file=sys.stderr)
        return 1
    floor2 = budget.get("min_scene2_vs_baseline")
    if floor2 is not None and result.get("scene2_vs_baseline", 0) < floor2:
        print(f"PERF GATE FAILED: scene2_vs_baseline "
              f"{result.get('scene2_vs_baseline')} < floor {floor2}",
              file=sys.stderr)
        return 1
    print(f"perf gate ok: vs_baseline {result['vs_baseline']} >= {floor}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
