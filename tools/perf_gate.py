#!/usr/bin/env python
"""TPU perf gate: run bench.py and fail if vs_baseline falls below the
floor in PERF_BUDGET.json (the reference enforces wall-time budgets per
acceptance config, test/SmallTest/execution_time.sh + Makefile:54-61).

The floor is a RATCHET: after a passing run the floor is raised to
0.9 x the achieved vs_baseline (never lowered), so a regression from the
best recorded round cannot pass silently.  The gate also reports the
distance to ``target_vs_baseline`` — the project's >10x/chip north star
(BASELINE.md) — without failing on it.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET = os.path.join(REPO, "PERF_BUDGET.json")


def gate_multihost() -> int:
    """--multihost: run the 2-host scaling bench at the loaded scene
    (BASELINE.md bar: >=80% efficiency at 2 hosts), record the artifact,
    enforce the floor."""
    with open(BUDGET) as fh:
        budget = json.load(fh)
    floor = budget.get("min_multihost_efficiency", 0.8)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_bench.py"),
         "--hosts", "2", "--events", "240", "--noise", "24000",
         "--chrom-len", "4800000", "--record"],
        capture_output=True, text=True, timeout=3600)
    sys.stderr.write(r.stderr[-2000:])
    if r.returncode != 0:
        print("multihost bench failed", file=sys.stderr)
        return 1
    line = r.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    print(line)
    eff = result.get("efficiency", 0)
    if eff < floor:
        print(f"PERF GATE FAILED: 2-host efficiency {eff} < {floor}",
              file=sys.stderr)
        return 1
    print(f"multihost gate ok: efficiency {eff} >= {floor}")
    return 0


def main() -> int:
    if "--multihost" in sys.argv:
        return gate_multihost()
    with open(BUDGET) as fh:
        budget = json.load(fh)
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=3600)
    sys.stderr.write(r.stderr[-2000:])
    line = r.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    print(line)
    floor = budget["min_vs_baseline"]
    vsb = result["vs_baseline"]
    if vsb < floor:
        print(f"PERF GATE FAILED: vs_baseline {vsb} < floor {floor}",
              file=sys.stderr)
        return 1
    floor2 = budget.get("min_scene2_vs_baseline")
    s2 = result.get("scene2_vs_baseline", 0)
    if floor2 is not None and s2 < floor2:
        print(f"PERF GATE FAILED: scene2_vs_baseline {s2} < floor {floor2}",
              file=sys.stderr)
        return 1
    target = budget.get("target_vs_baseline")
    if target:
        print(f"perf gate ok: vs_baseline {vsb} >= {floor}; "
              f"target {target} ({'MET' if vsb >= target else f'{vsb/target:.0%} of target'})")
    else:
        print(f"perf gate ok: vs_baseline {vsb} >= {floor}")
    # ratchet: a regression well below the best recorded result fails
    # the next gate run even if it clears the hand-set floor.  0.75x
    # (not 0.9x) because the box itself swings ~+/-20%: across four
    # serialized identical-code runs on 2026-08-21 the reference's own
    # single-core time moved 11.76s-13.51s and vs_baseline 4.6-6.3
    # (BENCH_local_r5.json) — a 0.9x ratchet would false-fail on
    # machine state alone.
    new_floor = round(max(floor, 0.75 * vsb), 3)
    new_floor2 = round(max(floor2 or 0, 0.75 * s2), 3)
    if new_floor > floor or new_floor2 > (floor2 or 0):
        budget["min_vs_baseline"] = new_floor
        budget["min_scene2_vs_baseline"] = new_floor2
        with open(BUDGET, "w") as fh:
            json.dump(budget, fh, indent=2)
            fh.write("\n")
        print(f"floors ratcheted: vs_baseline >= {new_floor}, "
              f"scene2 >= {new_floor2}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
