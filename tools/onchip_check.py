#!/usr/bin/env python
"""Run the on-chip Pallas-vs-XLA bucket sweep (tests/test_pallas_onchip)
on the real TPU and record the outcome in ONCHIP_SWEEP.json.  Kept out
of the default pytest run because conftest pins the suite to the CPU
backend; invoke directly:

    python tools/onchip_check.py
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    env = dict(os.environ)
    env["PINDEL_TPU_ONCHIP"] = "1"
    env.pop("JAX_PLATFORMS", None)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(REPO, "tests", "test_pallas_onchip.py"),
         "-q", "-p", "no:cacheprovider", "--no-header"],
        env=env, cwd=REPO, capture_output=True, text=True)
    sys.stdout.write(r.stdout[-2000:])
    sys.stderr.write(r.stderr[-1000:])
    m = re.search(r"(\d+) passed", r.stdout)
    result = {
        "passed": int(m.group(1)) if m else 0,
        "returncode": r.returncode,
        "wall_s": round(time.time() - t0, 1),
        "what": "compiled Pallas scan vs XLA twin, bit-equality over "
                "every reachable (window, lmax) bucket on the real chip",
    }
    with open(os.path.join(REPO, "ONCHIP_SWEEP.json"), "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(f"recorded: {result}")
    sys.exit(r.returncode)
