#!/usr/bin/env python
"""Run the on-chip Pallas-vs-XLA bucket sweep (tests/test_pallas_onchip)
on the real TPU.  Kept out of the default pytest run because conftest
pins the suite to the CPU backend; invoke directly:

    python tools/onchip_check.py
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    env = dict(os.environ)
    env["PINDEL_TPU_ONCHIP"] = "1"
    env.pop("JAX_PLATFORMS", None)
    sys.exit(subprocess.call(
        [sys.executable, "-m", "pytest",
         os.path.join(REPO, "tests", "test_pallas_onchip.py"),
         "-q", "-p", "no:cacheprovider", "--no-header"],
        env=env, cwd=REPO))
