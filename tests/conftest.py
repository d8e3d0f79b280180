import os
import sys

# Tests always run on a virtual 8-device CPU mesh: fast, deterministic, and
# exercises multi-chip sharding without TPU hardware.  The environment may
# pre-register the real TPU backend (axon plugin via sitecustomize, which
# programmatically sets jax_platforms="axon,cpu" before this file runs), so
# an env override alone is not enough — update the config and drop any
# initialized backends.  bench.py / __graft_entry__.py keep the real chip,
# as does the opt-in on-chip kernel sweep (PINDEL_TPU_ONCHIP=1 via
# tools/onchip_check.py, which must see the real TPU).
if os.environ.get("PINDEL_TPU_ONCHIP") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass

sys.path.insert(0, os.path.dirname(__file__))
