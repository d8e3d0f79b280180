"""On-chip validation of the mosaic-compiled Pallas scan (VERDICT r3
item 6): sweep every reachable (w, lmax) bucket and assert bit-equality
with the XLA scan path.

The main suite forces JAX_PLATFORMS=cpu (tests/conftest.py), where the
Pallas kernel only runs interpreted; this module instead runs on the
real TPU and is opt-in via PINDEL_TPU_ONCHIP=1 (it needs the axon chip
and ~a minute of tunnel compiles per fresh shape):

    PINDEL_TPU_ONCHIP=1 python -m pytest tests/test_pallas_onchip.py -v

tools/onchip_check.py wraps exactly that and is run before benches.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("PINDEL_TPU_ONCHIP") != "1",
    reason="on-chip sweep is opt-in (PINDEL_TPU_ONCHIP=1)")

# every window bucket the fused engine can choose (_w_bucket: 128*2^k
# with 3*2^(k-1) intermediates) up to the spacer cap, x the read-length
# buckets (lmax rounds to 128)
W_BUCKETS = [128, 192, 256, 384, 512, 768, 1024, 1536, 2048]
LMAXES = [128, 256]


def _case(rng, r, w, lmax, lsteps):
    tiles = rng.integers(0, 5, size=(r, w + lmax), dtype=np.int8)
    qq = rng.integers(0, 5, size=(r, lmax), dtype=np.int8)
    qlen = rng.integers(20, lmax + 1, size=r).astype(np.int32)
    valid_w = rng.integers(0, w + 1, size=r).astype(np.int32)
    thr = rng.integers(0, 12, size=r).astype(np.int32)
    return tiles, qq, valid_w, qlen, thr


@pytest.mark.parametrize("lmax", LMAXES)
@pytest.mark.parametrize("w", W_BUCKETS)
def test_compiled_pallas_matches_xla(w, lmax):
    import jax
    import jax.numpy as jnp

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"needs a TPU backend, got {jax.default_backend()}")
    from pindel_tpu.ops.engine_fused import _xla_scan_rows
    from pindel_tpu.ops.engine_jax import enable_compile_cache
    from pindel_tpu.ops.pallas_scan import pallas_scan_rows
    enable_compile_cache()
    rng = np.random.default_rng(w * 1000 + lmax)
    r = 192                       # not a BM multiple: exercises padding
    lsteps = min(112, lmax)
    args = [jnp.asarray(x) for x in _case(rng, r, w, lmax, lsteps)]
    compiled = pallas_scan_rows(*args, w=w, lmax=lmax, mpm=3,
                                lsteps=lsteps)
    golden = _xla_scan_rows(*args, w=w, lmax=lmax, mpm=3, lsteps=lsteps)
    for got, want, name in zip(compiled, golden, ("kmin", "k2")):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"{name} w={w} lmax={lmax}")
