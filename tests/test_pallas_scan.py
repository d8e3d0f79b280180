"""Pallas scan kernel must match the XLA scan path bit-for-bit.

Runs in interpreter mode on the CPU test mesh; the real-TPU path is the
same kernel code.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pindel_tpu import dna
from pindel_tpu.ops.engine_fused import _xla_scan_rows
from pindel_tpu.ops.pallas_scan import pallas_scan_rows


@pytest.mark.parametrize("seed,w,lmax,rows", [
    (0, 128, 128, 64), (1, 512, 128, 300), (2, 2048, 128, 17),
])
def test_pallas_matches_xla_scan(seed, w, lmax, rows):
    rng = np.random.default_rng(seed)
    t = w + lmax
    tiles = rng.integers(0, 5, (rows, t)).astype(np.int8)
    qq = np.full((rows, lmax), dna.N, np.int8)
    qlen = rng.integers(30, min(lmax, 120), rows).astype(np.int32)
    for i in range(rows):
        n = qlen[i]
        # embed a near-match so real chains emit
        s = int(rng.integers(0, w))
        qq[i, :n] = tiles[i, s:s + n]
        for j in rng.integers(0, n, size=int(rng.integers(0, 4))):
            qq[i, j] = rng.integers(0, 5)
    valid_w = rng.integers(1, w + 1, rows).astype(np.int32)
    tsec = rng.integers(1, 8, rows).astype(np.int32)

    kx, k2x = _xla_scan_rows(
        jnp.asarray(tiles), jnp.asarray(qq), jnp.asarray(valid_w),
        jnp.asarray(qlen), jnp.asarray(tsec),
        w=w, lmax=lmax, mpm=3)
    kp, k2p = pallas_scan_rows(
        jnp.asarray(tiles), jnp.asarray(qq), jnp.asarray(valid_w),
        jnp.asarray(qlen), jnp.asarray(tsec),
        w=w, lmax=lmax, mpm=3, interpret=True)

    np.testing.assert_array_equal(np.asarray(kx), np.asarray(kp))
    np.testing.assert_array_equal(np.asarray(k2x), np.asarray(k2p))
