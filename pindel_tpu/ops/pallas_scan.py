"""Pallas TPU kernel for the pattern-growth length-scan.

This is the innermost hot loop of the whole framework — the dense
reformulation of the reference recursion (CategorizePositions,
searcher.cpp:48-63, and the CheckLeft/Right_Close / CheckBoth emission
statistics).  The XLA lax.scan formulation (_xla_scan_rows in
engine_fused.py) round-trips the [rows, W] carry through HBM on every
length step and materializes relayouts; this kernel keeps the carry
resident in VMEM for the whole scan, so each step is pure VPU work over
an on-chip block.

Mosaic cannot index the lane dimension at arbitrary dynamic offsets
("index must be a multiple of 128"), so instead of slicing the tile at
step l the kernel keeps a working copy that it ROLLS left by one lane
per step (constant shift): ``work[:, :W]`` is then always the current
step's reference window and ``qwork[:, :1]`` the current query base.
The strict-match window is maintained with a small ring buffer of the
last ``mpm`` per-step strict-mismatch vectors (leading-dim dynamic
indexing is untiled and allowed), and per-step outputs are accumulated
with one-hot selects instead of dynamic stores.

Per block of BM candidate rows, ONE pass over the tile: per length
step, update the cumulative mismatch count (gated by qlen so its final
value is the whole-read count) and the rolling strict-window count, pack
(level, w, strict) into one int32 key and take two lane-reductions — the
min key (level, representative and strict flag of the first candidate at
the min level) and the min over the rest (runner-up level for the
uniqueness rule).  The CheckMismatches whole-read-fit bit is NOT scanned:
it sits below the candidate-index bits, so it cannot change which
candidate wins, and the caller gathers it from the returned final counts.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pindel_tpu import dna

BM = 128          # rows per grid cell (VMEM-bound at w=2048)
BIG = 2 ** 30


def _kernel(tiles_ref, qq_ref, meta_ref, kmin_ref, k2_ref, cum_out_ref,
            work_ref, qwork_ref, cum_ref, ws_ref, seed_ref,
            ring_ref,
            *, w: int, lmax: int, mpm: int, shift: int, dead: int,
            lsteps: int):
    bm = BM
    vw = meta_ref[:, 0:1]
    qlen = meta_ref[:, 1:2]
    tsec = meta_ref[:, 2:3]
    widx = jax.lax.broadcasted_iota(jnp.int32, (bm, w), 1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (bm, lmax), 1)
    # all compute in int32: v5e vregs have no native i8 compare/rotate
    work_ref[:] = tiles_ref[:].astype(jnp.int32)
    qwork_ref[:] = qq_ref[:].astype(jnp.int32)
    q0 = qwork_ref[:, 0:1]
    seed_ref[:] = ((work_ref[:, :w] == q0).astype(jnp.int32)
                   * (widx < vw).astype(jnp.int32)
                   * (q0 != dna.N).astype(jnp.int32))

    def current(l):
        """(Matches()-mismatch, strict mismatch) as {0,1} int32.

        Matches() rule: q==N matches iff ref!=N, else ref==q — so the
        mismatch indicator is (ref != q) XOR (q == N), avoiding a
        boolean select (mosaic rejects i1-select broadcasts).
        """
        ref = work_ref[:, :w]
        qb = qwork_ref[:, 0:1]
        mm = ((ref != qb).astype(jnp.int32)
              ^ (qb == dna.N).astype(jnp.int32))
        strict = (ref != qb).astype(jnp.int32) * (l > 0).astype(jnp.int32)
        return mm, strict

    def advance():
        # left-rotate by one lane (pltpu.roll requires non-negative shift)
        work_ref[:] = pltpu.roll(work_ref[:], work_ref.shape[1] - 1, 1)
        qwork_ref[:] = pltpu.roll(qwork_ref[:], lmax - 1, 1)

    # Single pass: per-length packed-key statistics.  The whole-read-fit
    # bit (CheckMismatches) sits below the candidate-index bits in the
    # key, so it never affects WHICH candidate wins — it is derived
    # afterwards from the final cumulative counts (cum_out) by gathering
    # at the winning candidate on the XLA side, saving a whole second
    # scan over the tile.
    cum_ref[:] = jnp.zeros((bm, w), jnp.int32)
    ws_ref[:] = jnp.zeros((bm, w), jnp.int32)
    ring_ref[:] = jnp.zeros((mpm, bm, w), jnp.int32)
    kmin_ref[:] = jnp.zeros((bm, lmax), jnp.int32)
    k2_ref[:] = jnp.zeros((bm, lmax), jnp.int32)

    def body(l, _):
        mm, strict = current(l)
        # gate by qlen so the final cum equals the whole-read count
        # (steps beyond qlen-1 can never emit, so keys are unaffected)
        cum_ref[:] = cum_ref[:] + mm * ((l >= 1) & (l < qlen)).astype(
            jnp.int32)
        # rolling strict window over the last mpm steps via a ring buffer
        slot = l % mpm
        ws_ref[:] = ws_ref[:] + strict - ring_ref[slot]
        ring_ref[slot] = strict
        cum = cum_ref[:]
        live = seed_ref[:] * (cum <= tsec).astype(jnp.int32)
        lvl = cum * live + jnp.int32(dead) * (1 - live)
        key = ((lvl << shift)
               | ((ws_ref[:] > 0).astype(jnp.int32) << 1)
               | (widx << 2))
        kmin = jnp.min(key, axis=1, keepdims=True)          # [bm,1]
        k2 = jnp.min(key + (key == kmin).astype(jnp.int32) * jnp.int32(BIG),
                     axis=1, keepdims=True)
        # one-hot column accumulate (no dynamic lane stores on TPU)
        at_l = (lidx == l).astype(jnp.int32)
        kmin_ref[:] = kmin * at_l + kmin_ref[:] * (1 - at_l)
        k2_ref[:] = k2 * at_l + k2_ref[:] * (1 - at_l)
        advance()
        return 0

    jax.lax.fori_loop(0, lsteps, body, 0)
    cum_out_ref[:] = cum_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("w", "lmax", "mpm", "lsteps",
                                    "interpret"))
def pallas_scan_rows(tiles, qq, valid_w, qlen, tsec_minus,
                     *, w: int, lmax: int, mpm: int, lsteps: int = 0,
                     interpret: bool = False):
    """[R, T] int8 tiles -> (kmin, k2, cum_end) (see engine_fused):
    kmin/k2 [R, lmax] int32 packed keys, cum_end [R, w] int32 whole-read
    mismatch counts per candidate (for the deferred CheckMismatches fit
    gather).

    Rows are padded to a BM multiple with valid_w = 0 (no seeds, so their
    stats are dead and the caller slices them away).
    """
    from pindel_tpu.ops.engine_fused import I16DEAD, U8DEAD, _key_shift
    r, t = tiles.shape
    assert t == w + lmax, (t, w, lmax)
    shift = _key_shift(w)
    dead = U8DEAD if lmax <= 255 else I16DEAD
    # k2 adds BIG (2^30) to dead keys in int32, so the full key plus BIG
    # must stay below 2^31 (ADVICE r2: the engine's SPACER guards cap w at
    # 65536, but don't rely on that coupling here)
    assert (dead << shift) + BIG < 2 ** 31, (w, lmax)

    rp = ((r + BM - 1) // BM) * BM
    if rp != r:
        pad = rp - r
        tiles = jnp.pad(tiles, ((0, pad), (0, 0)))
        qq = jnp.pad(qq, ((0, pad), (0, 0)))
        valid_w = jnp.pad(valid_w, (0, pad))
        qlen = jnp.pad(qlen, (0, pad), constant_values=1)
        tsec_minus = jnp.pad(tsec_minus, (0, pad))
    meta = jnp.stack([valid_w, qlen, tsec_minus], axis=1)  # [R,3]
    meta = jnp.pad(meta.astype(jnp.int32), ((0, 0), (0, 125)))  # lane-tile

    grid = (rp // BM,)
    kern = functools.partial(_kernel, w=w, lmax=lmax, mpm=mpm,
                             shift=shift, dead=dead,
                             lsteps=lsteps or lmax)
    kmin, k2, cum_end = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, lmax), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BM, lmax), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, lmax), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, lmax), jnp.int32),
            jax.ShapeDtypeStruct((rp, lmax), jnp.int32),
            jax.ShapeDtypeStruct((rp, w), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BM, t), jnp.int32),       # rolling tile copy
            pltpu.VMEM((BM, lmax), jnp.int32),    # rolling query copy
            pltpu.VMEM((BM, w), jnp.int32),       # cum
            pltpu.VMEM((BM, w), jnp.int32),       # strict-window count
            pltpu.VMEM((BM, w), jnp.int32),       # seeded
            pltpu.VMEM((mpm, BM, w), jnp.int32),  # strict history ring
        ],
        interpret=interpret,
    )(tiles, qq, meta)
    return kmin[:r], k2[:r], cum_end[:r]
