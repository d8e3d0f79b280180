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

Tiles arrive 128-ALIGNED: each row's buffer starts at a 128-multiple of
the (possibly reversed) chromosome and ``off`` gives the window's true
start within it.  The caller's tile load is then a plain row-take from
the chromosome laid out as [CL/128, 128] — the per-row unaligned gather
it replaces cost more than the whole scan on TPU.  Candidate lanes
occupy [off, off+valid_w); the packed key stores the window-relative
offset ``lane - off`` so downstream decode never sees the alignment.

TWO passes over the tile per block of BM candidate rows:

* Pass 1 accumulates each candidate's whole-read mismatch count — the
  CheckMismatches fit input (searcher.cpp:383-387) — with nothing but a
  compare-and-add per step.  The resulting per-candidate fit bit
  ``fitbad = (total < thr)`` is folded into bit 0 of the packed key, so
  the fit decision of every per-length representative comes out of the
  same min-reduction as the level and the strict flag.  (Bits 0-1 sit
  below the candidate-index bits, so they never change which candidate
  wins.)  This replaces the former [rows, W] cumulative-count output and
  the following HBM take_along_axis gather — on TPU the gather cost more
  than the whole scan.

* Pass 2 is the scan proper with a minimal per-step state (two [BM, WE]
  arrays):

  - ``keybase`` carries the packed (cumulative-mismatch level << shift)
    | (window_offset << 2) | fitbad key incrementally — one shifted
    add per step.  Dead lanes (not seeded) START at the ``dead`` level:
    levels are monotone counts rather than saturated ones, which changes
    no emission decision because every rule that consumes a level first
    tests it against budgets <= tsec < dead (see _emit_rules).  Dead
    lanes outside [off, off+w) have their offset clamped into [0, w) —
    they can collide with live offsets, which is harmless because their
    level keeps them strictly above every consumed threshold.
  - ``lastmm`` replaces the strict-mismatch ring buffer: the strict
    window rule "a strict mismatch in the last mpm steps" is exactly
    ``lastmm > l - mpm`` for the step index of the most recent strict
    mismatch (recorded for steps >= 1 only).

  The per-length statistics are two lane-reductions over the packed
  key: the min (level, representative, strict flag, fit bit at once)
  and the min over the rest (runner-up level for the uniqueness rule).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pindel_tpu import dna

BM = 128          # rows per grid cell (VMEM-bound at w=2048)
NEVER = -(1 << 20)   # lastmm sentinel: no strict mismatch yet
MAXI = 2 ** 31 - 1   # runner-up placeholder for the min-key lanes


def _kernel(tiles_ref, qq_ref, meta_ref, kmin_ref, k2_ref,
            work_ref, qwork_ref, keybase_ref, lastmm_ref,
            *, w: int, we: int, lmax: int, mpm: int, shift: int,
            dead: int, lsteps: int):
    bm = BM
    vw = meta_ref[:, 0:1]
    qlen = meta_ref[:, 1:2]
    thr = meta_ref[:, 2:3]
    off = meta_ref[:, 3:4]
    widx = jax.lax.broadcasted_iota(jnp.int32, (bm, we), 1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (bm, lmax), 1)
    # all compute in int32: v5e vregs have no native i8 compare/rotate
    work_ref[:] = tiles_ref[:].astype(jnp.int32)
    qwork_ref[:] = qq_ref[:].astype(jnp.int32)

    # ---- pass 1: whole-read mismatch totals -> per-candidate fit bit
    lastmm_ref[:] = jnp.zeros((bm, we), jnp.int32)   # total counts here

    def total_body(l, _):
        qb = qwork_ref[:, 0:1]
        d = work_ref[:, :we] != qb
        mm = (d ^ (qb == dna.N)) & ((l >= 1) & (l < qlen))
        lastmm_ref[:] = lastmm_ref[:] + mm.astype(jnp.int32)
        work_ref[:] = pltpu.roll(work_ref[:], work_ref.shape[1] - 1, 1)
        qwork_ref[:] = pltpu.roll(qwork_ref[:], lmax - 1, 1)
        return 0

    jax.lax.fori_loop(0, lsteps, total_body, 0)
    fitbad = (lastmm_ref[:] < thr).astype(jnp.int32)

    # ---- pass 2: the scan proper (restore the rolled working copies)
    work_ref[:] = tiles_ref[:].astype(jnp.int32)
    qwork_ref[:] = qq_ref[:].astype(jnp.int32)
    q0 = qwork_ref[:, 0:1]
    seed = ((work_ref[:, :we] == q0) & (widx >= off)
            & (widx < off + vw) & (q0 != dna.N))
    woff = jnp.clip(widx - off, 0, w - 1)
    keybase_ref[:] = (jnp.where(seed, 0, jnp.int32(dead)) << shift) \
        | (woff << 2) | fitbad
    lastmm_ref[:] = jnp.full((bm, we), NEVER, jnp.int32)
    kmin_ref[:] = jnp.zeros((bm, lmax), jnp.int32)
    k2_ref[:] = jnp.zeros((bm, lmax), jnp.int32)

    def body(l, _):
        ref = work_ref[:, :we]
        qb = qwork_ref[:, 0:1]
        d = ref != qb                              # strict mismatch
        # Matches() rule (q==N matches iff ref!=N): mismatch = d ^ (q==N);
        # counted for steps 1..qlen-1 only
        mm = (d ^ (qb == dna.N)) & ((l >= 1) & (l < qlen))
        keybase_ref[:] = keybase_ref[:] + (mm.astype(jnp.int32) << shift)
        lastmm_ref[:] = jnp.where(
            d, jax.lax.select(l >= 1, l, jnp.int32(NEVER)), lastmm_ref[:])
        sbad = (lastmm_ref[:] > l - mpm).astype(jnp.int32) << 1
        key = keybase_ref[:] + sbad
        kmin = jnp.min(key, axis=1, keepdims=True)          # [bm,1]
        k2 = jnp.min(jnp.where(key == kmin, jnp.int32(MAXI), key),
                     axis=1, keepdims=True)
        at_l = lidx == l
        kmin_ref[:] = jnp.where(at_l, kmin, kmin_ref[:])
        k2_ref[:] = jnp.where(at_l, k2, k2_ref[:])
        # left-rotate by one lane (pltpu.roll requires non-negative shift)
        work_ref[:] = pltpu.roll(work_ref[:], work_ref.shape[1] - 1, 1)
        qwork_ref[:] = pltpu.roll(qwork_ref[:], lmax - 1, 1)
        return 0

    jax.lax.fori_loop(0, lsteps, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("w", "lmax", "mpm", "lsteps",
                                    "interpret"))
def pallas_scan_rows(tiles, qq, valid_w, qlen, thr, off=None,
                     *, w: int, lmax: int, mpm: int, lsteps: int = 0,
                     interpret: bool = False):
    """[R, T] int8 aligned tiles -> (kmin, k2): [R, lmax] int32 packed
    keys (level << shift | window_offset << 2 | strict_bad << 1 |
    fitbad) per length, with lane space WE = T - lmax >= w and per-row
    window start ``off`` (0 when omitted, T == w + lmax exactly).

    Rows are padded to a BM multiple with valid_w = 0 (no seeds, so their
    stats are dead and the caller slices them away).
    """
    from pindel_tpu.ops.engine_fused import I16DEAD, U8DEAD, _key_shift
    r, t = tiles.shape
    we = t - lmax
    assert we >= w, (t, w, lmax)
    if off is None:
        assert we == w, (t, w, lmax)
        off = jnp.zeros((r,), jnp.int32)
    shift = _key_shift(w)
    dead = U8DEAD if lmax <= 255 else I16DEAD
    # levels are monotone counts from a base of 0 (seeded) or `dead`
    # (unseeded), bounded by dead + lmax; the full packed key must
    # stay below int32
    assert ((dead + lmax) << shift) + (1 << shift) < 2 ** 31, (w, lmax)

    rp = ((r + BM - 1) // BM) * BM
    if rp != r:
        pad = rp - r
        tiles = jnp.pad(tiles, ((0, pad), (0, 0)))
        qq = jnp.pad(qq, ((0, pad), (0, 0)))
        valid_w = jnp.pad(valid_w, (0, pad))
        qlen = jnp.pad(qlen, (0, pad), constant_values=1)
        thr = jnp.pad(thr, (0, pad))
        off = jnp.pad(off, (0, pad))
    meta = jnp.stack([valid_w, qlen, thr, off], axis=1)  # [R,4]
    meta = jnp.pad(meta.astype(jnp.int32), ((0, 0), (0, 124)))  # lane-tile

    grid = (rp // BM,)
    kern = functools.partial(_kernel, w=w, we=we, lmax=lmax, mpm=mpm,
                             shift=shift, dead=dead,
                             lsteps=lsteps or lmax)
    kmin, k2 = pl.pallas_call(
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
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, lmax), jnp.int32),
            jax.ShapeDtypeStruct((rp, lmax), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BM, t), jnp.int32),       # rolling tile copy
            pltpu.VMEM((BM, lmax), jnp.int32),    # rolling query copy
            pltpu.VMEM((BM, we), jnp.int32),      # packed key base
            pltpu.VMEM((BM, we), jnp.int32),      # last strict mm / totals
        ],
        interpret=interpret,
    )(tiles, qq, meta)
    return kmin[:r], k2[:r]
