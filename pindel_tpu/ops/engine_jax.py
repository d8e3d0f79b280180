"""Batched JAX/XLA search engine (TPU path).

Reformulates the pattern-growth search (see ops/search_np.py for the rule
derivation and reference citations) as a length-scan over dense candidate
lanes:

* every lane (close end: one; far end: two per region — forward strand and
  the reverse-complement backward strand) is normalized to a *forward tile*:
  a contiguous chromosome slice, reversed for backward lanes, so the step
  compare is always ``tile[w + l] vs query[l]``;
* a ``lax.scan`` over prefix length carries per-candidate cumulative
  mismatch counts ([B, NL, W] int32 on the VPU) and per-step emits only the
  per-read aggregates the emission rules need (min level, uniqueness counts,
  representative index, strict-window bit) — O(B * Lmax) output;
* the unique-point emission decision (CheckLeft/Right_Close + CheckBoth +
  CheckMismatches logic) is evaluated vectorized on device; the host merely
  converts (read, length, candidate) winners into UniquePoint records.

Static shapes per launch: W (window, bucketed), Lmax (query pad), NL (max
lanes).  Reads are batched data-parallel; the same function shards over a
``jax.sharding.Mesh`` for multi-chip execution (see parallel/mesh.py).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pindel_tpu import dna
from pindel_tpu.config import MAX_READ_LENGTH
from pindel_tpu.ops.search_np import Lane
from pindel_tpu.reads import UniquePoint

DEAD = jnp.int32(127)
BIGW = jnp.int32(2**30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("w", "lmax", "nl", "mpm", "bp_start"))
def _search_kernel(chrom, slice_start, reverse, qq, valid_w, qlen,
                   max_snp, tsec_minus, maxmm, max_allowed,
                   *, w: int, lmax: int, nl: int, mpm: int,
                   bp_start: int):
    """Device search over a batch.

    Args:
      chrom: [C] int8 padded chromosome codes.
      slice_start: [B, NL] int32 start of the contiguous tile slice.
      reverse: [B, NL] bool — tile is read right-to-left (backward lane).
      qq: [B, NL, Lmax] int8 oriented per-lane query codes.
      valid_w: [B, NL] int32 number of valid candidate offsets (<= W).
      qlen: [B] int32 query lengths.
      max_snp, tsec_minus: [B] int32 per-read budgets.
      maxmm: [MAX_READ_LENGTH] int32 budget table.
    Returns per (read, length-1): emit flag, level, rep lane, rep w, full_mm.
    """
    tile_len = w + lmax

    def load_tile(start, rev):
        t = jax.lax.dynamic_slice(chrom, (start,), (tile_len,))
        return jax.lax.select(rev, jnp.flip(t), t)

    tiles = jax.vmap(jax.vmap(load_tile))(slice_start, reverse)  # [B,NL,T]

    widx = jnp.arange(w, dtype=jnp.int32)                        # [W]
    wvalid = widx[None, None, :] < valid_w[:, :, None]           # [B,NL,W]
    seeded = (tiles[:, :, :w] == qq[:, :, 0:1]) & wvalid
    seeded &= (qq[:, :, 0:1] != dna.N)

    mpm_i = mpm

    def step(carry, l):
        cum, cum_at_end, strict_hist = carry
        # step l compares tile[w + l] vs qq[l]  (length L = l + 1 after seed)
        ref = jax.lax.dynamic_slice_in_dim(tiles, l, w, axis=2)   # [B,NL,W]
        qb = jax.lax.dynamic_slice_in_dim(qq, l, 1, axis=2)       # [B,NL,1]
        is_n = qb == dna.N
        match = jnp.where(is_n, ref != dna.N, ref == qb)
        strict_mm = (ref != qb).astype(jnp.int8)
        first = l == 0
        # seed step: cum stays 0 for seeded candidates
        mm_step = jnp.where(first, 0, (~match).astype(jnp.int32))
        cum = cum + mm_step
        # whole-read mismatch count snapshot at the final real step
        cum_at_end = jnp.where((l == qlen[:, None, None] - 1), cum, cum_at_end)
        strict_hist = jnp.where(
            first,
            strict_hist.at[..., :].set(0),
            strict_hist.at[..., l % mpm_i].set(strict_mm))
        strict_bad = strict_hist.sum(axis=-1) > 0                 # [B,NL,W]

        lvl = jnp.where(seeded & (cum <= tsec_minus[:, None, None]),
                        cum, DEAD)                                # [B,NL,W]
        lvl_cap = jnp.where(lvl <= max_snp[:, None, None], lvl, DEAD)
        min_mm = jnp.min(lvl_cap, axis=(1, 2))                    # [B]
        at_min = lvl == min_mm[:, None, None]
        cnt1 = jnp.sum(at_min, axis=(1, 2), dtype=jnp.int32)
        hi = jnp.minimum(min_mm + (tsec_minus - max_snp), tsec_minus)
        cntp = jnp.sum(lvl <= hi[:, None, None], axis=(1, 2),
                       dtype=jnp.int32)
        # representative: first (lane, w) in lane-major order at min level
        flat = at_min.reshape(at_min.shape[0], -1)
        rep_flat = jnp.argmax(flat, axis=1).astype(jnp.int32)
        rep_lane = rep_flat // w
        rep_w = rep_flat % w
        rep_strict_bad = jnp.take_along_axis(
            strict_bad.reshape(strict_bad.shape[0], -1),
            rep_flat[:, None], axis=1)[:, 0]
        return (cum, cum_at_end, strict_hist), (min_mm, cnt1, cntp, rep_lane,
                                                rep_w, rep_strict_bad)

    cum0 = jnp.zeros(seeded.shape, dtype=jnp.int32)
    hist0 = jnp.zeros(seeded.shape + (mpm_i,), dtype=jnp.int8)
    (_, cum_final, _), outs = jax.lax.scan(
        step, (cum0, cum0, hist0), jnp.arange(lmax, dtype=jnp.int32))
    min_mm, cnt1, cntp, rep_lane, rep_w, rep_strict_bad = [
        jnp.moveaxis(o, 0, 1) for o in outs]                      # [B, Lmax]

    b = min_mm.shape[0]
    lens = jnp.arange(1, lmax + 1, dtype=jnp.int32)[None, :]      # L per col
    in_range = (lens >= bp_start) & (lens <= qlen[:, None] - 1)
    maxmm_l = maxmm[jnp.minimum(lens, MAX_READ_LENGTH - 1)]
    stop_here = in_range & (min_mm > maxmm_l)
    stopped = jnp.cumsum(stop_here.astype(jnp.int32), axis=1) > 0
    # emission happens before the early-return at the stopping length itself
    # is taken? No: the early return fires BEFORE emission at that length.
    alive = ~stopped

    # full-read mismatch count for the representative candidate
    cum_flat = cum_final.reshape(b, -1)                           # [B, NL*W]
    rep_flat = rep_lane * w + rep_w
    full_mm = jnp.take_along_axis(cum_flat, rep_flat, axis=1)     # [B, Lmax]

    # direction-dependent MPM length rule: forward lanes need L > mpm,
    # backward lanes need L >= mpm.  Backward lanes are the reversed tiles.
    rep_reverse = jnp.take_along_axis(reverse, rep_lane, axis=1)  # [B, Lmax]
    len_ok = jnp.where(rep_reverse, lens >= mpm_i, lens > mpm_i)

    # max_allowed is precomputed host-side as float32(double(n) * double(rate))
    # to reproduce the reference's double->float rounding exactly.
    whole_read_bad_fit = full_mm.astype(jnp.float32) >= max_allowed[:, None]

    emit = (in_range & alive
            & (min_mm <= max_snp[:, None])
            & (cnt1 == 1)
            & (lens >= bp_start + min_mm)
            & (cntp == 1)
            & (min_mm <= maxmm_l)
            & len_ok
            & ~rep_strict_bad
            & whole_read_bad_fit)
    return emit, min_mm, rep_lane, rep_w, full_mm


@dataclasses.dataclass
class _Launch:
    w: int
    lmax: int
    nl: int


class JaxBackend:
    """Backend with the Searcher-facing ``run`` interface."""

    def __init__(self, settings, maxmm: np.ndarray, chrom_codes: np.ndarray,
                 w_buckets: Sequence[int] = (128, 512, 2048, 8192, 32768)):
        self.mpm = settings.min_perfect_match_around_bp
        self.rate = settings.max_allowed_mismatch_rate
        self.maxmm_dev = jnp.asarray(maxmm, dtype=jnp.int32)
        self.chrom_dev = jax.device_put(jnp.asarray(chrom_codes))
        self.w_buckets = tuple(sorted(w_buckets))

    def _bucket(self, width: int) -> int:
        for b in self.w_buckets:
            if width <= b:
                return b
        return _round_up(width, 32768)

    def run(self, batch_lanes: List[List[Lane]], bp_start: int,
            max_snps: Sequence[int], tsec_minus: Sequence[int]
            ) -> List[Tuple[List[UniquePoint], int]]:
        if not batch_lanes:
            return []
        nl = max(len(lanes) for lanes in batch_lanes)
        widths = [max((l.end - l.start) for l in lanes) if lanes else 1
                  for lanes in batch_lanes]
        w = self._bucket(max(max(widths), 1))
        qlens = [int(lanes[0].query.shape[0]) for lanes in batch_lanes]
        lmax = _round_up(max(qlens), 32)
        from pindel_tpu.genome import SPACER
        assert w + lmax <= SPACER, (
            f"window bucket {w}+{lmax} exceeds spacer; chunked far-end search "
            "for very large -x not yet implemented")

        b = len(batch_lanes)
        slice_start = np.zeros((b, nl), dtype=np.int32)
        rev = np.zeros((b, nl), dtype=bool)
        qq = np.full((b, nl, lmax), dna.N, dtype=np.int8)
        valid_w = np.zeros((b, nl), dtype=np.int32)
        for i, lanes in enumerate(batch_lanes):
            for j, lane in enumerate(lanes):
                lw = max(lane.end - lane.start, 0)
                n = lane.query.shape[0]
                if lane.forward:
                    slice_start[i, j] = lane.start
                    qq[i, j, :n] = lane.query
                else:
                    slice_start[i, j] = lane.end - w - lmax
                    rev[i, j] = True
                    qq[i, j, :n] = lane.query[::-1]
                valid_w[i, j] = min(lw, w)

        max_allowed = np.float32(
            np.array(qlens, dtype=np.float64) * np.float64(self.rate))
        emit, min_mm, rep_lane, rep_w, full_mm = jax.device_get(
            _search_kernel(
                self.chrom_dev,
                jnp.asarray(slice_start), jnp.asarray(rev), jnp.asarray(qq),
                jnp.asarray(valid_w), jnp.asarray(qlens, dtype=jnp.int32),
                jnp.asarray(max_snps, dtype=jnp.int32),
                jnp.asarray(tsec_minus, dtype=jnp.int32),
                self.maxmm_dev, jnp.asarray(max_allowed),
                w=w, lmax=lmax, nl=nl, mpm=self.mpm,
                bp_start=bp_start))

        results: List[Tuple[List[UniquePoint], int]] = []
        for i, lanes in enumerate(batch_lanes):
            ups: List[UniquePoint] = []
            last_full = 0
            for l_idx in np.nonzero(emit[i])[0]:
                length = int(l_idx) + 1
                j = int(rep_lane[i, l_idx])
                if j >= len(lanes):
                    continue
                lane = lanes[j]
                wi = int(rep_w[i, l_idx])
                if lane.forward:
                    abs_loc = lane.start + wi + length - 1
                else:
                    # tile index wi maps to p0 counted from the tile end
                    p0 = (slice_start[i, j] + w + lmax - 1) - wi
                    abs_loc = int(p0) - (length - 1)
                ups.append(UniquePoint(
                    chr_name=lane.chr_name, length_str=length,
                    abs_loc=int(abs_loc), direction=lane.direction,
                    strand=lane.strand, mismatches=int(min_mm[i, l_idx])))
                last_full = int(full_mm[i, l_idx])
            results.append((ups, last_full))
        return results
