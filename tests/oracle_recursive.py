"""Literal-recursion oracle used ONLY by tests.

A direct Python expression of the reference's recursive pattern-growth control
flow (searcher.cpp:48-329, pindel.cpp:2250-2941, farend_searcher.cpp:46-103),
used to validate the dense/vectorized reformulation in pindel_tpu.ops.
Intentionally slow and simple.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from pindel_tpu import dna
from pindel_tpu.genome import SPACER
from pindel_tpu.reads import UniquePoint


def matches(read_base: int, ref_base: int) -> bool:
    if read_base != dna.N:
        return ref_base == read_base
    return ref_base != dna.N


def check_mismatches(chrom: np.ndarray, read_codes: np.ndarray,
                     up: UniquePoint, mpm: int, rate: float) -> bool:
    """CheckMismatches, searcher.cpp:331-388."""
    if up.strand == "+":
        cur = read_codes
    else:
        cur = dna.revcomp(read_codes)
    n = len(cur)
    if up.direction == "+":
        start = up.abs_loc - up.length_str + 1
        if up.length_str <= mpm:
            return False
        bp_read = cur[up.length_str - mpm:up.length_str]
        bp_ref = chrom[up.abs_loc - mpm + 1:up.abs_loc + 1]
        if not np.array_equal(bp_read, bp_ref):
            return False
    else:
        start = up.abs_loc + up.length_str - n
        if n < up.length_str:
            return False
        bp_read = cur[n - up.length_str:n - up.length_str + mpm]
        bp_ref = chrom[up.abs_loc:up.abs_loc + mpm]
        if len(bp_read) != len(bp_ref) or not np.array_equal(bp_read, bp_ref):
            return False
    max_allowed = np.float32(n * rate)
    num_mm = 0
    for i in range(n):
        if cur[i] == dna.N:
            if chrom[start + i] == dna.N:
                num_mm += 1
        else:
            if chrom[start + i] != cur[i]:
                num_mm += 1
    return np.float32(num_mm) >= max_allowed


class Budget:
    def __init__(self, read_len: int, maxmm: np.ndarray, additional: int):
        self.max_snp = int(maxmm[read_len])
        self.tsec_minus = self.max_snp + additional
        self.tsec = self.tsec_minus + 1
        self.maxmm = maxmm
        self.additional = additional


def _categorize(read_base: int, chrom: np.ndarray, pd_in: List[List[int]],
                pd_out: List[List[int]], m: int, direction: int,
                max_mm: int) -> None:
    for pos in pd_in[m]:
        p = pos + direction
        if matches(read_base, chrom[p]):
            pd_out[m].append(p)
        elif m < max_mm:
            pd_out[m + 1].append(p)


def close_check(chrom: np.ndarray, read_codes: np.ndarray, qseq: np.ndarray,
                pd: List[List[int]], bp_start: int, bp_end: int, length: int,
                ups: List[UniquePoint], direction: int, budget: Budget,
                mpm: int, rate: float, chr_name: str) -> None:
    """CheckLeft_Close (direction=1) / CheckRight_Close (direction=-1)."""
    if bp_start <= length <= bp_end:
        min_mm = budget.max_snp + 1
        for m in range(budget.max_snp + 1):
            if pd[m]:
                min_mm = m
                break
        if min_mm > budget.maxmm[length]:
            return
        for i in range(budget.max_snp + 1):
            if len(pd[i]) == 1 and length >= bp_start + i:
                total = sum(len(pd[j]) for j in range(i + budget.additional + 1))
                if total == 1 and i <= budget.maxmm[length]:
                    if direction == 1:
                        up = UniquePoint(chr_name, length, pd[i][0], "+", "-", i)
                    else:
                        up = UniquePoint(chr_name, length, pd[i][0], "-", "+", i)
                    if check_mismatches(chrom, read_codes, up, mpm, rate):
                        ups.append(up)
                        break
    if length < bp_end:
        # ExtendMatchClose
        n = len(qseq)
        base = qseq[length] if direction == 1 else qseq[n - 1 - length]
        out: List[List[int]] = [[] for _ in range(budget.tsec)]
        for m in range(budget.tsec_minus + 1):
            _categorize(base, chrom, pd, out, m, direction, budget.tsec_minus)
        total = sum(len(out[j]) for j in range(budget.max_snp + 1))
        if total:
            close_check(chrom, read_codes, qseq, out, bp_start, bp_end,
                        length + 1, ups, direction, budget, mpm, rate, chr_name)


def get_close_end_inner(chrom: np.ndarray, chr_name: str, seq: np.ndarray,
                        matched_d: str, matched_rel_pos: int, insert_size: int,
                        range_index: int, budget: Budget, min_close: int,
                        mpm: int, rate: float) -> List[UniquePoint]:
    """GetCloseEndInner, pindel.cpp:2250-2396."""
    n = len(seq)
    ups: List[UniquePoint] = []
    pd: List[List[int]] = [[] for _ in range(budget.tsec)]
    if matched_d == "+":
        q = dna.revcomp(seq)
        start = matched_rel_pos + SPACER - range_index * insert_size
        end = start + (2 * range_index + 1) * insert_size
        if q[0] != dna.N:
            for pos in range(start, end):
                if chrom[pos] == q[0]:
                    pd[0].append(pos)
        close_check(chrom, seq, q, pd, min_close, n - 1, 1, ups, 1,
                    budget, mpm, rate, chr_name)
    else:
        q = seq
        end = matched_rel_pos + SPACER + range_index * insert_size
        start = end - (2 * range_index + 1) * insert_size
        if q[n - 1] != dna.N:
            for pos in range(start, end):
                if chrom[pos] == q[n - 1]:
                    pd[0].append(pos)
        close_check(chrom, seq, q, pd, min_close, n - 1, 1, ups, -1,
                    budget, mpm, rate, chr_name)
    return ups


def get_close_end(chrom: np.ndarray, chr_name: str, seq: np.ndarray,
                  matched_d: str, matched_rel_pos: int, insert_size: int,
                  budget: Budget, min_close: int, mpm: int,
                  rate: float) -> Tuple[List[UniquePoint], np.ndarray]:
    """GetCloseEnd, pindel.cpp:2531-2576. Returns (ups, final seq)."""
    ups: List[UniquePoint] = []
    for range_index in range(2):
        ups = get_close_end_inner(chrom, chr_name, seq, matched_d,
                                  matched_rel_pos, insert_size, range_index,
                                  budget, min_close, mpm, rate)
        if not ups:
            seq = dna.revcomp(seq)
            ups = get_close_end_inner(chrom, chr_name, seq, matched_d,
                                      matched_rel_pos, insert_size,
                                      range_index, budget, min_close, mpm,
                                      rate)
        if ups:
            break
    return ups, seq


def both_check(chrom: np.ndarray, seq: np.ndarray,
               regions: List[Tuple[List[List[int]], List[List[int]]]],
               min_len: int, bp_end: int, length: int,
               ups: List[UniquePoint], budget: Budget, mpm: int, rate: float,
               chr_name: str) -> None:
    """CheckBoth, pindel.cpp:2823-2902 (single-chromosome regions)."""
    if min_len <= length <= bp_end:
        min_mm = budget.max_snp + 1
        for m in range(budget.max_snp + 1):
            if any(len(p[m]) + len(mi[m]) for p, mi in regions):
                min_mm = m
                break
        if min_mm > budget.maxmm[length]:
            return
        seen_less = 0
        for nm in range(budget.max_snp + 1):
            if seen_less:
                break
            total = sum(len(p[nm]) + len(mi[nm]) for p, mi in regions)
            seen_less = total
            if total == 1 and length >= min_len + nm:
                full = 0
                hit_region = 0
                for j in range(nm + budget.additional + 1):
                    for ri, (p, mi) in enumerate(regions):
                        h = len(p[j]) + len(mi[j])
                        full += h
                        if h:
                            hit_region = ri
                if full == 1 and nm <= budget.maxmm[length]:
                    p, mi = regions[hit_region]
                    if len(p[nm]) == 1:
                        up = UniquePoint(chr_name, length, p[nm][0], "+", "+", nm)
                    else:
                        up = UniquePoint(chr_name, length, mi[nm][0], "-", "-", nm)
                    if check_mismatches(chrom, seq, up, mpm, rate):
                        ups.append(up)
                        break
    if length < bp_end:
        # ExtendMatch, pindel.cpp:2673-2725
        base = seq[length]
        base_rc = dna.RC[base]
        new_regions = []
        all_empty = True
        for (p, mi) in regions:
            op: List[List[int]] = [[] for _ in range(budget.tsec)]
            om: List[List[int]] = [[] for _ in range(budget.tsec)]
            for m in range(budget.tsec_minus + 1):
                _categorize(base, chrom, p, op, m, 1, budget.tsec_minus)
                _categorize(base_rc, chrom, mi, om, m, -1, budget.tsec_minus)
            if sum(len(op[j]) + len(om[j]) for j in range(budget.tsec)):
                all_empty = False
                new_regions.append((op, om))
        if not all_empty:
            both_check(chrom, seq, new_regions, min_len, bp_end, length + 1,
                       ups, budget, mpm, rate, chr_name)


def search_far_end_at_pos(chrom: np.ndarray, chr_name: str, seq: np.ndarray,
                          regions: Sequence[Tuple[int, int]],
                          max_len_close: int, budget: Budget, mpm: int,
                          rate: float,
                          up_far: List[UniquePoint]) -> List[UniquePoint]:
    """SearchFarEndAtPos, farend_searcher.cpp:46-103. Returns new up_far."""
    base = seq[0]
    if base == dna.N or max_len_close == 0:
        return up_far
    base_rc = dna.RC[base]
    region_pds = []
    hits = 0
    for (start, end) in regions:
        if start < 0:
            start = end - 1
        p: List[List[int]] = [[] for _ in range(budget.tsec)]
        mi: List[List[int]] = [[] for _ in range(budget.tsec)]
        for pos in range(start, end):
            if chrom[pos] == base:
                p[0].append(pos)
            elif chrom[pos] == base_rc:
                mi[0].append(pos)
        hits += len(p[0]) + len(mi[0])
        region_pds.append((p, mi))
    if hits:
        ups: List[UniquePoint] = []
        both_check(chrom, seq, region_pds, 10, len(seq) - 1, 1, ups,
                   budget, mpm, rate, chr_name)
        old_max = up_far[-1].length_str if up_far else 0
        new_max = ups[-1].length_str if ups else 0
        if new_max >= old_max:
            return ups
    return up_far


def search_far_end(chrom: np.ndarray, chr_name: str, seq: np.ndarray,
                   up_close: List[UniquePoint], budget: Budget,
                   max_range_index: int, mpm: int, rate: float
                   ) -> List[UniquePoint]:
    """SearchFarEnd, pindel.cpp:1001-1074 (no BD clusters)."""
    up_far: List[UniquePoint] = []
    if not up_close:
        return up_far
    n = len(seq)
    max_close = up_close[-1].length_str
    span = 64
    center = up_close[-1].abs_loc
    for _k in range(1, max_range_index + 2):
        start = center - span if center > span + SPACER else SPACER
        if center + span + SPACER < len(chrom):
            end = center + span
        else:
            end = len(chrom) - SPACER
        up_far = search_far_end_at_pos(chrom, chr_name, seq, [(start, end)],
                                       max_close, budget, mpm, rate, up_far)
        far_max = up_far[-1].length_str if up_far else 0
        if far_max + max_close >= n:
            return up_far
        span *= 4
    return up_far
