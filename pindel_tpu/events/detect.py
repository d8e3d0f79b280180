"""Event detectors: pair close/far anchors into SV evidence per read.

Ports the reference's detector semantics exactly (iteration order, `Used`
flags, mismatch-budget escalation) so clustered output is bit-identical:

* template method: SearchVariant::Search (search_variant.cpp:48-266) with
  subclasses SearchDeletions (searchdeletions.cpp) and SearchShortInsertions
  (searchshortinsertions.cpp);
* deletions with non-template insertions: searchIndels
  (search_deletions_nt.cpp:27-166).

The host-side cost of this layer is trivial next to the search kernels; it
stays in Python deliberately (per-read logic over a handful of anchors).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

from pindel_tpu.config import Settings
from pindel_tpu.events.canonical import (get_real_start_4_deletion,
                                         get_real_start_4_insertion,
                                         revcomp_str)
from pindel_tpu.genome import SPACER
from pindel_tpu.reads import MINUS, PLUS, SplitRead


@dataclasses.dataclass
class WindowContext:
    """Per-window state shared by all detectors.

    ``boxes`` bins read indices by BPLeft/box_size (reference BoxSize
    binning, pindel.cpp:1806-1810); ``future`` holds reads deferred to the
    next window (FutureReads_SR).
    """

    chr_seq: str              # padded chromosome string
    window_end: int           # currentWindow.getEnd(), biological coords
    region_start: int         # userSettings region (bed record), 1-based
    region_end: int
    box_size: int
    num_boxes: int
    future: List[SplitRead]


def read_transgresses_bin_boundaries(read: SplitRead, upper: int) -> bool:
    """Reference: pindel.cpp:560-563."""
    return read.bp_right > upper - 2 * read.insert_size


def read_in_specified_region(read: SplitRead, ctx: WindowContext) -> bool:
    """Reference: readInSpecifiedRegion, pindel.cpp:566-584."""
    if read.bp_left + 1 < ctx.region_start:
        return False
    if read.bp_left + 1 > ctx.region_end:
        return False
    return True


def _place_read(read: SplitRead, idx: int, ctx: WindowContext,
                boxes: List[List[int]]) -> bool:
    """Shared tail: defer to next window or bin into a box; returns placed."""
    if read_transgresses_bin_boundaries(read, ctx.window_end):
        ctx.future.append(read)
        read.used = True
        return False
    if read_in_specified_region(read, ctx):
        box_index = read.bp_left // ctx.box_size
        if box_index < ctx.num_boxes:
            boxes[box_index].append(idx)
            read.used = True
            return True
    return False


class VariantSearcher:
    """Template method, reference SearchVariant::Search."""

    def decision1(self, read: SplitRead, ci: int, fi: int) -> bool:
        raise NotImplementedError

    def decision2(self, read: SplitRead, ci: int, fi: int) -> bool:
        raise NotImplementedError

    def indel_size(self, read: SplitRead) -> int:
        raise NotImplementedError

    def inserted_str1(self, read: SplitRead) -> str:
        raise NotImplementedError

    def inserted_str2(self, read: SplitRead) -> str:
        raise NotImplementedError

    def search(self, reads: List[SplitRead], ctx: WindowContext,
               boxes: List[List[int]]) -> None:
        chr_len = len(ctx.chr_seq)
        for idx, read in enumerate(reads):
            if read.frag_name != read.far_frag_name:
                continue
            if read.used or not read.up_far:
                continue
            max_snp = read.max_snp_error
            if read.matched_d == PLUS:
                for budget in range(max_snp + 1):
                    if read.used:
                        break
                    for ci in range(len(read.up_close)):
                        if read.used:
                            break
                        if read.up_close[ci].mismatches > budget:
                            continue
                        for fi in range(len(read.up_far) - 1, -1, -1):
                            if read.used:
                                break
                            far = read.up_far[fi]
                            close = read.up_close[ci]
                            if far.mismatches > budget:
                                continue
                            if far.mismatches + close.mismatches > budget:
                                continue
                            if far.direction != MINUS:
                                continue
                            if not self.decision1(read, ci, fi):
                                continue
                            read.left = close.abs_loc - close.length_str + 1
                            read.right = far.abs_loc + far.length_str - 1
                            read.bp = close.length_str - 1
                            read.indel_size = self.indel_size(read)
                            read.nt_str = self.inserted_str1(read)
                            read.bp_left = close.abs_loc - SPACER
                            read.bp_right = far.abs_loc - SPACER
                            if not self._finish(read, idx, ctx, boxes,
                                                chr_len):
                                break
            elif read.matched_d == MINUS:
                for budget in range(max_snp + 1):
                    if read.used:
                        break
                    for ci in range(len(read.up_close) - 1, -1, -1):
                        if read.used:
                            break
                        if read.up_close[ci].mismatches > budget:
                            continue
                        for fi in range(len(read.up_far) - 1, -1, -1):
                            if read.used:
                                break
                            far = read.up_far[fi]
                            close = read.up_close[ci]
                            if far.mismatches > budget:
                                continue
                            if far.mismatches + close.mismatches > budget:
                                continue
                            if far.direction != PLUS:
                                continue
                            if not self.decision2(read, ci, fi):
                                continue
                            read.left = far.abs_loc - far.length_str + 1
                            read.right = close.abs_loc + close.length_str - 1
                            read.bp = far.length_str - 1
                            read.indel_size = self.indel_size(read)
                            read.nt_str = self.inserted_str2(read)
                            read.bp_left = far.abs_loc - SPACER
                            read.bp_right = close.abs_loc - SPACER
                            if not self._finish(read, idx, ctx, boxes,
                                                chr_len):
                                break

    def _finish(self, read: SplitRead, idx: int, ctx: WindowContext,
                boxes: List[List[int]], chr_len: int) -> bool:
        """Canonicalize + place; returns False when the far loop must break
        (reference ``break`` after Used=true inside ChrSeq bounds check)."""
        if chr_len < read.bp_left or chr_len < read.bp_right:
            read.used = True
            return False
        real_left, real_right = read.bp_left, read.bp_right
        if read.nt_str:
            read.nt_str, real_left, real_right = _real4ins(
                ctx.chr_seq, read.nt_str, real_left, real_right)
        else:
            real_left, real_right = get_real_start_4_deletion(
                ctx.chr_seq, real_left, real_right)
        diff = read.bp_left - real_left
        diff = min(diff, read.bp - 1)
        if diff > 0:
            read.bp -= diff
            read.bp_left -= diff
            read.bp_right -= diff
        _place_read(read, idx, ctx, boxes)
        return True


def _real4ins(chr_seq, nt, left, right):
    nt2, l2, r2 = get_real_start_4_insertion(chr_seq, nt, left, right)
    return nt2, l2, r2


class SearchDeletions(VariantSearcher):
    """Pure deletions (D).  Reference: searchdeletions.cpp:38-70."""

    def decision1(self, read, ci, fi):
        return (read.up_far[fi].length_str + read.up_close[ci].length_str
                == read.read_length
                and read.up_far[fi].abs_loc > read.up_close[ci].abs_loc + 1)

    def decision2(self, read, ci, fi):
        return (read.up_close[ci].length_str + read.up_far[fi].length_str
                == read.read_length
                and read.up_close[ci].abs_loc > read.up_far[fi].abs_loc + 1)

    def indel_size(self, read):
        return (read.right - read.left) - (read.read_length - 1)

    def inserted_str1(self, read):
        return ""

    def inserted_str2(self, read):
        return ""


class SearchShortInsertions(VariantSearcher):
    """Short insertions (SI).  Reference: searchshortinsertions.cpp:38-71.

    Note: the reference leaves NT_size untouched here (0) even though
    NT_str is set — preserved for sort/filter fidelity.
    """

    def decision1(self, read, ci, fi):
        return (read.up_far[fi].abs_loc == read.up_close[ci].abs_loc + 1
                and read.up_close[ci].length_str + read.up_far[fi].length_str
                < read.read_length)

    def decision2(self, read, ci, fi):
        return (read.up_close[ci].abs_loc == read.up_far[fi].abs_loc + 1
                and read.up_far[fi].length_str + read.up_close[ci].length_str
                < read.read_length)

    def indel_size(self, read):
        return (read.read_length - 1) - (read.right - read.left)

    def inserted_str1(self, read):
        return revcomp_str(read.seq)[read.bp + 1: read.bp + 1 + read.indel_size]

    def inserted_str2(self, read):
        return read.seq[read.bp + 1: read.bp + 1 + read.indel_size]


def left_most_td(read: SplitRead, ctx: WindowContext) -> None:
    """Left-shift a tandem duplication (search_tandem_duplications.cpp:189)."""
    chr_seq = ctx.chr_seq
    pos = read.bp_left + SPACER
    original = pos
    end = read.bp_right + SPACER - 1
    if pos >= len(chr_seq) or end >= len(chr_seq):
        read.bp_left = 1
        read.bp_right = 1
        read.bp = 1
        read.used = True
        return
    while chr_seq[pos] == chr_seq[end]:
        pos -= 1
        end -= 1
    diff = original - pos
    if diff > 0:
        if diff >= read.bp:
            diff = read.bp - 1
        read.bp_left -= diff
        read.bp_right -= diff
        read.bp -= diff


def left_most_inv(read: SplitRead, ctx: WindowContext) -> None:
    """Right-shift an inversion breakpoint (search_inversions.cpp:283-317)."""
    from pindel_tpu.events.canonical import _RC
    chr_seq = ctx.chr_seq
    chr_len = len(chr_seq)
    pos = read.bp_left + SPACER + 1
    original = pos
    end = read.bp_right + SPACER - 1
    if chr_len <= pos + SPACER or chr_len <= original + SPACER:
        read.bp_left = 1
        read.bp_right = 1
        read.bp = 1
        read.used = True
        return
    while chr_seq[pos] == _RC.get(chr_seq[end], "N"):
        pos += 1
        end -= 1
    diff = pos - original
    if diff > 0:
        if read.matched_d == PLUS:
            if diff >= read.bp:
                diff = read.bp - 1
            # reference quirk: the plus branch clamps DIFF but never
            # applies it (search_inversions.cpp:304-307)
        else:
            if diff + read.bp >= read.read_length:
                diff = read.read_length - read.bp - 1
            read.bp_left += diff
            read.bp_right -= diff
            read.bp += diff


def search_tandem_duplications(reads: List[SplitRead], ctx: WindowContext,
                               boxes: List[List[int]]) -> None:
    """Reference: searchTandemDuplications (search_tandem_duplications.cpp)."""
    for idx, read in enumerate(reads):
        if read.used or not read.up_far \
                or read.frag_name != read.far_frag_name:
            continue
        if read.matched_d == PLUS:
            for budget in range(read.max_snp_error + 1):
                for ci in range(len(read.up_close)):
                    if read.used:
                        break
                    close = read.up_close[ci]
                    if close.mismatches > budget:
                        continue
                    for fi in range(len(read.up_far) - 1, -1, -1):
                        if read.used:
                            break
                        far = read.up_far[fi]
                        if far.mismatches > budget:
                            continue
                        if far.mismatches + close.mismatches > budget:
                            continue
                        if far.direction != MINUS:
                            continue
                        if not (far.length_str + close.length_str
                                == read.read_length
                                and far.abs_loc + far.length_str
                                < close.abs_loc
                                and far.abs_loc + close.length_str
                                < close.abs_loc):
                            continue
                        read.right = close.abs_loc - close.length_str + 1
                        read.left = far.abs_loc + far.length_str - 1
                        read.bp = close.length_str - 1
                        read.indel_size = close.abs_loc - far.abs_loc + 1
                        read.bp_right = close.abs_loc - SPACER
                        read.bp_left = far.abs_loc - SPACER
                        if read.bp_left == 0:
                            continue
                        left_most_td(read, ctx)
                        _place_read(read, idx, ctx, boxes)
        elif read.matched_d == MINUS:
            for budget in range(read.max_snp_error + 1):
                for ci in range(len(read.up_close) - 1, -1, -1):
                    if read.used:
                        break
                    close = read.up_close[ci]
                    if close.mismatches > budget:
                        continue
                    for fi in range(len(read.up_far)):
                        if read.used:
                            break
                        far = read.up_far[fi]
                        if far.mismatches > budget:
                            continue
                        if far.mismatches + close.mismatches > budget:
                            continue
                        if far.direction != PLUS:
                            continue
                        if not (close.length_str + far.length_str
                                == read.read_length
                                and close.abs_loc + close.length_str
                                < far.abs_loc
                                and close.abs_loc + far.length_str
                                < far.abs_loc):
                            continue
                        read.right = far.abs_loc - far.length_str + 1
                        read.left = close.abs_loc + close.length_str - 1
                        read.bp = far.length_str - 1
                        read.indel_size = far.abs_loc - close.abs_loc + 1
                        read.bp_right = far.abs_loc - SPACER
                        read.bp_left = close.abs_loc - SPACER
                        if read.bp_left == 0:
                            continue
                        left_most_td(read, ctx)
                        _place_read(read, idx, ctx, boxes)


def search_tandem_duplications_nt(reads: List[SplitRead], ctx: WindowContext,
                                  boxes: List[List[int]],
                                  settings: Settings) -> None:
    """Reference: searchTandemDuplicationsNT
    (search_tandem_duplications_nt.cpp:27-131)."""
    for idx, read in enumerate(reads):
        if read.used or not read.up_far \
                or read.frag_name != read.far_frag_name:
            continue
        close = read.up_close[-1]
        far = read.up_far[-1]
        if far.length_str + close.length_str >= read.read_length:
            continue
        if far.mismatches + close.mismatches > int(
                1 + settings.seq_error_rate
                * (far.length_str + close.length_str)):
            continue
        if read.matched_d == PLUS:
            if far.direction != MINUS:
                continue
            if not (far.abs_loc + far.length_str < close.abs_loc
                    and far.abs_loc + close.length_str < close.abs_loc
                    and far.length_str + close.length_str
                    > settings.min_num_matched_bases):
                continue
            read.right = close.abs_loc - close.length_str + 1
            read.left = far.abs_loc + far.length_str - 1
            read.bp = close.length_str - 1
            read.indel_size = close.abs_loc - far.abs_loc + 1
            read.nt_size = (read.read_length - close.length_str
                            - far.length_str)
            read.nt_str = revcomp_str(read.seq)[
                read.bp + 1: read.bp + 1 + read.nt_size]
            read.bp_right = close.abs_loc - SPACER
            read.bp_left = far.abs_loc - SPACER
            _place_read(read, idx, ctx, boxes)
        elif read.matched_d == MINUS:
            if far.direction != PLUS:
                continue
            if not (close.abs_loc + close.length_str < far.abs_loc
                    and close.abs_loc + far.length_str < far.abs_loc
                    and far.length_str + close.length_str
                    > settings.min_num_matched_bases):
                continue
            read.right = far.abs_loc - far.length_str + 1
            read.left = close.abs_loc + close.length_str - 1
            read.bp = far.length_str - 1
            read.indel_size = far.abs_loc - close.abs_loc + 1
            read.nt_size = (read.read_length - close.length_str
                            - far.length_str)
            read.nt_str = read.seq[read.bp + 1: read.bp + 1 + read.nt_size]
            read.bp_right = far.abs_loc - SPACER
            read.bp_left = close.abs_loc - SPACER
            _place_read(read, idx, ctx, boxes)


def search_inversions(reads: List[SplitRead], ctx: WindowContext,
                      boxes: List[List[int]], settings: Settings) -> None:
    """Reference: searchInversions (search_inversions.cpp:30-280).

    The Minus branches skip the bin-boundary deferral (reference asymmetry).
    """
    min_inv = settings.min_inversion_size

    def place_no_transgress(read, idx):
        if read_in_specified_region(read, ctx):
            box_index = read.bp_left // ctx.box_size
            if box_index < ctx.num_boxes:
                boxes[box_index].append(idx)
                read.used = True

    for idx, read in enumerate(reads):
        if read.used or not read.up_far \
                or read.frag_name != read.far_frag_name:
            continue
        if not (read.up_close[0].strand != read.up_far[0].strand
                and read.up_close[0].direction == read.up_far[0].direction):
            continue
        if read.matched_d == PLUS:
            if read.up_far[0].abs_loc > \
                    read.last_abs_loc_close_end() + min_inv:
                for budget in range(read.max_snp_error + 1):
                    for ci in range(len(read.up_close) - 1, -1, -1):
                        if read.used:
                            break
                        close = read.up_close[ci]
                        if close.mismatches > budget:
                            continue
                        for fi in range(len(read.up_far)):
                            if read.used:
                                break
                            far = read.up_far[fi]
                            if far.mismatches > budget:
                                continue
                            if far.mismatches + close.mismatches > budget:
                                continue
                            if far.direction != PLUS:
                                continue
                            if not (far.length_str + close.length_str
                                    == read.read_length
                                    and far.abs_loc
                                    > close.abs_loc + min_inv):
                                continue
                            read.left = (close.abs_loc + 1) - close.length_str
                            read.right = (far.abs_loc - far.length_str
                                          + read.read_length)
                            read.bp = close.length_str - 1
                            read.indel_size = far.abs_loc - close.abs_loc
                            read.nt_str = ""
                            read.nt_size = 0
                            read.bp_left = close.abs_loc + 1 - SPACER
                            read.bp_right = far.abs_loc - SPACER
                            left_most_inv(read, ctx)
                            _place_read(read, idx, ctx, boxes)
            elif read.up_far[-1].abs_loc + min_inv < read.up_close[0].abs_loc:
                for budget in range(read.max_snp_error + 1):
                    for ci in range(len(read.up_close)):
                        if read.used:
                            break
                        close = read.up_close[ci]
                        if close.mismatches > budget:
                            continue
                        for fi in range(len(read.up_far) - 1, -1, -1):
                            if read.used:
                                break
                            far = read.up_far[fi]
                            if far.mismatches > budget:
                                continue
                            if far.mismatches + close.mismatches > budget:
                                continue
                            if far.direction != PLUS:
                                continue
                            if not (far.length_str + close.length_str
                                    == read.read_length
                                    and far.abs_loc + min_inv
                                    < close.abs_loc):
                                continue
                            read.right = (close.abs_loc - close.length_str
                                          + read.read_length)
                            read.left = far.abs_loc - far.length_str + 1
                            read.bp = far.length_str - 1
                            read.indel_size = close.abs_loc - far.abs_loc
                            read.nt_str = ""
                            read.nt_size = 0
                            read.bp_right = close.abs_loc - SPACER
                            read.bp_left = (far.abs_loc + 1) - SPACER
                            left_most_inv(read, ctx)
                            _place_read(read, idx, ctx, boxes)
        elif read.matched_d == MINUS:
            if read.up_close[-1].abs_loc > read.up_far[0].abs_loc + min_inv:
                for budget in range(read.max_snp_error + 1):
                    for ci in range(len(read.up_close) - 1, -1, -1):
                        if read.used:
                            break
                        close = read.up_close[ci]
                        if close.mismatches > budget:
                            continue
                        for fi in range(len(read.up_far)):
                            if read.used:
                                break
                            far = read.up_far[fi]
                            if far.mismatches > budget:
                                continue
                            if far.mismatches + close.mismatches > budget:
                                continue
                            if far.direction != MINUS:
                                continue
                            if not (close.length_str + far.length_str
                                    == read.read_length
                                    and close.abs_loc
                                    > far.abs_loc + min_inv):
                                continue
                            read.left = (far.abs_loc + far.length_str
                                         - read.read_length)
                            read.right = (close.abs_loc + close.length_str
                                          - 1)
                            read.bp = far.length_str - 1
                            read.indel_size = close.abs_loc - far.abs_loc
                            read.nt_str = ""
                            read.nt_size = 0
                            read.bp_left = far.abs_loc - SPACER
                            read.bp_right = close.abs_loc - 1 - SPACER
                            left_most_inv(read, ctx)
                            place_no_transgress(read, idx)
            elif read.up_close[0].abs_loc + min_inv < read.up_far[-1].abs_loc:
                for budget in range(read.max_snp_error + 1):
                    for ci in range(len(read.up_close)):
                        if read.used:
                            break
                        close = read.up_close[ci]
                        if close.mismatches > budget:
                            continue
                        for fi in range(len(read.up_far) - 1, -1, -1):
                            if read.used:
                                break
                            far = read.up_far[fi]
                            if far.mismatches > budget:
                                continue
                            if far.mismatches + close.mismatches > budget:
                                continue
                            if far.direction != MINUS:
                                continue
                            if not (close.length_str + far.length_str
                                    == read.read_length
                                    and close.abs_loc + min_inv
                                    < far.abs_loc):
                                continue
                            read.right = far.abs_loc + far.length_str - 1
                            read.left = (close.abs_loc + close.length_str
                                         - read.read_length)
                            read.bp = close.length_str - 1
                            read.indel_size = far.abs_loc - close.abs_loc
                            read.nt_str = ""
                            read.nt_size = 0
                            read.bp_left = close.abs_loc - SPACER
                            read.bp_right = far.abs_loc - 1 - SPACER
                            left_most_inv(read, ctx)
                            place_no_transgress(read, idx)


def search_inversions_nt(reads: List[SplitRead], ctx: WindowContext,
                         boxes: List[List[int]],
                         settings: Settings) -> None:
    """Reference: searchInversionsNT (search_inversions_nt.cpp:30-200)."""
    min_inv = settings.min_inversion_size
    mnmb = settings.min_num_matched_bases
    for idx, read in enumerate(reads):
        if read.used or not read.up_far \
                or read.frag_name != read.far_frag_name:
            continue
        close = read.up_close[-1]
        far = read.up_far[-1]
        if far.mismatches + close.mismatches > int(
                1 + settings.seq_error_rate
                * (far.length_str + close.length_str)):
            continue
        if not (read.up_close[0].strand != read.up_far[0].strand
                and read.up_close[0].direction == read.up_far[0].direction):
            continue
        lens = far.length_str + close.length_str
        if read.matched_d == PLUS and far.direction == PLUS:
            if (lens < read.read_length
                    and far.abs_loc > close.abs_loc + min_inv
                    and lens >= mnmb):
                read.left = (close.abs_loc + 1) - close.length_str
                read.right = (far.abs_loc - far.length_str
                              + read.read_length)
                read.bp = close.length_str - 1
                read.indel_size = far.abs_loc - close.abs_loc
                read.nt_size = read.read_length - lens
                read.nt_str = revcomp_str(read.seq)[
                    read.bp + 1: read.bp + 1 + read.nt_size]
                read.bp_left = close.abs_loc + 1 - SPACER
                read.bp_right = far.abs_loc - SPACER
                _place_read(read, idx, ctx, boxes)
            if (lens < read.read_length
                    and far.abs_loc + min_inv < close.abs_loc
                    and lens >= mnmb and not read.used):
                read.right = (close.abs_loc - close.length_str
                              + read.read_length)
                read.left = far.abs_loc - far.length_str + 1
                read.bp = far.length_str - 1
                read.indel_size = close.abs_loc - far.abs_loc
                read.nt_size = read.read_length - lens
                read.nt_str = read.seq[read.bp + 1:
                                       read.bp + 1 + read.nt_size]
                read.bp_right = close.abs_loc - SPACER
                read.bp_left = (far.abs_loc + 1) - SPACER
                _place_read(read, idx, ctx, boxes)
        elif read.matched_d == MINUS and far.direction == MINUS:
            if (lens < read.read_length
                    and close.abs_loc > far.abs_loc + min_inv
                    and lens >= mnmb):
                read.left = (far.abs_loc + far.length_str
                             - read.read_length)
                read.right = close.abs_loc + close.length_str - 1
                read.bp = far.length_str - 1
                read.indel_size = close.abs_loc - far.abs_loc
                read.nt_size = read.read_length - lens
                read.nt_str = read.seq[read.bp + 1:
                                       read.bp + 1 + read.nt_size]
                read.bp_left = far.abs_loc - SPACER
                read.bp_right = close.abs_loc - 1 - SPACER
                _place_read(read, idx, ctx, boxes)
            if (lens < read.read_length
                    and close.abs_loc + min_inv < far.abs_loc
                    and lens >= mnmb and not read.used):
                read.right = far.abs_loc + far.length_str - 1
                read.left = (close.abs_loc + close.length_str
                             - read.read_length)
                read.bp = close.length_str - 1
                read.indel_size = far.abs_loc - close.abs_loc
                read.nt_size = read.read_length - lens
                read.nt_str = revcomp_str(read.seq)[
                    read.bp + 1: read.bp + 1 + read.nt_size]
                read.bp_left = close.abs_loc - SPACER
                read.bp_right = far.abs_loc - 1 - SPACER
                _place_read(read, idx, ctx, boxes)


def search_indels_nt(reads: List[SplitRead], ctx: WindowContext,
                     boxes: List[List[int]], settings: Settings) -> None:
    """Deletions with non-template insertion (DI / RPL).

    Reference: searchIndels, search_deletions_nt.cpp:27-166 — only the
    last (longest) close and far anchors are considered, with a
    length-scaled mismatch ceiling.
    """
    for idx, read in enumerate(reads):
        if read.used or not read.up_far \
                or read.frag_name != read.far_frag_name:
            continue
        close = read.up_close[-1]
        far = read.up_far[-1]
        if far.mismatches + close.mismatches > int(
                1 + settings.seq_error_rate
                * (far.length_str + close.length_str)):
            continue
        if read.matched_d == PLUS:
            if far.direction != MINUS:
                continue
            if not (far.length_str + close.length_str < read.read_length
                    and far.length_str + close.length_str
                    >= settings.min_num_matched_bases
                    and far.abs_loc > close.abs_loc + 1):
                continue
            read.left = close.abs_loc - close.length_str + 1
            read.right = far.abs_loc + far.length_str - 1
            read.bp = close.length_str - 1
            read.nt_size = (read.read_length - far.length_str
                            - close.length_str)
            read.nt_str = revcomp_str(read.seq)[
                read.bp + 1: read.bp + 1 + read.nt_size]
            read.indel_size = ((read.right - read.left) + read.nt_size
                               - (read.read_length - 1))
            read.bp_left = close.abs_loc - SPACER
            read.bp_right = far.abs_loc - SPACER
        elif read.matched_d == MINUS:
            if far.direction != PLUS:
                continue
            if not (close.length_str + far.length_str < read.read_length
                    and close.length_str + far.length_str
                    >= settings.min_num_matched_bases
                    and close.abs_loc > far.abs_loc + 1):
                continue
            read.left = far.abs_loc - far.length_str + 1
            read.right = close.abs_loc + close.length_str - 1
            read.bp = far.length_str - 1
            read.nt_size = (read.read_length - close.length_str
                            - far.length_str)
            read.nt_str = read.seq[read.bp + 1: read.bp + 1 + read.nt_size]
            read.indel_size = ((read.right - read.left)
                               - (read.read_length - 1) + read.nt_size)
            read.bp_left = far.abs_loc - SPACER
            read.bp_right = close.abs_loc - SPACER
        else:
            continue
        _place_read(read, idx, ctx, boxes)
