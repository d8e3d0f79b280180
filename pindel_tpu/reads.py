"""Split-read records and Pindel-format text input.

Reference structures: ``SPLIT_READ`` (pindel.h:265-383), ``UniquePoint``
(pindel.h:137-158); text format reader ``PindelReadReader``
(pindel_read_reader.cpp:50-66): records of three lines ::

    @name
    SEQUENCE
    ±  chr  pos  MQ  insert_size  sample_tag
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional

import numpy as np

from pindel_tpu import dna

PLUS = "+"
MINUS = "-"
FORWARD = "+"
BACKWARD = "-"
SENSE = "+"
ANTISENSE = "-"


@dataclasses.dataclass
class UniquePoint:
    """A unique partial alignment anchor (reference pindel.h:137-158)."""

    chr_name: str
    length_str: int          # matched prefix/suffix length
    abs_loc: int             # padded-coordinate position of the anchor end
    direction: str           # FORWARD '+' / BACKWARD '-'
    strand: str              # SENSE '+' / ANTISENSE '-'
    mismatches: int


@dataclasses.dataclass
class SplitRead:
    """One unmapped-mate read plus its anchor metadata."""

    name: str = ""
    frag_name: str = ""           # anchor chromosome
    far_frag_name: str = ""
    matched_d: str = ""           # anchor strand '+'/'-'
    matched_rel_pos: int = 0      # anchor position (biological coords)
    ms: int = 0                   # anchor mapping quality
    insert_size: int = 0
    tag: str = ""                 # sample name
    seq: str = ""                 # UnmatchedSeq (may be RC-flipped in search)
    mapper_split: bool = False

    # close/far anchors, filled by the search
    up_close: List[UniquePoint] = dataclasses.field(default_factory=list)
    up_far: List[UniquePoint] = dataclasses.field(default_factory=list)

    # event fields, filled by detectors (reference SPLIT_READ members)
    used: bool = False
    unique_read: bool = False
    bp: int = 0
    left: int = 0
    right: int = 0
    bp_left: int = 0
    bp_right: int = 0
    indel_size: int = 0
    nt_str: str = ""
    nt_size: int = 0              # NOT derived from nt_str (reference quirk:
                                  # SI sets NT_str but leaves NT_size 0)
    matched_far_d: str = ""
    max_snp_error: int = 0        # g_maxMismatch[len], set by the searcher
    close_end_mismatch: int = 0
    far_end_mismatch: int = 0
    left_most_pos: int = 0
    read_group: str = ""
    sample_name_to_number: Optional[dict] = None

    def set_seq(self, seq: str) -> None:
        """setUnmatchedSeq: trim trailing non-alnum (pindel.cpp:142-159)."""
        while seq and not seq[-1].isalnum():
            seq = seq[:-1]
        self.seq = seq

    @property
    def read_length(self) -> int:
        return len(self.seq)

    def seq_codes(self) -> np.ndarray:
        return dna.encode(self.seq)

    # --- anchor helpers (reference pindel.cpp:475-518) ---
    def max_len_close(self) -> int:
        return self.up_close[-1].length_str if self.up_close else 0

    def max_len_far(self) -> int:
        return self.up_far[-1].length_str if self.up_far else 0

    def has_close_end(self) -> bool:
        return bool(self.up_close)

    def last_abs_loc_close_end(self) -> int:
        return self.up_close[-1].abs_loc

    def good_far_end_found(self) -> bool:
        return self.max_len_far() + self.max_len_close() >= len(self.seq)


def clean_unique_points(ups: List[UniquePoint]) -> List[UniquePoint]:
    """Keep only the anchor chain consistent with the longest match.

    Reference: CleanUniquePoints, pindel.cpp:2904-2941.
    """
    if not ups:
        return ups
    last = ups[-1]
    out = []
    if last.direction == FORWARD:
        terminal = last.abs_loc - last.length_str
        for up in ups:
            if (up.chr_name == last.chr_name and up.direction == last.direction
                    and up.strand == last.strand
                    and up.abs_loc - up.length_str == terminal):
                out.append(up)
    else:
        terminal = last.abs_loc + last.length_str
        for up in ups:
            if (up.chr_name == last.chr_name and up.direction == last.direction
                    and up.strand == last.strand
                    and up.abs_loc + up.length_str == terminal):
                out.append(up)
    return out


def read_pindel_file(path: str) -> Iterator[SplitRead]:
    """Iterate SplitReads from a Pindel text file (optionally .gz)."""
    opener = open
    if path.endswith(".gz"):
        import gzip
        opener = gzip.open  # type: ignore[assignment]
    with opener(path, "rt") as fh:
        while True:
            name = fh.readline()
            if not name:
                return
            name = name.rstrip("\n")
            if not name:
                continue
            seq = fh.readline().rstrip("\n")
            meta = fh.readline().split()
            read = SplitRead(name=name)
            read.set_seq(seq)
            if len(meta) >= 6:
                read.matched_d = meta[0]
                read.frag_name = meta[1]
                read.matched_rel_pos = int(meta[2])
                read.ms = int(meta[3])
                read.insert_size = int(meta[4])
                read.tag = meta[5]
            yield read
