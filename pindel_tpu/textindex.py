"""Streaming pindel-text intake: byte-offset index + per-window parse.

The in-RAM loader materializes every SplitRead up front — fine at demo
scale, the wrong shape for 30x WGS where the pindel-format read set is
tens of gigabytes.  This index keeps O(16 bytes/read): one chunked scan
records, per record, its anchor chromosome, position and byte offset;
per-window intake then seeks and parses ONLY the window's records.

The reference's memory strategy is to re-read the whole file every
window and drop out-of-window records (ReadInRead, reader.cpp:196-361,
with the g_maxPos early-exit) — same O(window) working set, O(file)
re-scan per window; the index replaces the re-scan with binary search.

gz inputs can't seek cheaply and fall back to the in-RAM loader.
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from pindel_tpu.reads import SplitRead, _read_pindel_batch

# a record's 3rd line: "±  chr  pos  ..." — name lines start with '@',
# sequence lines with a base letter, so the leading sign is unambiguous
_META_RE = re.compile(rb"^[+-][ \t]+(\S+)[ \t]+(\d+)", re.M)
_CHUNK = 16 << 20


class PindelTextIndex:
    """(chrom -> position-sorted (pos, file_id, offset)) over one or
    more plain-text pindel files (a -P config is a file list)."""

    def __init__(self, paths: List[str]):
        self.paths = list(paths)
        self._handles: List = [None] * len(self.paths)
        chrom_ids: Dict[bytes, int] = {}
        chrom_l: List[np.ndarray] = []
        pos_l: List[np.ndarray] = []
        off_l: List[np.ndarray] = []
        fid_l: List[np.ndarray] = []
        self.sizes = []
        for fid, path in enumerate(self.paths):
            c, p, o = self._scan(path, chrom_ids)
            chrom_l.append(c)
            pos_l.append(p)
            off_l.append(o)
            fid_l.append(np.full(c.shape, fid, np.int32))
            self.sizes.append(os.path.getsize(path))
        chrom = np.concatenate(chrom_l) if chrom_l else np.zeros(0, np.int32)
        pos = np.concatenate(pos_l) if pos_l else np.zeros(0, np.int64)
        off = np.concatenate(off_l) if off_l else np.zeros(0, np.int64)
        fid = np.concatenate(fid_l) if fid_l else np.zeros(0, np.int32)
        self.max_pos = int(pos.max()) if pos.size else 0
        self.n_records = int(pos.size)
        self._by_chrom: Dict[str, Tuple[np.ndarray, ...]] = {}
        names = {v: k.decode() for k, v in chrom_ids.items()}
        for cid, name in names.items():
            sel = np.flatnonzero(chrom == cid)
            order = np.argsort(pos[sel], kind="stable")
            sel = sel[order]
            self._by_chrom[name] = (pos[sel], fid[sel], off[sel])
        # per-file record-start offsets in file order, for record ends
        self._file_offsets = [np.sort(o) for o in off_l]

    @staticmethod
    def _scan(path: str, chrom_ids: Dict[bytes, int]):
        """One sequential pass: per record (3 lines), the meta line's
        (chrom, pos) plus the record's byte offset."""
        chroms: List[int] = []
        poss: List[int] = []
        offs: List[int] = []
        carry = b""
        base = 0            # file offset of carry[0]
        with open(path, "rb") as fh:
            while True:
                chunk = fh.read(_CHUNK)
                if not chunk:
                    break
                data = carry + chunk
                nl = np.flatnonzero(np.frombuffer(data, np.uint8) == 10)
                # cut at the last complete RECORD (3 lines), so every
                # block starts at a name line and holds whole records
                take = nl.size - (nl.size % 3)
                if take == 0:
                    carry = data
                    continue
                block_end = int(nl[take - 1]) + 1
                block = data[:block_end]
                carry = data[block_end:]
                starts = np.concatenate([[0], nl[:take - 1] + 1])
                rec_offs = starts[0::3] + base
                metas = list(_META_RE.finditer(block))
                if len(metas) != take // 3:
                    raise ValueError(
                        f"{path}: irregular pindel text (blank lines or "
                        "non-3-line records); streaming index unsupported")
                for m, ro in zip(metas, rec_offs.tolist()):
                    key = m.group(1)
                    cid = chrom_ids.get(key)
                    if cid is None:
                        cid = chrom_ids[key] = len(chrom_ids)
                    chroms.append(cid)
                    poss.append(int(m.group(2)))
                    offs.append(ro)
                base += block_end
        if carry.strip():
            raise ValueError(f"{path}: trailing partial record")
        return (np.asarray(chroms, np.int32), np.asarray(poss, np.int64),
                np.asarray(offs, np.int64))

    def _handle(self, fid: int):
        if self._handles[fid] is None:
            self._handles[fid] = open(self.paths[fid], "rb")
        return self._handles[fid]

    def close(self) -> None:
        for h in self._handles:
            if h is not None:
                h.close()
        self._handles = [None] * len(self.paths)

    def window_reads(self, chrom_name: str, start: int, end: int
                     ) -> List[SplitRead]:
        """Parse the records with start <= pos < end, in config-file
        order then file order (matching the in-RAM loader's restored
        global read order)."""
        entry = self._by_chrom.get(chrom_name)
        if entry is None:
            return []
        pos, fid, off = entry
        lo = np.searchsorted(pos, start, side="left")
        hi = np.searchsorted(pos, end, side="left")
        if lo == hi:
            return []
        sel_f = fid[lo:hi]
        sel_o = off[lo:hi]
        order = np.lexsort((sel_o, sel_f))
        out: List[SplitRead] = []
        for f in np.unique(sel_f[order]).tolist():
            offs = np.sort(sel_o[sel_f == f])
            out.extend(self._parse_records(int(f), offs))
        return out

    def _parse_records(self, fid: int, offs: np.ndarray) -> List[SplitRead]:
        """Read + parse the records at the given start offsets (sorted),
        coalescing adjacent records into single reads."""
        fo = self._file_offsets[fid]
        idx = np.searchsorted(fo, offs)
        nxt = np.where(idx + 1 < fo.size, fo[np.minimum(idx + 1,
                                                        fo.size - 1)],
                       self.sizes[fid])
        fh = self._handle(fid)
        lines: List[str] = []
        k = 0
        n = offs.size
        while k < n:
            j = k
            while j + 1 < n and offs[j + 1] == nxt[j]:
                j += 1
            fh.seek(int(offs[k]))
            blob = fh.read(int(nxt[j] - offs[k]))
            part = blob.decode("ascii").split("\n")
            if part and part[-1] == "":
                part.pop()
            lines.extend(part)
            k = j + 1
        if len(lines) % 3 != 0:
            raise ValueError("record framing error in streaming intake")
        return _read_pindel_batch(lines)
