#!/usr/bin/env python
"""Write a samtools-compatible .fai index for a FASTA file.

Format per sequence: name, length, offset of first base, bases per line,
bytes per line (incl. newline).
"""
import sys


def make_fai(fa_path: str, out_path: str = None) -> str:
    out_path = out_path or fa_path + ".fai"
    rows = []
    with open(fa_path, "rb") as fh:
        name = None
        length = 0
        offset = 0
        linebases = 0
        linewidth = 0
        pos = 0
        for raw in fh:
            line = raw.rstrip(b"\r\n")
            if raw.startswith(b">"):
                if name is not None:
                    rows.append((name, length, offset, linebases, linewidth))
                name = line[1:].split()[0].decode()
                length = 0
                offset = pos + len(raw)
                linebases = 0
                linewidth = 0
            elif line:
                if linebases == 0:
                    linebases = len(line)
                    linewidth = len(raw)
                length += len(line)
            pos += len(raw)
        if name is not None:
            rows.append((name, length, offset, linebases, linewidth))
    with open(out_path, "w") as out:
        for r in rows:
            out.write("\t".join(str(x) for x in r) + "\n")
    return out_path


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(make_fai(p))
