"""Golden tests: our sam2pindel vs the compiled reference converter."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ORACLE = "/tmp/pindel_oracle/sam2pindel"


@pytest.fixture(scope="session")
def oracle():
    if not os.path.exists(ORACLE):
        r = subprocess.run([os.path.join(REPO, "tools",
                                         "build_reference_oracle.sh")],
                           capture_output=True, text=True, timeout=600)
        if r.returncode != 0 or not os.path.exists(ORACLE):
            pytest.skip("sam2pindel oracle unavailable")
    return ORACLE


def make_sam(rng) -> str:
    """SAM text covering all converter paths: headers, one-end-mapped,
    clipped/indel cigars, mate-unmapped skips, N-heavy skips, '=' MRNM,
    '*' fields, both strands."""
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    def seq(n):
        return bytes(bases[rng.integers(0, 4, size=n)]).decode()

    lines = ["@HD\tVN:1.6\tSO:coordinate",
             "@SQ\tSN:chr1\tLN:100000",
             "@PG\tID:test prog with spaces"]
    recs = []
    for i in range(40):
        s = seq(80)
        pos = int(rng.integers(1000, 90000))
        kind = i % 8
        if kind == 0:      # unmapped read, mapped forward mate -> report 1
            recs.append(f"r{i}\t69\tchr1\t{pos}\t0\t*\t=\t{pos}\t0\t{s}\t*")
        elif kind == 1:    # unmapped read, mate reverse -> report 1 '-'
            recs.append(f"r{i}\t101\tchr1\t{pos}\t0\t*\t=\t{pos}\t0\t{s}\t*"
                        f"\tRG:Z:x")
        elif kind == 2:    # soft-clipped -> report 2
            recs.append(f"r{i}\t97\tchr1\t{pos}\t37\t40M40S\t=\t{pos+200}"
                        f"\t280\t{s}\t*\tNM:i:3")
        elif kind == 3:    # indel cigar, mate reverse -> report 2 '-'
            recs.append(f"r{i}\t113\tchr1\t{pos}\t60\t30M5D50M\tchr1"
                        f"\t{pos-200}\t-280\t{s}\t*")
        elif kind == 4:    # clean 80M -> no report
            recs.append(f"r{i}\t99\tchr1\t{pos}\t60\t80M\t=\t{pos+200}"
                        f"\t280\t{s}\t*")
        elif kind == 5:    # mate unmapped -> skipped
            recs.append(f"r{i}\t73\tchr1\t{pos}\t60\t40M40S\t*\t0\t0"
                        f"\t{s}\t*")
        elif kind == 6:    # too many Ns -> report 0
            n_seq = ("N" * 20) + s[20:]
            recs.append(f"r{i}\t69\tchr1\t{pos}\t0\t*\t=\t{pos}\t0"
                        f"\t{n_seq}\t*")
        else:              # different mate chromosome name
            recs.append(f"r{i}\t69\tchr2\t{pos}\t11\t*\tchr1\t{pos+5}\t0"
                        f"\t{s}\t*")
    return "\n".join(lines + recs) + "\n"


@pytest.mark.parametrize("platform", ["Illumina-PairEnd",
                                      "Illumina-MatePair"])
@pytest.mark.parametrize("skip", [0, 2])
def test_sam2pindel_matches_oracle(tmp_path, oracle, platform, skip):
    rng = np.random.default_rng(5)
    sam = make_sam(rng)
    if skip:
        sam = "junk line one\njunk line two\n" + sam
    sam_path = tmp_path / "in.sam"
    sam_path.write_text(sam)
    gold = str(tmp_path / "gold.pindel")
    ours = str(tmp_path / "ours.pindel")
    r = subprocess.run([oracle, str(sam_path), gold, "300", "T1",
                        str(skip), platform],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stdout

    from pindel_tpu.sam2pindel import main
    assert main([str(sam_path), ours, "300", "T1", str(skip),
                 platform]) == 0
    gold_text = open(gold, errors="surrogateescape").read()
    ours_text = open(ours, errors="surrogateescape").read()
    assert ours_text == gold_text
    assert "@r0" in gold_text          # converter actually emitted records


def test_sam2pindel_stdin(tmp_path, oracle):
    rng = np.random.default_rng(6)
    sam = make_sam(rng)
    gold = str(tmp_path / "gold.pindel")
    ours = str(tmp_path / "ours.pindel")
    subprocess.run([oracle, "-", gold, "400", "S", "0",
                    "Illumina-PairEnd"], input=sam, text=True, timeout=60)
    subprocess.run([sys.executable, "-m", "pindel_tpu.sam2pindel", "-",
                    ours, "400", "S", "0", "Illumina-PairEnd"],
                   input=sam, text=True, timeout=60,
                   cwd=REPO)
    assert open(ours).read() == open(gold).read()
