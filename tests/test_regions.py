"""Golden tests for -c / -j / -J region selection vs the reference."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_fai import make_fai  # noqa: E402
from test_golden_vs_reference import _first_diff, oracle  # noqa: F401,E402


def _scene(tmp_path, seed=1):
    from pindel_tpu.testing.simulate import standard_scene, write_fasta
    d = str(tmp_path)
    ref, events, reads = standard_scene(seed=seed, chrom_len=60_000)
    fa = os.path.join(d, "ref.fa")
    write_fasta(fa, [("chrT", ref)])
    make_fai(fa)
    txt = os.path.join(d, "reads.txt")
    reads.write(txt)
    return d, fa, txt


def _run_both(d, fa, txt, extra, backend="numpy"):
    r = subprocess.run(["/tmp/pindel_oracle/pindel", "-f", fa, "-p", txt,
                        "-o", os.path.join(d, "gold"), "-s", *extra],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-1500:]
    from pindel_tpu.__main__ import main
    assert main(["-f", fa, "-p", txt, "-o", os.path.join(d, "ours"),
                 "-s", "--backend", backend, *extra]) == 0
    for suf in ("CloseEndMapped", "D", "SI", "TD", "INV"):
        gold = open(os.path.join(d, f"gold_{suf}")).read()
        ours = open(os.path.join(d, f"ours_{suf}")).read()
        assert ours == gold, (f"_{suf} differs with {extra}:\n"
                              + "\n".join(_first_diff(gold, ours)))
    return open(os.path.join(d, "gold_D")).read()


def test_region_with_coordinates(tmp_path, oracle):
    d, fa, txt = _scene(tmp_path)
    gold = _run_both(d, fa, txt, ["-c", "chrT:1000-30000"])
    assert "ChrID" in gold


def test_region_chromosome_only(tmp_path, oracle):
    d, fa, txt = _scene(tmp_path)
    _run_both(d, fa, txt, ["-c", "chrT"])


def test_include_bed(tmp_path, oracle):
    d, fa, txt = _scene(tmp_path)
    bed = os.path.join(d, "inc.bed")
    with open(bed, "w") as fh:
        fh.write("chrT\t1\t25000\nchrT\t30000\t59000\n")
    gold = _run_both(d, fa, txt, ["-j", bed])
    assert "ChrID" in gold


def test_exclude_bed(tmp_path, oracle):
    d, fa, txt = _scene(tmp_path)
    bed = os.path.join(d, "exc.bed")
    with open(bed, "w") as fh:
        fh.write("chrT\t20000\t32000\n")
    _run_both(d, fa, txt, ["-J", bed])


@pytest.mark.parametrize("backend", ["numpy", "fused"])
def test_include_and_exclude_bed(tmp_path, oracle, backend):
    d, fa, txt = _scene(tmp_path)
    inc = os.path.join(d, "inc.bed")
    with open(inc, "w") as fh:
        # overlapping + reversed-coordinate records exercise the cleanup
        fh.write("chrT\t1\t30000\nchrT\t25000\t59000\nchrT\t40000\t35000\n")
    exc = os.path.join(d, "exc.bed")
    with open(exc, "w") as fh:
        fh.write("chrT\t10000\t12000\nchrT\t58000\t59500\n")
    _run_both(d, fa, txt, ["-j", inc, "-J", exc],
              backend=backend)


def test_clean_up_bed_unit():
    from pindel_tpu.regions import Fai, clean_up_bed
    fai = Fai(["c1", "c2"], [1000, 500])
    include = [("c1", 1, 1000), ("c2", 1, 500)]
    # no excludes: untouched (reference early-return)
    assert clean_up_bed(include, [], fai) == include
    # full exclusion of c2, split of c1
    out = clean_up_bed(include, [("c1", 200, 300), ("c2", 1, 500)], fai)
    assert ("c1", 1, 200) in out and ("c1", 300, 1000) in out
    assert all(rec[0] != "c2" for rec in out)
