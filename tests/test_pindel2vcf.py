"""Golden tests: our pindel2vcf converter vs the compiled reference
converter, run on identical report files (which are themselves verified
bit-identical in test_golden_vs_reference)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from test_golden_vs_reference import oracle, run_scene  # noqa: F401,E402

VCF_ORACLE = "/tmp/pindel_oracle/pindel2vcf"


def _convert_both(d, prefix_args, extra=()):
    gold_vcf = os.path.join(d, "gold.vcf")
    ours_vcf = os.path.join(d, "ours.vcf")
    base = ["-r", os.path.join(d, "ref.fa"), "-R", "TESTREF",
            "-d", "20260818"]
    r = subprocess.run([VCF_ORACLE, *base, *prefix_args("gold"),
                        "-v", gold_vcf, *extra],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-500:]

    from pindel_tpu.pindel2vcf import main
    assert main([*base, *prefix_args("ours"), "-v", ours_vcf,
                 *extra]) == 0
    gold = open(gold_vcf).read()
    ours = open(ours_vcf).read()
    assert ours == gold, _diff(gold, ours)
    return gold


def _diff(gold, ours):
    g, o = gold.splitlines(), ours.splitlines()
    for i, (a, b) in enumerate(zip(g, o)):
        if a != b:
            return f"line {i}:\ngold: {a[:300]}\nours: {b[:300]}"
    return f"length: gold {len(g)} vs ours {len(o)} lines"


@pytest.mark.parametrize("seed", [0, 2])
def test_vcf_root_mode(tmp_path, oracle, seed):
    d, _ = run_scene(tmp_path, oracle, seed)
    gold = _convert_both(
        d, lambda p: ["-P", os.path.join(d, p)])
    assert "SVTYPE=DEL" in gold


def test_vcf_single_file_and_gatk(tmp_path, oracle):
    d, _ = run_scene(tmp_path, oracle, 11,
                     kinds=["INV", "TD", "INV", "TD", "INV", "TD", "DI"],
                     chrom_len=80_000, reads_per_event=10)
    gold = _convert_both(d, lambda p: ["-P", os.path.join(d, p)])
    assert "SVTYPE=INV" in gold and "SVTYPE=DUP:TANDEM" in gold
    # single-file -p mode on the _D report
    _convert_both(d, lambda p: ["-p", os.path.join(d, f"{p}_D")])
    # GATK-compatible mode exercises the equilength position workarounds
    gold = _convert_both(d, lambda p: ["-P", os.path.join(d, p)],
                         extra=["-G"])
    assert "0/1" in gold or "1/1" in gold or "0/0" in gold


def test_vcf_with_li(tmp_path, oracle):
    d, _ = run_scene(tmp_path, oracle, 20, extra=["-l"],
                     kinds=["LI", "DEL", "LI", "SI", "LI"],
                     chrom_len=60_000, reads_per_event=10)
    gold = _convert_both(d, lambda p: ["-P", os.path.join(d, p)])
    assert "<INS>" in gold
