"""Somatic indel filter: byte-identical vs the reference Perl script
(somatic_filter/somatic_indelfilter.pl) run against the compiled
reference pindel2vcf."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_fai import make_fai  # noqa: E402

from test_golden_vs_reference import oracle  # noqa: E402,F401

PERL = "/root/reference/somatic_filter/somatic_indelfilter.pl"


@pytest.fixture()
def scene(tmp_path, oracle):  # noqa: F811
    from pindel_tpu.testing.simulate import standard_scene, write_fasta
    d = str(tmp_path)
    ref, events, reads = standard_scene(
        seed=5, kinds=["DEL", "SI", "DEL", "SI", "DEL"],
        chrom_len=60_000, reads_per_event=25, n_noise=10)
    # two samples: all event reads are "tumor", noise reads become the
    # "normal" sample (sorts first, as the filter requires)
    reads.metas = [(d_, ch, pos, mq, ins, "tumor")
                   for (d_, ch, pos, mq, ins, _) in reads.metas]
    reads.metas[-10:] = [(d_, ch, pos, mq, ins, "normal")
                         for (d_, ch, pos, mq, ins, _) in reads.metas[-10:]]
    fa = os.path.join(d, "ref.fa")
    write_fasta(fa, [("chrT", ref)])
    make_fai(fa)
    reads_txt = os.path.join(d, "reads.txt")
    reads.write(reads_txt)
    r = subprocess.run([oracle, "-f", fa, "-p", reads_txt,
                        "-o", os.path.join(d, "gold")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0
    head = os.path.join(d, "all.head")
    with open(head, "w") as out:
        for suf in ("_D", "_SI"):
            for line in open(os.path.join(d, "gold" + suf)):
                if "ChrID" in line:
                    out.write(line)
    assert os.path.getsize(head) > 0
    return d, fa, head


def _config(d, fa, head, out_name, p2v):
    cfg = os.path.join(d, f"cfg_{out_name}")
    with open(cfg, "w") as fh:
        fh.write(f"""indel.filter.input = {head}
indel.filter.vaf = 0.1
indel.filter.cov = 0
indel.filter.hom = 6
indel.filter.pindel2vcf = {p2v}
indel.filter.reference = {fa}
indel.filter.referencename = refT
indel.filter.referencedate = 20260818
indel.filter.output = {os.path.join(d, out_name)}
""")
    return cfg


def test_somatic_filter_matches_perl(scene):
    d, fa, head = scene
    gold_cfg = _config(d, fa, head, "gold.vcf", "/tmp/pindel_oracle/pindel2vcf")
    r = subprocess.run(["perl", PERL, gold_cfg], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    from pindel_tpu.somatic import main
    ours_cfg = _config(d, fa, head, "ours.vcf", "(in-process)")
    assert main([ours_cfg]) == 0
    gold = open(os.path.join(d, "gold.vcf")).read()
    ours = open(os.path.join(d, "ours.vcf")).read()
    # the reference date line embeds the run date, normalize it
    assert gold, "perl filter produced no VCF output"
    assert ours == gold
    assert "##fileformat" in ours


def test_filter_columns():
    from pindel_tpu.somatic import filter_summary_lines
    # 44-column line: normal clean (cols 34/36 zero), tumor supported
    cols = ["x"] * 44
    cols[1] = "D"
    cols[4] = "0"
    for i in (32, 33, 39, 40):
        cols[i] = "20"
    for i in (34, 36):
        cols[i] = "0"
    for i in (41, 43):
        cols[i] = "5"
    line = "\t".join(cols)
    assert filter_summary_lines([line], cov=20, vaf=0.1) == [line]
    # tumor VAF below threshold
    cols[41] = cols[43] = "1"
    assert filter_summary_lines(["\t".join(cols)], cov=20, vaf=0.5) == []
    # normal contamination kills it
    cols[41] = cols[43] = "5"
    cols[34] = "1"
    assert filter_summary_lines(["\t".join(cols)], cov=20, vaf=0.1) == []
