"""-P pindel-config-file input: multi-sample pindel-text runs must be
byte-identical to the reference (per-sample support columns are where a
second sample bites).  Reference: readPindelConfigFile pindel.cpp:705-738,
per-window file loop reader.cpp:1469-1479."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_fai import make_fai  # noqa: E402

from test_golden_vs_reference import assert_identical, oracle  # noqa: F401,E402


def _two_sample_scene(tmp_path, seed):
    from pindel_tpu.testing.simulate import standard_scene, write_fasta
    d = str(tmp_path)
    ref, events, reads = standard_scene(
        seed=seed, chrom_len=50_000,
        kinds=["DEL", "SI", "DI", "DEL"], reads_per_event=12, n_noise=8)
    fa = os.path.join(d, "ref.fa")
    write_fasta(fa, [("chrT", ref)])
    make_fai(fa)
    # split reads across two samples: even records -> S1, odd -> S2
    from pindel_tpu.testing.simulate import SimReads
    sa, sb = SimReads([], [], []), SimReads([], [], [])
    for i, (n, s, m) in enumerate(zip(reads.names, reads.seqs, reads.metas)):
        tgt = sa if i % 2 == 0 else sb
        tag = "S1" if i % 2 == 0 else "S2"
        tgt.names.append(n)
        tgt.seqs.append(s)
        tgt.metas.append(m[:5] + (tag,))
    fa1 = os.path.join(d, "sample1.txt")
    fa2 = os.path.join(d, "sample2.txt")
    sa.write(fa1)
    sb.write(fa2)
    cfg = os.path.join(d, "pindel-config.txt")
    with open(cfg, "w") as fh:
        fh.write(f"{fa1}\n{fa2}   trailing comment ignored\n")
    return d, fa, cfg


@pytest.mark.parametrize("seed,backend", [(31, "numpy"), (32, "fused")])
def test_pindel_config_two_samples(tmp_path, oracle, seed, backend):
    d, fa, cfg = _two_sample_scene(tmp_path, seed)
    r = subprocess.run([oracle, "-f", fa, "-P", cfg,
                        "-o", os.path.join(d, "gold"), "-c", "ALL"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:]
    from pindel_tpu.__main__ import main
    assert main(["-f", fa, "-P", cfg, "-o", os.path.join(d, "ours"),
                 "--backend", backend]) == 0
    assert_identical(d, ["D", "SI", "TD", "INV"])
    gold_d = open(os.path.join(d, "gold_D")).read()
    assert "ChrID" in gold_d
    assert "S2" in gold_d          # second sample's column really appears


def test_pindel_config_missing_file(tmp_path):
    from pindel_tpu.pipeline import Pipeline
    from pindel_tpu.config import Settings
    from pindel_tpu.genome import Genome
    g = Genome()
    g.add("chrT", "ACGT" * 100)
    cfg = tmp_path / "cfg.txt"
    cfg.write_text("/does/not/exist.txt\n")
    pipe = Pipeline(Settings(), g)
    with pytest.raises(FileNotFoundError):
        pipe.load_pindel_config(str(cfg))
