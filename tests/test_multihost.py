"""Multi-host simulation: windows sharded across processes must produce
byte-identical reports to a single-process run (parallel/multihost.py).

The scene spans several windows (small -w) so both processes actually
search windows; workers run as real subprocesses exchanging searched
windows through the file spool — the local stand-in for DCN shipping of
anchor tables on a pod.
"""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_fai import make_fai  # noqa: E402

SUFFIXES = ("D", "SI", "TD", "INV", "LI", "BP", "CloseEndMapped",
            "INT_final")


def _scene(tmp_path, chrom_len=260_000, n_events=24):
    from pindel_tpu.testing.simulate import standard_scene, write_fasta
    kinds = ["DEL", "SI", "DI", "INV", "TD", "LI"] * (n_events // 6)
    ref, events, reads = standard_scene(
        seed=77, chrom_len=chrom_len, kinds=kinds,
        reads_per_event=8, n_noise=300, chrom="chrM")
    d = str(tmp_path)
    fa = os.path.join(d, "ref.fa")
    write_fasta(fa, [("chrM", ref)])
    make_fai(fa)
    txt = os.path.join(d, "reads.txt")
    reads.write(txt)
    return d, fa, txt


@pytest.mark.parametrize("hosts,backend", [
    (2, "numpy"),
    pytest.param(3, "fused", marks=pytest.mark.skipif(
        not os.environ.get("PINDEL_TPU_SLOW_TESTS"),
        reason="fused workers cold-compile XLA per subprocess (~10 min); "
               "set PINDEL_TPU_SLOW_TESTS=1 to include")),
])
def test_multihost_byte_identical(tmp_path, hosts, backend):
    d, fa, txt = _scene(tmp_path)
    from pindel_tpu.__main__ import main
    # -w 0.05 => 50 kb windows: ~6 windows over the scene
    base = ["-f", fa, "-p", txt, "-w", "0.05", "-l", "-k", "-s",
            "--backend", backend]
    assert main([*base, "-o", os.path.join(d, "single")]) == 0
    assert main([*base, "-o", os.path.join(d, "multi"),
                 "--hosts", str(hosts)]) == 0
    for suf in SUFFIXES:
        single = open(os.path.join(d, f"single_{suf}")).read()
        multi = open(os.path.join(d, f"multi_{suf}")).read()
        assert multi == single, f"_{suf} differs with --hosts {hosts}"
    assert open(os.path.join(d, "single_D")).read()   # scene nonempty


def test_multihost_spool_assignment():
    from pindel_tpu.parallel.multihost import WindowSpool
    sp = WindowSpool("/tmp", rank=1, num_hosts=3, worker=True)
    assert [w for w in range(9) if sp.mine(w)] == [1, 4, 7]
