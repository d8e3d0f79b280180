"""End-to-end golden tests: our pipeline vs the compiled reference binary.

Builds the reference pindel (tools/build_reference_oracle.sh, htslib stub)
and compares report files bit-for-bit on simulated scenes.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_fai import make_fai  # noqa: E402

ORACLE = "/tmp/pindel_oracle/pindel"


@pytest.fixture(scope="session")
def oracle():
    if not os.path.exists("/root/reference/src/pindel.cpp"):
        pytest.skip("reference tree not available")
    r = subprocess.run([os.path.join(REPO, "tools",
                                     "build_reference_oracle.sh")],
                       capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[-500:]}")
    return ORACLE


def run_scene(tmp_path, oracle, seed, backend="numpy", extra=(), **scene_kw):
    from pindel_tpu.testing.simulate import standard_scene, write_fasta

    d = str(tmp_path)
    ref, events, reads = standard_scene(seed=seed, **scene_kw)
    fa = os.path.join(d, "ref.fa")
    write_fasta(fa, [("chrT", ref)])
    make_fai(fa)
    reads_txt = os.path.join(d, "reads.txt")
    reads.write(reads_txt)

    r = subprocess.run([oracle, "-f", fa, "-p", reads_txt,
                        "-o", os.path.join(d, "gold"), "-c", "ALL", "-s",
                        *extra],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:]

    from pindel_tpu.__main__ import main
    from pindel_tpu.profiling import g_fallback
    g_fallback.reset()
    assert main(["-f", fa, "-p", reads_txt,
                 "-o", os.path.join(d, "ours"), "-s",
                 "--backend", backend, *extra]) == 0
    if backend == "fused":
        # the fused decode assumes ~all chains are uniform; a scene shape
        # that breaks uniformity is a silent perf cliff (every such read
        # re-runs on the host oracle), so gate the measured ratio
        assert g_fallback.ratio() <= 0.01, (
            f"fused fallback ratio {g_fallback.ratio():.2%} "
            f"({g_fallback.fallback}/{g_fallback.total})")
    return d, events


def assert_identical(d, suffixes):
    for suf in suffixes:
        gold = open(os.path.join(d, f"gold_{suf}")).read()
        ours = open(os.path.join(d, f"ours_{suf}")).read()
        assert ours == gold, (
            f"_{suf} differs:\n"
            + "\n".join(_first_diff(gold, ours)))


def _first_diff(gold, ours):
    g, o = gold.splitlines(), ours.splitlines()
    for i, (a, b) in enumerate(zip(g, o)):
        if a != b:
            return [f"line {i}", f"gold: {a[:200]}", f"ours: {b[:200]}"]
    return [f"length differs: gold {len(g)} vs ours {len(o)} lines"]


@pytest.mark.parametrize("backend", ["numpy", "fused"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_d_si_reports_match_reference(tmp_path, oracle, seed, backend):
    d, _ = run_scene(tmp_path, oracle, seed, backend=backend)
    assert_identical(d, ["CloseEndMapped", "D", "SI", "TD", "INV"])
    # scenes must actually produce events
    assert "ChrID" in open(os.path.join(d, "gold_D")).read()


@pytest.mark.parametrize("backend", ["numpy", "fused"])
@pytest.mark.parametrize("seed", [10, 11])
def test_inv_td_heavy_scene(tmp_path, oracle, seed, backend):
    d, _ = run_scene(tmp_path, oracle, seed, backend=backend,
                     kinds=["INV", "TD", "INV", "TD", "INV", "TD", "DI"],
                     chrom_len=80_000, reads_per_event=10)
    assert_identical(d, ["CloseEndMapped", "D", "SI", "TD", "INV"])
    assert "ChrID" in open(os.path.join(d, "gold_INV")).read()
    assert "ChrID" in open(os.path.join(d, "gold_TD")).read()


@pytest.mark.parametrize("backend", ["numpy", "fused"])
@pytest.mark.parametrize("seed", [20, 21])
def test_li_scene(tmp_path, oracle, seed, backend):
    d, _ = run_scene(tmp_path, oracle, seed, extra=["-l"], backend=backend,
                     kinds=["LI", "DEL", "LI", "SI", "LI"],
                     chrom_len=60_000, reads_per_event=10)
    assert_identical(d, ["CloseEndMapped", "D", "SI", "TD", "INV",
                         "LI", "BP"])
    assert "\tLI\t" in open(os.path.join(d, "gold_LI")).read()


def test_deletion_only_scene_jax_backend(tmp_path, oracle):
    d, _ = run_scene(tmp_path, oracle, 7, backend="jax",
                     kinds=["DEL", "SI", "DEL"], chrom_len=30_000,
                     reads_per_event=6, n_noise=4)
    assert_identical(d, ["CloseEndMapped", "D", "SI"])
