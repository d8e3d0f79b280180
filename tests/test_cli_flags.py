"""Unary-flag value parity: the reference's bool flags optionally consume
a following token and disable when it starts with 'f'/'0' (readParameters,
fn_parameters.cpp:379-389) — so ``-r false`` / ``-t 0`` turn the
default-true inversion/TD detectors off.  Golden-compared against the
compiled reference."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_fai import make_fai  # noqa: E402

from test_golden_vs_reference import assert_identical, oracle  # noqa: F401,E402


def _scene(tmp_path, seed=77):
    from pindel_tpu.testing.simulate import standard_scene, write_fasta
    d = str(tmp_path)
    ref, events, reads = standard_scene(
        seed=seed, chrom_len=50_000,
        kinds=["DEL", "INV", "TD", "SI", "INV", "TD"],
        reads_per_event=12, n_noise=8)
    fa = os.path.join(d, "ref.fa")
    write_fasta(fa, [("chrT", ref)])
    make_fai(fa)
    txt = os.path.join(d, "reads.txt")
    reads.write(txt)
    return d, fa, txt


def test_disable_inv_td_matches_reference(tmp_path, oracle):
    d, fa, txt = _scene(tmp_path)
    r = subprocess.run([oracle, "-f", fa, "-p", txt,
                        "-o", os.path.join(d, "gold"), "-c", "ALL",
                        "-r", "false", "-t", "0"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:]
    from pindel_tpu.__main__ import main
    assert main(["-f", fa, "-p", txt, "-o", os.path.join(d, "ours"),
                 "-r", "false", "-t", "0", "--backend", "numpy"]) == 0
    assert_identical(d, ["D", "SI", "TD", "INV"])
    # the detectors really were off: no INV/TD calls despite planted events
    assert open(os.path.join(d, "gold_INV")).read() == ""
    assert open(os.path.join(d, "gold_TD")).read() == ""


def test_unary_true_tokens_match_reference(tmp_path, oracle):
    """A non-f/0 token after a unary flag still means true and is
    consumed (reference increments the index either way)."""
    d, fa, txt = _scene(tmp_path, seed=78)
    r = subprocess.run([oracle, "-f", fa, "-p", txt,
                        "-o", os.path.join(d, "gold"), "-c", "ALL",
                        "-r", "yes", "-t", "true"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:]
    from pindel_tpu.__main__ import main
    assert main(["-f", fa, "-p", txt, "-o", os.path.join(d, "ours"),
                 "-r", "yes", "-t", "true", "--backend", "numpy"]) == 0
    assert_identical(d, ["D", "SI", "TD", "INV"])
    assert open(os.path.join(d, "gold_INV")).read() != ""
