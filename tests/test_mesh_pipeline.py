"""End-to-end golden tests on the dp-sharded mesh backend.

Runs the FULL pipeline (windows -> fused sharded search -> detectors ->
reports) on the 8-device virtual CPU mesh and compares byte-identical
against the compiled reference — this is the multi-chip execution path,
not a kernel smoke test.
"""
import os

import jax
import pytest

from test_golden_vs_reference import assert_identical, oracle, run_scene  # noqa: F401,E402


def test_mesh_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("seed", [0, 11])
def test_mesh_backend_golden(tmp_path, oracle, seed):
    d, _ = run_scene(tmp_path, oracle, seed, backend="mesh",
                     kinds=["DEL", "SI", "DI", "INV", "TD"],
                     chrom_len=60_000, reads_per_event=10, n_noise=16)
    assert_identical(d, ["CloseEndMapped", "D", "SI", "TD", "INV"])
    assert "ChrID" in open(os.path.join(d, "gold_D")).read()


def test_mesh_matches_fused_backend(tmp_path, oracle):
    """Sharded and single-device fused paths agree bit-for-bit."""
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    da, _ = run_scene(tmp_path / "a", oracle, 5, backend="mesh",
                      kinds=["DEL", "SI"], chrom_len=40_000,
                      reads_per_event=8)
    db, _ = run_scene(tmp_path / "b", oracle, 5, backend="fused",
                      kinds=["DEL", "SI"], chrom_len=40_000,
                      reads_per_event=8)
    for suf in ("D", "SI"):
        a = open(os.path.join(da, f"ours_{suf}")).read()
        b = open(os.path.join(db, f"ours_{suf}")).read()
        assert a == b
