"""JAX engine must match the NumPy oracle backend bit-for-bit."""
import numpy as np
import pytest

from pindel_tpu.config import Settings
from pindel_tpu.ops.engine_jax import JaxBackend
from pindel_tpu.search import Searcher
from test_search_semantics import make_genome, sample_reads, ups_key


def run_pipeline(settings, chrom, reads, backend=None):
    searcher = Searcher(settings, backend=backend)
    searcher.map_close_ends(chrom, reads)
    kept = searcher.finalize_close_ends(reads)
    searcher.search_far_ends(chrom, kept)
    return kept


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_jax_engine_matches_numpy(seed):
    rng = np.random.default_rng(seed + 100)
    settings = Settings()
    g = make_genome(rng)
    chrom = g.chromosomes[0]
    reads_np = sample_reads(rng, chrom, n_reads=50)
    import copy
    reads_jx = copy.deepcopy(reads_np)

    kept_np = run_pipeline(settings, chrom, reads_np)
    jb = JaxBackend(settings, settings.max_mismatch(), chrom.seq)
    kept_jx = run_pipeline(settings, chrom, reads_jx, backend=jb)

    assert len(kept_np) == len(kept_jx)
    n_far = 0
    for a, b in zip(kept_np, kept_jx):
        assert a.name == b.name
        assert a.seq == b.seq, a.name
        assert ups_key(a.up_close) == ups_key(b.up_close), a.name
        assert ups_key(a.up_far) == ups_key(b.up_far), a.name
        assert a.close_end_mismatch == b.close_end_mismatch
        assert a.far_end_mismatch == b.far_end_mismatch
        n_far += bool(a.up_far)
    assert n_far > 0


@pytest.mark.parametrize("seed", [7, 8])
def test_fused_backend_legacy_run_bd_windows(seed):
    """The fused backend's legacy `run` path (BreakDancer windows, odd
    shapes) must match the NumPy oracle: multi-region far-end lanes where
    the candidate window was supplied externally rather than by the
    geometric ladder (engine_fused delegates to the contained JaxBackend,
    engine_fused.py FusedJaxBackend.run)."""
    from pindel_tpu.ops.engine_fused import FusedJaxBackend
    from pindel_tpu.search import NumpyBackend, far_end_lanes

    rng = np.random.default_rng(seed + 500)
    settings = Settings()
    g = make_genome(rng)
    chrom = g.chromosomes[0]
    reads = sample_reads(rng, chrom, n_reads=40)

    searcher = Searcher(settings)
    searcher.map_close_ends(chrom, reads)
    kept = searcher.finalize_close_ends(reads)
    assert kept

    # BD-style candidate windows around each read's close anchor, with
    # deliberately odd, non-bucket-aligned sizes and two regions per read
    batch_lanes = []
    budgets = []
    for r in kept:
        c = r.last_abs_loc_close_end()
        regs = [(chrom, c - 211, c + 187), (chrom, c + 301, c + 1007)]
        batch_lanes.append(far_end_lanes(r, regs))
        budgets.append(searcher.budget(r))

    fused = FusedJaxBackend(settings, settings.max_mismatch(), chrom.seq,
                            chrom_name=chrom.name)
    got = fused.run(batch_lanes, 10, [b[0] for b in budgets],
                    [b[1] for b in budgets])
    exp = NumpyBackend(settings, settings.max_mismatch()).run(
        batch_lanes, 10, [b[0] for b in budgets],
        [b[1] for b in budgets])
    n_hits = 0
    for (ups_g, mm_g), (ups_e, mm_e) in zip(got, exp):
        assert ups_key(ups_g) == ups_key(ups_e)
        if ups_e:
            assert mm_g == mm_e
            n_hits += 1
    assert n_hits > 0


def test_fused_cross_chromosome_far_fallback():
    """Far-end candidate regions on a chromosome the device backend is
    not loaded with must route through the exact-semantics NumPy
    fallback (search.py Searcher._far_round) and still find far ends."""
    from pindel_tpu.ops.engine_fused import FusedJaxBackend

    rng = np.random.default_rng(901)
    g = make_genome(rng, name="chrA")
    seqB = "".join(rng.choice(list("ACGT"), size=6000))
    chromB = g.add("chrB", seqB)
    chromA = g.chromosomes[0]
    settings = Settings()
    reads = sample_reads(rng, chromA, n_reads=20)

    fused = FusedJaxBackend(settings, settings.max_mismatch(), chromA.seq,
                            chrom_name=chromA.name)
    searcher = Searcher(settings, backend=fused)
    searcher.map_close_ends(chromA, reads)
    kept = searcher.finalize_close_ends(reads)
    assert kept

    # oracle result for the same BD regions (cross-chromosome windows)
    import copy
    kept_oracle = copy.deepcopy(kept)

    def bd_regions_for(chrom_obj):
        def f(read):
            c = read.last_abs_loc_close_end()
            return [(chrom_obj, c - 300, c + 300),
                    (chromB, 100_500, 101_500)]
        return f

    searcher.search_far_ends(chromA, kept,
                             bd_regions=bd_regions_for(chromA))
    oracle_searcher = Searcher(settings)
    oracle_searcher.search_far_ends(chromA, kept_oracle,
                                    bd_regions=bd_regions_for(chromA))
    n_far = 0
    for a, b in zip(kept, kept_oracle):
        assert ups_key(a.up_far) == ups_key(b.up_far), a.name
        n_far += bool(a.up_far)
    assert n_far > 0
