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
