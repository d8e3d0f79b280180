"""The dp×wp-sharded mesh backend must match the NumPy oracle exactly."""
import copy

import numpy as np
import pytest

from pindel_tpu.config import Settings
from test_search_semantics import make_genome, sample_reads, ups_key


@pytest.mark.parametrize("dp,wp", [(2, 4), (1, 8), (4, 2)])
def test_sharded_backend_matches_numpy(dp, wp):
    import jax
    if len(jax.devices()) < dp * wp:
        pytest.skip("need 8 virtual devices")
    from pindel_tpu.parallel.mesh import Mesh, ShardedJaxBackend
    from pindel_tpu.search import Searcher

    rng = np.random.default_rng(2024 + dp)
    settings = Settings()
    g = make_genome(rng)
    chrom = g.chromosomes[0]
    reads_np = sample_reads(rng, chrom, n_reads=40)
    reads_sh = copy.deepcopy(reads_np)

    def run(reads, backend=None):
        sr = Searcher(settings, backend=backend)
        sr.map_close_ends(chrom, reads)
        kept = sr.finalize_close_ends(reads)
        sr.search_far_ends(chrom, kept)
        return kept

    kept_np = run(reads_np)

    devs = np.array(jax.devices()[:dp * wp]).reshape(dp, wp)
    mesh = Mesh(devs, ("dp", "wp"))
    backend = ShardedJaxBackend(settings, settings.max_mismatch(),
                                chrom.seq, mesh)
    kept_sh = run(reads_sh, backend=backend)

    assert len(kept_np) == len(kept_sh)
    n_far = 0
    for a, b in zip(kept_np, kept_sh):
        assert a.name == b.name
        assert a.seq == b.seq, a.name
        assert ups_key(a.up_close) == ups_key(b.up_close), a.name
        assert ups_key(a.up_far) == ups_key(b.up_far), a.name
        n_far += bool(a.up_far)
    assert n_far > 0
