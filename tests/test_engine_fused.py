"""Fused engine must match the NumPy oracle backend bit-for-bit."""
import copy

import numpy as np
import pytest

from pindel_tpu.config import Settings
from pindel_tpu.ops.engine_fused import FusedJaxBackend
from pindel_tpu.search import Searcher
from test_search_semantics import make_genome, sample_reads, ups_key


def run_pipeline(settings, chrom, reads, backend=None):
    searcher = Searcher(settings, backend=backend)
    searcher.map_close_ends(chrom, reads)
    kept = searcher.finalize_close_ends(reads)
    searcher.search_far_ends(chrom, kept)
    return kept


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_fused_engine_matches_numpy(seed):
    rng = np.random.default_rng(seed + 100)
    settings = Settings()
    g = make_genome(rng)
    chrom = g.chromosomes[0]
    reads_np = sample_reads(rng, chrom, n_reads=60)
    reads_fx = copy.deepcopy(reads_np)

    kept_np = run_pipeline(settings, chrom, reads_np)
    fb = FusedJaxBackend(settings, settings.max_mismatch(), chrom.seq,
                         chrom_name=chrom.name)
    kept_fx = run_pipeline(settings, chrom, reads_fx, backend=fb)

    assert len(kept_np) == len(kept_fx)
    n_far = 0
    for a, b in zip(kept_np, kept_fx):
        assert a.name == b.name
        assert a.seq == b.seq, a.name
        assert ups_key(a.up_close) == ups_key(b.up_close), a.name
        assert ups_key(a.up_far) == ups_key(b.up_far), a.name
        assert a.close_end_mismatch == b.close_end_mismatch, a.name
        assert a.far_end_mismatch == b.far_end_mismatch, a.name
        assert a.max_snp_error == b.max_snp_error
        n_far += bool(a.up_far)
    assert n_far > 0


@pytest.mark.parametrize("max_range_index", [0, 1, 3])
def test_fused_engine_range_index(max_range_index):
    """-x changes the escalation round count; fused must track it."""
    rng = np.random.default_rng(7)
    settings = Settings()
    settings.max_range_index = max_range_index
    g = make_genome(rng)
    chrom = g.chromosomes[0]
    reads_np = sample_reads(rng, chrom, n_reads=40)
    reads_fx = copy.deepcopy(reads_np)

    kept_np = run_pipeline(settings, chrom, reads_np)
    fb = FusedJaxBackend(settings, settings.max_mismatch(), chrom.seq,
                         chrom_name=chrom.name)
    kept_fx = run_pipeline(settings, chrom, reads_fx, backend=fb)
    for a, b in zip(kept_np, kept_fx):
        assert ups_key(a.up_close) == ups_key(b.up_close), a.name
        assert ups_key(a.up_far) == ups_key(b.up_far), a.name


def test_fused_engine_edge_positions():
    """Reads anchored at chromosome edges (window clamping paths)."""
    rng = np.random.default_rng(11)
    settings = Settings()
    g = make_genome(rng, length=3000)
    chrom = g.chromosomes[0]
    reads = sample_reads(rng, chrom, n_reads=20)
    for i, r in enumerate(reads):
        if i % 3 == 0:
            r.matched_rel_pos = i          # hard against the left edge
        elif i % 3 == 1:
            r.matched_rel_pos = chrom.biol_size - 1 - i
    reads_fx = copy.deepcopy(reads)
    kept_np = run_pipeline(settings, chrom, reads)
    fb = FusedJaxBackend(settings, settings.max_mismatch(), chrom.seq,
                         chrom_name=chrom.name)
    kept_fx = run_pipeline(settings, chrom, reads_fx, backend=fb)
    assert len(kept_np) == len(kept_fx)
    for a, b in zip(kept_np, kept_fx):
        assert a.seq == b.seq
        assert ups_key(a.up_close) == ups_key(b.up_close), a.name
        assert ups_key(a.up_far) == ups_key(b.up_far), a.name
