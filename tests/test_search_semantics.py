"""Dense search reformulation must match the literal recursion bit-for-bit."""
import numpy as np
import pytest

import oracle_recursive as rec
from pindel_tpu import dna
from pindel_tpu.config import Settings
from pindel_tpu.genome import SPACER, Genome
from pindel_tpu.reads import SplitRead, clean_unique_points
from pindel_tpu.search import Searcher


def make_genome(rng, length=6000, name="chrT"):
    seq = "".join(rng.choice(list("ACGT"), size=length))
    # sprinkle a few Ns
    arr = list(seq)
    for i in rng.integers(0, length, size=5):
        arr[i] = "N"
    g = Genome()
    g.add(name, "".join(arr))
    return g


def sample_reads(rng, chrom, n_reads=60, read_len=50, insert=120):
    """Reads around simulated deletions so close+far ends exist."""
    reads = []
    biol = chrom.biol_size
    for i in range(n_reads):
        kind = i % 3
        pos = int(rng.integers(insert, biol - insert - 3 * read_len))
        matched_d = "+" if rng.random() < 0.5 else "-"
        if kind == 0:
            # clean read (reference-matching)
            frag = dna.decode(chrom.seq[SPACER + pos:SPACER + pos + read_len])
        elif kind == 1:
            # read spanning a deletion
            dsize = int(rng.integers(5, 40))
            bp = int(rng.integers(10, read_len - 10))
            left = dna.decode(chrom.seq[SPACER + pos:SPACER + pos + bp])
            right = dna.decode(chrom.seq[SPACER + pos + bp + dsize:
                                         SPACER + pos + bp + dsize + read_len - bp])
            frag = left + right
        else:
            # read with a short insertion
            isize = int(rng.integers(3, 12))
            bp = int(rng.integers(10, read_len - 10 - isize))
            ins = "".join(rng.choice(list("ACGT"), size=isize))
            left = dna.decode(chrom.seq[SPACER + pos:SPACER + pos + bp])
            right = dna.decode(chrom.seq[SPACER + pos + bp:
                                         SPACER + pos + bp + read_len - bp - isize])
            frag = left + ins + right
        # errors
        frag = list(frag)
        for j in rng.integers(0, len(frag), size=int(rng.integers(0, 3))):
            frag[j] = rng.choice(list("ACGT"))
        frag = "".join(frag)
        if matched_d == "+":
            seq = frag  # anchor upstream on +; mate stored as-is
            rel = max(0, pos - int(rng.integers(0, insert // 2)))
        else:
            seq = dna.revcomp_str(frag)
            rel = min(biol, pos + read_len + int(rng.integers(0, insert // 2)))
        r = SplitRead(name=f"@r{i}", frag_name=chrom.name, matched_d=matched_d,
                      matched_rel_pos=rel, ms=37, insert_size=insert, tag="S")
        r.set_seq(seq)
        reads.append(r)
    return reads


def ups_key(ups):
    return [(u.length_str, u.abs_loc, u.direction, u.strand, u.mismatches)
            for u in ups]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_close_end_matches_recursion(seed):
    rng = np.random.default_rng(seed)
    settings = Settings()
    maxmm = settings.max_mismatch()
    g = make_genome(rng)
    chrom = g.chromosomes[0]
    reads = sample_reads(rng, chrom)

    # recursive oracle
    expected = []
    for r in reads:
        budget = rec.Budget(r.read_length, maxmm, settings.additional_mismatch)
        ups, final_seq = rec.get_close_end(
            chrom.seq, chrom.name, r.seq_codes(), r.matched_d,
            r.matched_rel_pos, r.insert_size, budget, settings.min_close,
            settings.min_perfect_match_around_bp,
            settings.max_allowed_mismatch_rate)
        expected.append((ups_key(ups), dna.decode(final_seq)))

    # dense driver
    searcher = Searcher(settings)
    searcher.map_close_ends(chrom, reads)
    got_any = 0
    for r, (exp_ups, exp_seq) in zip(reads, expected):
        assert ups_key(r.up_close) == exp_ups, r.name
        assert r.seq == exp_seq, r.name
        got_any += bool(r.up_close)
    assert got_any > len(reads) // 2  # sanity: test data is meaningful


@pytest.mark.parametrize("seed", [0, 1])
def test_far_end_matches_recursion(seed):
    rng = np.random.default_rng(seed + 10)
    settings = Settings()
    maxmm = settings.max_mismatch()
    g = make_genome(rng)
    chrom = g.chromosomes[0]
    reads = sample_reads(rng, chrom)

    searcher = Searcher(settings)
    searcher.map_close_ends(chrom, reads)
    kept = searcher.finalize_close_ends(reads)
    assert kept

    expected = []
    for r in kept:
        budget = rec.Budget(r.read_length, maxmm, settings.additional_mismatch)
        ups = rec.search_far_end(chrom.seq, chrom.name, r.seq_codes(),
                                 r.up_close, budget, settings.max_range_index,
                                 settings.min_perfect_match_around_bp,
                                 settings.max_allowed_mismatch_rate)
        expected.append(ups_key(ups))

    searcher.search_far_ends(chrom, kept)
    found = 0
    for r, exp in zip(kept, expected):
        assert ups_key(r.up_far) == exp, r.name
        found += bool(r.up_far)
    assert found > 0


def test_clean_unique_points_chain():
    from pindel_tpu.reads import AnchorSet, UniquePoint
    ups = AnchorSet.from_points([
        UniquePoint("c", 10, 109, "+", "-", 0),
        UniquePoint("c", 12, 115, "+", "-", 0),  # different start -> dropped
        UniquePoint("c", 15, 114, "+", "-", 1),
    ])
    out = clean_unique_points(ups)
    assert ups_key(out) == [(10, 109, "+", "-", 0), (15, 114, "+", "-", 1)]
