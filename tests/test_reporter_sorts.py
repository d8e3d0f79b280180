"""Pin the vectorized box sort / duplicate marking against the literal
reference loops (reporter.cpp:932-972)."""
import random

from pindel_tpu.reads import SplitRead
from pindel_tpu.report.reporter import (bubblesort_reads, mark_duplicates,
                                        smaller)


def _literal_exchange_sort(reads, indices):
    n = len(indices)
    for first in range(n - 1):
        for second in range(first + 1, n):
            if not smaller(reads[indices[first]], reads[indices[second]]):
                indices[first], indices[second] = (indices[second],
                                                   indices[first])


def _literal_mark_duplicates(reads, indices):
    n = len(indices)
    for first in range(n - 1):
        a = reads[indices[first]]
        if not a.unique_read:
            continue
        for second in range(first + 1, n):
            b = reads[indices[second]]
            if a.left == b.left and a.right == b.right and a.name == b.name:
                b.unique_read = False


def _random_reads(rng, n):
    reads = []
    for k in range(n):
        r = SplitRead(name=f"@r{rng.randint(0, 3)}", frag_name="chrT")
        r.bp_left = rng.randint(0, 3)
        r.bp_right = rng.randint(0, 3)
        r.indel_size = rng.randint(0, 2)
        r.nt_size = rng.randint(0, 1)
        r.bp = rng.randint(0, 2)
        r.left = rng.randint(0, 2)
        r.right = rng.randint(0, 2)
        r.unique_read = True
        reads.append(r)
    return reads


def test_bubblesort_matches_literal_loop():
    rng = random.Random(4)
    for _ in range(300):
        n = rng.randint(0, 14)
        reads = _random_reads(rng, n)
        a = list(range(n))
        b = list(range(n))
        bubblesort_reads(reads, a)           # vectorized for n > 8
        _literal_exchange_sort(reads, b)
        assert a == b, (n, a, b)


def test_mark_duplicates_matches_literal_loop():
    rng = random.Random(5)
    for _ in range(300):
        n = rng.randint(0, 14)
        reads_a = _random_reads(rng, n)
        import copy
        reads_b = copy.deepcopy(reads_a)
        idx = list(range(n))
        mark_duplicates(reads_a, idx)
        _literal_mark_duplicates(reads_b, idx)
        assert [r.unique_read for r in reads_a] == \
            [r.unique_read for r in reads_b]


def test_di_sort_native_matches_literal_loop():
    from pindel_tpu.report.reporter import _di_sort

    def literal(reads, box):
        n = len(box)
        for first in range(n - 1):
            for second in range(first + 1, n):
                a, b = reads[box[first]], reads[box[second]]
                swap = False
                if a.bp_left < b.bp_left:
                    continue
                elif a.bp_left > b.bp_left:
                    swap = True
                else:
                    if a.bp_right < b.bp_right:
                        continue
                    elif a.bp_right > b.bp_right:
                        swap = True
                    else:
                        if a.nt_size < b.nt_size:
                            continue
                        elif a.nt_size > b.nt_size:
                            swap = True
                        elif a.bp > b.bp:
                            swap = True
                if swap:
                    box[first], box[second] = box[second], box[first]

    rng = random.Random(7)
    for _ in range(200):
        n = rng.randint(0, 16)
        reads = _random_reads(rng, n)
        a = list(range(n))
        b = list(range(n))
        _di_sort(reads, a)                 # native for n > 8
        literal(reads, b)
        assert a == b, (n, a, b)
