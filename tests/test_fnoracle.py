"""Execution-level cross-validation of genotyping/assembly cores.

The reference's genotyping and assembly call sites are disabled
(pindel.cpp:1733-1742), so no end-to-end golden test can reach them.
Instead, tools/fnoracle builds a harness that links the compiled
reference objects and EXECUTES the pure functions — getAverageAndSTDE /
getMAD / CountRPSupport4DEL (genotyping.cpp:184-295), CombineReads
(assembly.cpp:293-507), CleanUpCloseEnd (assembly.cpp:704-717) — on
synthetic inputs fed over stdin.  These tests fuzz both sides with
identical inputs and compare results, pinning the Python
re-implementations by execution instead of by reading the C++.

Known intentional divergence (not covered here): the reference stores
pair distance in a SHORT (RP_READ::Distance), so distances > 32767 wrap
negative and count as ALT regardless of the cutoff; our genotyping keeps
exact integers.  Fixture distances stay below 32767.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = "/tmp/pindel_oracle/fn_harness"


@pytest.fixture(scope="session")
def harness():
    if not os.path.exists("/root/reference/src/genotyping.cpp"):
        pytest.skip("reference tree not available")
    r = subprocess.run(
        [os.path.join(REPO, "tools", "fnoracle", "build_fn_harness.sh")],
        capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        pytest.skip(f"harness build failed: {r.stderr[-500:]}")
    return HARNESS


def run_harness(harness, mode: str, text: str) -> str:
    r = subprocess.run([harness, mode], input=text, capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
    return r.stdout.split("===RESULT===\n", 1)[1]


# ------------------------------------------------------------- genotyping

def _gt_python(sv, samples):
    """Mirror of the GetRP4OnDEL numeric core using the production
    helpers (pindel_tpu/genotyping.py)."""
    from pindel_tpu.genotyping import MIN_MQ, _count_spanning, median_and_mad
    pos_a_sv, ci_a, pos_b_sv, ci_b = sv
    out = []
    for reads in samples:
        if len(reads):
            pa = np.array([r[0] for r in reads], np.int64)
            pb = np.array([r[1] for r in reads], np.int64)
            mq = np.array([min(r[2], r[3]) for r in reads], np.int64)
        else:
            pa = pb = mq = np.zeros(0, np.int64)
        keep = (pa != pb) & (mq >= MIN_MQ)
        pa, pb = pa[keep], pb[keep]
        dist = np.abs(pa - pb)
        median, mad = median_and_mad(dist)
        cutoff = median + 5 * mad
        if cutoff == 0:
            out.append((median, mad, None))
            continue
        ref_a = _count_spanning(pa, pb, dist, dist <= cutoff,
                                pos_a_sv - ci_a, pos_a_sv + ci_a)
        ref_b = _count_spanning(pa, pb, dist, dist <= cutoff,
                                pos_b_sv - ci_b, pos_b_sv + ci_b)
        alt = _count_spanning(pa, pb, dist, dist > cutoff,
                              pos_a_sv - ci_a, pos_b_sv + ci_b)
        total = ref_a + ref_b + alt
        gt = None if total == 0 else \
            float(np.float32(ref_a + ref_b) * 2 / (ref_a + ref_b + alt * 2))
        out.append((median, mad, gt))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_genotyping_core_matches_reference(harness, seed):
    rng = np.random.default_rng(seed)
    pos_a, ci_a = 10_000 + int(rng.integers(0, 500)), int(rng.integers(1, 60))
    size = int(rng.integers(200, 4000))
    pos_b, ci_b = pos_a + size, int(rng.integers(1, 60))
    nsamples = int(rng.integers(1, 4))
    samples = []
    for _ in range(nsamples):
        n = int(rng.integers(0, 40))
        reads = []
        for _ in range(n):
            # pairs around the SV: some spanning, some local, some low-MQ
            a = int(rng.integers(pos_a - 800, pos_b + 800))
            d = int(rng.integers(0, 3000))
            b = a + d if rng.random() < 0.8 else a - d
            mqa = int(rng.choice([0, 10, 25, 60]))
            mqb = int(rng.choice([0, 10, 25, 60]))
            reads.append((a, max(b, 1), mqa, mqb))
        samples.append(reads)

    lines = [str(nsamples), f"{pos_a} {ci_a} {pos_b} {ci_b}"]
    for reads in samples:
        lines.append(str(len(reads)))
        lines += [f"{a} {b} {ma} {mb}" for a, b, ma, mb in reads]
    out = run_harness(harness, "gtcore", "\n".join(lines) + "\n")

    ref_stats = []
    gt_line = None
    for line in out.splitlines():
        if line.startswith("stats "):
            ref_stats.append([int(x) for x in line.split()[1:]])
        elif line.startswith("Genotype_Based_On_RP:"):
            gt_line = [float(x) for x in line.split()[1:]]
    assert gt_line is not None and len(ref_stats) == nsamples

    # NOTE: the harness applies the reference's own MQA/MQB >= 20 filter;
    # the python side mirrors genotype_del_rp's min(MQ) formulation,
    # which is equivalent for the conjunction
    ours = _gt_python((pos_a, ci_a, pos_b, ci_b), samples)
    for s in range(nsamples):
        med, mad, gt = ours[s]
        assert ref_stats[s][0] == med, (seed, s, ref_stats[s], med)
        assert ref_stats[s][3] == mad, (seed, s, ref_stats[s], mad)
        ref_gt = gt_line[s]
        if gt is None:
            assert ref_gt == -1.0, (seed, s, ref_gt)
        else:
            assert abs(ref_gt - gt) < 1e-4, (seed, s, ref_gt, gt)


# --------------------------------------------------------------- assembly

def _mk_read(seq, left, d="+", pos=1000, isz=300, tag="s1", nup=1):
    from pindel_tpu.reads import SplitRead
    r = SplitRead(name="@x", seq=seq, matched_d=d, matched_rel_pos=pos,
                  insert_size=isz, tag=tag)
    r.left_most_pos = left
    r._nup = nup
    return r


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
@pytest.mark.parametrize("strand", ["+", "-"])
def test_combine_reads_matches_reference(harness, seed, strand):
    from pindel_tpu import assembly as pa
    from pindel_tpu.reads import AnchorSet, UniquePoint
    rng = np.random.default_rng(seed * 2 + (strand == "-"))
    core = "".join(rng.choice(list("ACGT"), size=400))
    # the harness loads the core through the real Genome::loadAll
    # (spacer padding applied there)
    chrseq = core
    n = int(rng.integers(3, 10))
    reads = []
    lines2 = []
    base = 50
    for i in range(n):
        off = int(rng.integers(0, 60))
        ln = int(rng.integers(30, 61))
        seq = core[off:off + ln]
        if rng.random() < 0.3:   # inject disagreement
            k = int(rng.integers(0, ln))
            seq = seq[:k] + rng.choice(list("ACGT")) + seq[k + 1:]
        nup = int(rng.integers(0, 4))
        r = _mk_read(seq, base + off, d="+", pos=60, isz=200, nup=nup)
        # give the python read nup anchors so the template pick matches
        if nup:
            pts = [UniquePoint("chrT", 5, 100 + j, "+", "-", 0)
                   for j in range(nup)]
            r.up_close = AnchorSet.from_points(pts)
        reads.append(r)
        lines2.append(f"{base + off} {nup} + 60 200 s{i % 2} {seq}")
        reads[-1].tag = f"s{i % 2}"

    out = run_harness(
        harness, "combine",
        "\n".join([chrseq, strand, str(n)] + lines2) + "\n")
    first, *rest = out.splitlines()
    ref_n = int(first)

    ours = pa.combine_reads(strand, reads, list(range(n)))
    if ref_n == 0:
        assert ours is None, (seed, strand)
        return
    assert ours is not None, (seed, strand)
    ref_seq = rest[0]
    ref_thick, ref_left, _ref_upn, *ref_counts = rest[1].split()
    assert ours.seq == ref_seq, (seed, strand)
    assert ours.thickness == int(ref_thick)
    assert ours.left_most_pos == int(ref_left)
    counts = dict(c.split(":") for c in ref_counts)
    assert {k: int(v) for k, v in counts.items()} == \
        ours.read_count_per_sample


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cleanup_close_end_matches_reference(harness, seed):
    from pindel_tpu import assembly as pa
    from pindel_tpu.reads import AnchorSet, UniquePoint
    rng = np.random.default_rng(seed)
    left, right = 1000, 2000
    n = 12
    reads = []
    lines = [f"{left} {right}", str(n)]
    for i in range(n):
        k = int(rng.integers(0, 4))
        locs = sorted(int(rng.integers(0, 3000)) for _ in range(k))
        r = _mk_read("ACGT" * 10, 0)
        r.name = f"@r{i}"
        if k:
            pts = [UniquePoint("chrT", 5 + j, loc, "+", "-", 0)
                   for j, loc in enumerate(locs)]
            r.up_close = AnchorSet.from_points(pts)
        reads.append(r)
        lines.append(f"{k}" + "".join(f" {loc}" for loc in locs))
    out = run_harness(harness, "cleanup", "\n".join(lines) + "\n")
    ref_names = [ln for ln in out.splitlines() if ln]
    kept = pa.clean_up_close_end(reads, left, right)
    assert [r.name for r in kept] == ref_names, (seed, ref_names)
