#!/usr/bin/env python
"""Profile the bench scene: build once (cached in /tmp), run the pipeline
warm with the fine-grained timer registry, optionally under cProfile.

Usage: python tools/profile_bench.py [--backend fused] [--cprofile]
       [--runs 2]  (last run's timers are reported — warm numbers)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

CACHE = "/tmp/pindel_profile_scene"


def build_scene():
    import bench
    from make_fai import make_fai

    from pindel_tpu.testing.simulate import standard_scene, write_fasta
    os.makedirs(CACHE, exist_ok=True)
    fa = os.path.join(CACHE, "bench_ref.fa")
    reads_txt = os.path.join(CACHE, "bench_reads.txt")
    if not (os.path.exists(fa) and os.path.exists(reads_txt)):
        ref, events, reads = standard_scene(
            seed=1234, chrom_len=bench.CHROM_LEN, kinds=bench.SCENE_KINDS,
            reads_per_event=bench.READS_PER_EVENT, n_noise=bench.N_NOISE,
            chrom="chrB")
        write_fasta(fa, [("chrB", ref)])
        make_fai(fa)
        reads.write(reads_txt)
    return fa, reads_txt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="fused")
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--sort", default="cumulative")
    args = ap.parse_args()

    fa, reads_txt = build_scene()
    from pindel_tpu.config import Settings
    from pindel_tpu.pipeline import run_files
    from pindel_tpu.profiling import g_timer

    dts = []
    for i in range(args.runs):
        g_timer.reset()
        out = os.path.join(CACHE, f"out_run{i}")
        prof = None
        if args.cprofile and i == args.runs - 1:
            import cProfile
            prof = cProfile.Profile()
            prof.enable()
        t0 = time.time()
        s = Settings()
        s.profile = True
        s.num_threads = args.threads
        s.analyze_li = True                   # -l (matches bench.py)
        s.analyze_bp = True                   # -k
        s.report_close_mapped_reads = True    # -s
        run_files(fa, reads_txt, out, settings=s, backend=args.backend)
        dts.append(time.time() - t0)
        if prof is not None:
            prof.disable()
            import pstats
            pstats.Stats(prof).sort_stats(args.sort).print_stats(35)
    print(f"runs: {['%.2f' % d for d in dts]}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
