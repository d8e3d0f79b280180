"""Multi-host execution: windows sharded across processes.

The reference is strictly single-process (SURVEY §2.3: OpenMP loops only);
its only scale-out surface is the manual two-phase -S/-p flow.  The
TPU-native replacement shards the expensive stage — close/far anchor
search, which is embarrassingly parallel over windows — across processes,
while one coordinator runs the cheap, stateful report stage strictly in
window order, so output files are byte-identical to a single-process run:

* window w is searched by process ``w % num_hosts`` (each process runs its
  own device mesh for the fused kernels);
* a worker ships each searched window's reads (with their close/far
  anchor sets) to the coordinator;
* the coordinator (rank 0, which also searches its own share) consumes
  windows in order and runs detection/clustering/reporting exactly as the
  single-process pipeline does — the sequential report state
  (event counters, chromosome mask, report_length, interchromosomal pool)
  never leaves one process.

On a real multi-host TPU pod the same structure runs under
``jax.distributed.initialize()`` with ``rank = jax.process_index()`` and
the spool backed by the pod's shared filesystem (or an all-gather of the
packed anchor tables over DCN).  In this repository the harness is
simulated with local subprocesses — ``run_files_multihost`` spawns
``num_hosts - 1`` workers and acts as the coordinator; the golden test
asserts 2-process output equals 1-process output byte-for-byte.

Restrictions: pindel-text input only (BAM mode's RP->BD evidence
accumulates sequentially across windows inside one process) and no -S
(report-only-close) short-circuit.
"""
from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile
import time
from typing import List, Optional


class WindowSpool:
    """File-based exchange of searched windows between processes."""

    TIMEOUT = 900.0

    def __init__(self, root: str, rank: int, num_hosts: int,
                 worker: bool):
        self.root = root
        self.rank = rank
        self.num_hosts = num_hosts
        self.worker = worker

    def mine(self, widx: int) -> bool:
        return widx % self.num_hosts == self.rank

    def _path(self, widx: int) -> str:
        return os.path.join(self.root, f"w{widx:06d}.pkl")

    def dump(self, widx: int, kept: List) -> None:
        path = self._path(widx)
        with open(path + f".tmp{self.rank}", "wb") as fh:
            pickle.dump(kept, fh, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(path + f".tmp{self.rank}", path)

    def load(self, widx: int) -> List:
        path = self._path(widx)
        deadline = time.monotonic() + self.TIMEOUT
        while not os.path.exists(path):
            if time.monotonic() > deadline:
                raise TimeoutError(f"window {widx} never arrived from "
                                   f"worker {widx % self.num_hosts}")
            time.sleep(0.02)
        with open(path, "rb") as fh:
            return pickle.load(fh)


def _build_pipeline(cfg):
    from pindel_tpu.genome import Genome
    from pindel_tpu.pipeline import Pipeline, make_backend_factory
    settings = cfg["settings"]
    genome = Genome.from_fasta(settings.reference_filename)
    factory = make_backend_factory(cfg["backend"], settings)
    pipe = Pipeline(settings, genome, backend_factory=factory)
    pipe.create_output_files()
    if settings.pindel_config_filename:
        pipe.load_pindel_config(settings.pindel_config_filename)
    else:
        pipe.load_pindel_input(settings.pindel_filename)
    return pipe


def worker_main(cfg_path: str) -> int:
    with open(cfg_path, "rb") as fh:
        cfg = pickle.load(fh)
    pipe = _build_pipeline(cfg)
    pipe.spool = WindowSpool(cfg["spool"], cfg["rank"], cfg["num_hosts"],
                             worker=True)
    try:
        pipe.run()
    finally:
        pipe.close()
    return 0


def run_files_multihost(reference_fa: str, pindel_file: Optional[str],
                        output_prefix: str, settings, backend: str,
                        num_hosts: int,
                        pindel_config: Optional[str] = None):
    """Coordinator entry: spawn workers, search rank-0's windows locally,
    report everything in window order.  Same signature spirit as
    pipeline.run_files."""
    import copy

    from pindel_tpu.pipeline import run_files
    assert num_hosts >= 1
    if num_hosts == 1:
        return run_files(reference_fa, pindel_file, output_prefix,
                         settings=settings, backend=backend,
                         pindel_config=pindel_config)
    s = copy.deepcopy(settings)
    s.reference_filename = reference_fa
    s.pindel_filename = pindel_file or ""
    s.pindel_config_filename = pindel_config or ""
    assert not s.report_only_close_mapped_reads, \
        "-S is single-process (it is itself the two-phase checkpoint)"

    spool_dir = tempfile.mkdtemp(prefix="pindel_tpu_spool_")
    procs = []
    for rank in range(1, num_hosts):
        ws = copy.deepcopy(s)
        ws.output_prefix = os.path.join(spool_dir, f"worker{rank}_out")
        cfg = dict(settings=ws, backend=backend, spool=spool_dir,
                   rank=rank, num_hosts=num_hosts)
        cfg_path = os.path.join(spool_dir, f"cfg{rank}.pkl")
        with open(cfg_path, "wb") as fh:
            pickle.dump(cfg, fh, protocol=pickle.HIGHEST_PROTOCOL)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "pindel_tpu.parallel.multihost",
             cfg_path]))

    s.output_prefix = output_prefix
    spool = WindowSpool(spool_dir, 0, num_hosts, worker=False)
    try:
        run_files(reference_fa, pindel_file, output_prefix, settings=s,
                  backend=backend, pindel_config=pindel_config,
                  spool=spool)
    finally:
        for p in procs:
            p.wait(timeout=120)
    return s


if __name__ == "__main__":
    sys.exit(worker_main(sys.argv[1]))
