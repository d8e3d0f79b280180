"""jax.distributed window transport: anchor tables over collectives.

The pod-shaped data plane behind ``--hosts N --dist jax``: every process
runs the same window loop (``parallel/multihost.py`` ownership rule
``window % N == rank``); a worker-owned window's packed anchor tables
(parallel/payload.py) move to the coordinator as a two-stage
``broadcast_one_to_all`` — a fixed-layout int64 length header, then one
concatenated uint8 blob — which XLA lowers to runtime collectives over
ICI/DCN on a real pod (SURVEY §2.3/§7: per-shard candidate anchors
merged with collectives before host-side clustering).  On this machine
it is smoke-tested with N CPU processes coordinated through
``jax.distributed.initialize`` (gRPC transport; same wiring, same call
order, no pod required).

Collective-order discipline: every rank walks windows in the same order
and joins a broadcast for exactly the worker-owned windows (coordinator-
owned windows need no transport).  The 1-deep window pipelining in
``Pipeline.run`` keeps each rank's own device search in flight while it
blocks in a peer window's broadcast.

The payload blob layout is derived from ``payload.pack``'s key order
(deterministic dict order) — receivers reconstruct dtypes/shapes from
the header alone, so ragged windows need no pre-negotiated shapes.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from pindel_tpu.parallel import payload

# fixed schema: (key, dtype) in wire order.  Arrays are 1-D.
_SCHEMA = None


def _schema():
    global _SCHEMA
    if _SCHEMA is None:
        probe = payload.pack([])
        _SCHEMA = [(k, v.dtype) for k, v in probe.items()]
    return _SCHEMA


def _encode(arrs: Dict[str, np.ndarray]):
    schema = _schema()
    assert list(arrs.keys()) == [k for k, _ in schema], "schema drift"
    parts = [np.ascontiguousarray(arrs[k]).view(np.uint8).reshape(-1)
             for k, _ in schema]
    header = np.array([p.size for p in parts], np.int64)
    blob = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    return header, blob


def _decode(header: np.ndarray, blob: np.ndarray) -> Dict[str, np.ndarray]:
    schema = _schema()
    out: Dict[str, np.ndarray] = {}
    off = 0
    for (k, dt), nbytes in zip(schema, header.tolist()):
        raw = blob[off:off + int(nbytes)]
        out[k] = np.frombuffer(raw.tobytes(), dtype=dt)
        off += int(nbytes)
    return out


class JaxDistSpool:
    """Window spool over jax.distributed collectives.

    Implements the same interface Pipeline consumes (``mine``/``worker``/
    ``dump``/``load``) plus ``consume`` for workers joining a peer
    worker's broadcast (required: collectives are global).
    """

    def __init__(self, rank: int, num_hosts: int):
        self.rank = rank
        self.num_hosts = num_hosts
        self.worker = rank != 0

    # ownership --------------------------------------------------------
    def mine(self, widx: int) -> bool:
        return widx % self.num_hosts == self.rank

    def owner(self, widx: int) -> int:
        return widx % self.num_hosts

    def needs_transport(self, widx: int) -> bool:
        return self.owner(widx) != 0

    # transport --------------------------------------------------------
    def _bcast(self, header: Optional[np.ndarray],
               blob: Optional[np.ndarray], source: bool):
        from jax.experimental import multihost_utils as mh
        nkeys = len(_schema())
        if not source:
            header = np.zeros(nkeys, np.int64)
        header = mh.broadcast_one_to_all(header, is_source=source)
        header = np.asarray(header)
        total = int(header.sum())
        if not source:
            blob = np.zeros(total, np.uint8)
        blob = mh.broadcast_one_to_all(blob, is_source=source)
        return header, np.asarray(blob)

    def dump(self, widx: int, kept: List) -> None:
        """Owner side: ship this window's searched reads to everyone
        (the coordinator consumes them; other workers discard)."""
        header, blob = _encode(payload.pack(kept))
        self._bcast(header, blob, source=True)

    def load(self, widx: int) -> List:
        """Coordinator side for a worker-owned window."""
        header, blob = self._bcast(None, None, source=False)
        return payload.unpack(_decode(header, blob))

    def consume(self, widx: int) -> None:
        """Worker side for a window owned by a *different* worker: join
        the global broadcast and discard the payload."""
        self._bcast(None, None, source=False)


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """Initialize the jax.distributed runtime for one process.

    Honors ``PINDEL_TPU_JAX_PLATFORMS`` (e.g. ``cpu`` for the local
    multi-process smoke test) before backends initialize — the axon
    sitecustomize forces its own platform otherwise."""
    platforms = os.environ.get("PINDEL_TPU_JAX_PLATFORMS")
    import jax
    if platforms:
        os.environ["JAX_PLATFORMS"] = platforms
        jax.config.update("jax_platforms", platforms)
        try:
            from jax.extend.backend import clear_backends
            clear_backends()
        except Exception:
            pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
