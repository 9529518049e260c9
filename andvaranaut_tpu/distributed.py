"""Multi-host / multi-slice execution support.

The reference's only distribution story was dask's TCP scheduler for
target-function futures (ref core.py:105-134) — device-side scale-out did
not exist (SURVEY.md §2.6).  Here the device-side axes are:

- **data rows** (the O(N^2) Gram / O(N^3) Cholesky): `gp/sharded.py`
  shards over a 1-D mesh with psum / all_gather / psum_scatter
  collectives — latency-sensitive, so they should ride ICI.
- **MCMC chains**: embarrassingly parallel vmapped NUTS/HMC chains
  (`inference/nuts.py`) — no inter-chain collectives, so they tolerate
  DCN between slices.

Single-process JAX already exposes every chip of one host/slice; going
beyond (TPU pods, multi-slice) needs ``jax.distributed.initialize`` on
every participating process *before first backend use*, after which
``jax.devices()`` is the global device set and all the sharded machinery
works unchanged over the larger mesh.  This module wraps that plus the
hierarchical mesh layout that puts chains on the DCN axis and rows on the
ICI axis.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join (or form) a multi-process JAX cluster.

    On TPU pods / GKE / multi-slice environments all three arguments are
    auto-detected from the runtime metadata and may be omitted; elsewhere
    pass them explicitly (same semantics as ``jax.distributed.initialize``).
    Idempotent; a no-op single-process fallback is kept when no cluster
    environment can be detected, so library code may call this
    unconditionally.  Returns True when a multi-process cluster is active.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    env_hints = any(
        v in os.environ
        for v in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                  "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and num_processes is None and not env_hints:
        return False  # single-process: nothing to join
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError) as e:
        if coordinator_address is not None or num_processes is not None:
            raise  # explicit arguments: misconfiguration is an error
        # hint vars present but runtime auto-detection failed: stay
        # single-process (best-effort semantics)
        import warnings

        warnings.warn(f"jax.distributed auto-detection failed ({e}); "
                      "continuing single-process")
        return False
    _initialized = True
    return jax.process_count() > 1


def global_data_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every addressable device in the cluster (after
    ``initialize``, that is all hosts' chips).  Drop-in for
    ``gp.sharded.data_mesh`` at pod scale."""
    return Mesh(np.array(jax.devices()), (axis,))


def hierarchical_mesh(chains_axis: str = "chains", data_axis: str = "data",
                      num_slices: int | None = None) -> Mesh:
    """2-D (chains, data) mesh with the chain axis on the slow (DCN)
    dimension and the data-row axis on the fast (ICI) dimension.

    Within a slice, devices share ICI — the right home for the
    psum/all_gather-heavy distributed Cholesky; across slices only the
    embarrassingly-parallel chain axis crosses DCN.  ``num_slices``
    defaults to ``jax.process_count()`` (one slice per host process); on a
    single process it degrades to (1, n_devices), which is exactly the
    flat data mesh.
    """
    devices = jax.devices()
    if num_slices is None:
        num_slices = max(jax.process_count(), 1)
    n = len(devices)
    if n % num_slices:
        raise ValueError(
            f"{n} devices do not split into {num_slices} slices")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            (1, n // num_slices), (num_slices, 1), devices=devices)
    except Exception:
        # no slice topology info (CPU meshes, tests): row-major split
        dev_array = np.array(devices).reshape(num_slices, n // num_slices)
    return Mesh(dev_array, (chains_axis, data_axis))
