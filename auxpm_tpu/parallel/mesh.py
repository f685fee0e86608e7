"""Device-mesh construction for the two parallel axes of this workload.

SURVEY.md §2.3: the framework's parallelism maps onto a 2-D logical mesh

- ``chains``   — data-parallel axis: independent MCMC chains; never
  communicate except windowed adaptation reductions (BASELINE.json:10).
- ``particles``— tensor-parallel axis: the S importance samples (or SMC
  particles) of ONE estimate sharded across devices; the global logsumexp
  is the collective (BASELINE.json:11).

Multi-host bring-up is ``jax.distributed.initialize()`` before mesh
construction; on a pod slice the same code spans hosts because the mesh is
built from ``jax.devices()`` (all processes' devices).  Collectives ride ICI
within a slice; the mesh-major ordering of ``mesh_utils`` keeps the
``particles`` axis on the fastest links.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(
    coordinator=None, num_processes=None, process_id=None, require=False
):
    """Multi-host bring-up (idempotent).

    On TPU pods the runtime autodetects everything from the environment
    (``jax.distributed.initialize()`` with no args); the explicit kwargs
    cover manual bring-up (e.g. GPU clusters or tests).  Call BEFORE any
    other jax API touches a backend.  After this, ``jax.devices()`` spans
    all processes and ``make_mesh`` builds a global mesh; gang-scheduling
    semantics and restart-based recovery are documented in SURVEY.md §5.

    ``require=True`` (set by ``--multihost`` callers) turns any bring-up
    failure into a hard error instead of a logged skip — a pod process
    falling back to single-host mode would silently compute on a wrong,
    local-only mesh.
    """
    # Idempotence must be checked WITHOUT touching the XLA backend:
    # jax.process_count() initialises the backend, after which
    # jax.distributed.initialize() always raises. Inspect the distributed
    # client state directly instead (advisor finding, round 1).
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialised
    kw = {}
    if coordinator is not None:
        kw = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        require = True
    try:
        jax.distributed.initialize(**kw)
    except Exception as e:
        # Only swallow the single-process/dev case; an explicitly requested
        # multi-host bring-up that fails must fail LOUDLY, otherwise each
        # process silently runs as an independent single-host job.
        if require:
            raise
        import logging

        logging.getLogger("auxpm_tpu").info(f"distributed init skipped: {e}")


def make_mesh(n_chains_shards=None, n_particle_shards=1, devices=None):
    """Build a ('chains', 'particles') mesh.

    Defaults to all devices on the chains axis.  ``n_chains_shards`` may be
    left None to mean "all devices / n_particle_shards".
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_chains_shards is None:
        if n % n_particle_shards:
            raise ValueError(f"{n} devices not divisible by {n_particle_shards}")
        n_chains_shards = n // n_particle_shards
    want = n_chains_shards * n_particle_shards
    if want > n:
        raise ValueError(
            f"mesh {n_chains_shards}x{n_particle_shards} needs {want} devices, have {n}"
        )
    devices = devices.ravel()[:want]  # sub-mesh is fine (e.g. tests)
    try:
        dev_grid = mesh_utils.create_device_mesh(
            (n_chains_shards, n_particle_shards), devices=list(devices.ravel())
        )
    except Exception:  # virtual CPU devices: no topology info
        dev_grid = devices.reshape(-1)[:want].reshape(n_chains_shards, n_particle_shards)
    return Mesh(dev_grid, ("chains", "particles"))


def chain_sharding(mesh):
    """NamedSharding for a batched ChainState: leading axis over 'chains'."""
    return NamedSharding(mesh, P("chains"))


def state_shardings(mesh, shard_particles=False):
    """PartitionSpecs for (theta, u, log_lik_hat, key) of a batched state.

    u has shape (chains, S, n): S over 'particles' when requested.
    """
    pu = P("chains", "particles", None) if shard_particles else P("chains")
    return {
        "theta": P("chains"),
        "u": pu,
        "log_lik_hat": P("chains"),
        "key": P("chains"),
    }
