"""Device-mesh helpers: build a mesh, shard the engine state, run a step.

The cell-tile state is a dict of ``(C, K, ...)`` arrays with ``C``
linearised x-major; sharding axis 0 over the mesh's "x" axis assigns each
device a contiguous x-slab of cells — the TPU-native analog of SWIFT's
initial grid partition (partition.c:441 grid split).  Small per-step
tables and scalars are replicated.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def make_mesh(n_devices: Optional[int] = None, axis: str = "x"):
    """A 1-D device mesh over the first ``n_devices`` devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if len(devs) < n:
        raise RuntimeError(
            f"need {n} devices, found {len(devs)} — provision a virtual CPU "
            "mesh with XLA_FLAGS=--xla_force_host_platform_device_count")
    return Mesh(np.array(devs[:n]), (axis,))


def cell_sharding(mesh, axis: str = "x"):
    """Sharding for (C, K, ...) cell-tile arrays: split cells over devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def shard_state(state: Dict, grid, mesh, axis: str = "x") -> Dict:
    """device_put the engine state: cell-tile arrays sharded, rest replicated.

    Requires ``grid.cdim[0] % mesh.shape[axis] == 0`` so every device owns a
    whole x-slab (SWIFT likewise requires at least one top-cell layer per
    rank — engine_makeproxies).
    """
    import jax
    import jax.numpy as jnp

    ncx = grid.cdim[0]
    ndev = mesh.shape[axis]
    if ncx % ndev != 0:
        raise ValueError(
            f"cdim[0]={ncx} not divisible by mesh axis size {ndev}")
    shard_c = cell_sharding(mesh, axis)
    repl = replicated_sharding(mesh)

    def put(v):
        v = jnp.asarray(v)
        if v.ndim >= 2 and v.shape[0] == grid.C:
            return jax.device_put(v, shard_c)
        return jax.device_put(v, repl)

    return {k: put(v) for k, v in state.items()}


def sharded_hydro_step(grid, sph, cfg, gravity_fn, cosmo, mesh,
                       axis: str = "x"):
    """A jitted hydro step that keeps cell tiles sharded over ``mesh``.

    GSPMD inserts the halo exchange (collective-permute of boundary cell
    slabs from the 27-stencil rolls) and the step's global reductions —
    the compiler-scheduled equivalents of proxy exchange (proxy.c) and the
    end-of-step MPI_Allreduce (collectgroup.c:305).
    """
    import jax

    from ..engine import hydro_step

    shard_c = cell_sharding(mesh, axis)

    @jax.jit
    def step(s, tables):
        new_s, diag = hydro_step(grid, sph, cfg, gravity_fn, cosmo, s,
                                 tables)
        new_s = {k: (jax.lax.with_sharding_constraint(v, shard_c)
                     if (hasattr(v, "ndim") and v.ndim >= 2
                         and v.shape[0] == grid.C) else v)
                 for k, v in new_s.items()}
        return new_s, diag

    return step


def sharded_dm_step(grid, cfg, gravity_fn, eps_soft, mesh,
                    axis: str = "x"):
    """Sharded gravity-only (DMO) step: P2P short range rides the same
    roll-stencil halo collectives as hydro; the PM mesh's CIC deposit is
    a sharded scatter-add and the FFT runs replicated (XLA gathers the
    mesh — the analog of the reference's slab-FFT alltoall,
    mesh_gravity_mpi.c, left to the compiler here)."""
    import jax

    from ..engine import dm_step

    shard_c = cell_sharding(mesh, axis)

    @jax.jit
    def step(s, tables):
        new_s, diag = dm_step(grid, cfg, gravity_fn, eps_soft, s, tables)
        new_s = {k: (jax.lax.with_sharding_constraint(v, shard_c)
                     if (hasattr(v, "ndim") and v.ndim >= 2
                         and v.shape[0] == grid.C) else v)
                 for k, v in new_s.items()}
        return new_s, diag

    return step


def sharded_multi_step(grid, sph, cfg, gravity_fn, eps_soft, cosmo, mesh,
                       cooling_fn=None, sf=None, feedback=None,
                       bh_model=None, axis: str = "x"):
    """Sharded multi-species step (gas+DM+stars+BH): every species' cell
    tiles are x-slab sharded; the joint gravity sums species on the same
    sharded grid."""
    import jax

    from ..engine_multi import multi_step

    shard_c = cell_sharding(mesh, axis)

    def constrain(sp):
        return {k: (jax.lax.with_sharding_constraint(v, shard_c)
                    if (hasattr(v, "ndim") and v.ndim >= 2
                        and v.shape[0] == grid.C) else v)
                for k, v in sp.items()}

    @jax.jit
    def step(state, tables):
        new_state, diag = multi_step(grid, sph, cfg, gravity_fn, eps_soft,
                                     cosmo, state, tables, cooling_fn,
                                     sf, feedback, bh_model)
        return {n: constrain(sp) for n, sp in new_state.items()}, diag

    return step


def shard_multi_state(state: Dict, grid, mesh, axis: str = "x") -> Dict:
    """shard_state over a {'gas': {...}, ...} species dict."""
    return {name: shard_state(sp, grid, mesh, axis)
            for name, sp in state.items()}
