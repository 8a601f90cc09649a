"""Multi-device layer: domain decomposition over a JAX device mesh.

The reference distributes work by partitioning the top-level cell grid
over MPI ranks (partition.c:1033), exchanging boundary cells through
proxies (proxy.c:199-338) and migrated particles through strays
(engine_strays.c:64).  Here the same decomposition is expressed as a
sharded `(C, K, ...)` cell-tile layout over a `jax.sharding.Mesh`:

- cells are linearised x-major, so sharding axis 0 over an "x" mesh axis
  gives each device a contiguous x-slab of cells (SWIFT's slab/grid
  partition);
- the 27-stencil `jnp.roll` over the cell grid compiles, under GSPMD, to
  ICI collective-permutes of the boundary slabs — the halo exchange that
  proxies do by hand;
- the global reductions of the step (bin counts, overflow counters) become
  XLA all-reduces, the analog of the one fused MPI_Allreduce per step
  (collectgroup.c:305).
"""

from .mesh import (cell_sharding, make_mesh, replicated_sharding,
                   shard_state, shard_multi_state, sharded_hydro_step,
                   sharded_dm_step, sharded_multi_step)

__all__ = [
    "make_mesh", "cell_sharding", "replicated_sharding", "shard_state",
    "shard_multi_state", "sharded_hydro_step", "sharded_dm_step",
    "sharded_multi_step",
]
