"""Sharded flat (column/z-sorted Pallas) loops — explicit halo exchange.

The fast single-chip engine (ops/pallas_flat.py) keeps particles in
(x, y) columns with column-LOCAL offsets; pair math only ever uses
offset differences plus one-edge stencil shifts.  That makes the
multi-chip halo *translation-invariant*: a device that owns a
contiguous x-slab of columns only needs the single boundary column
slab of each x-neighbour, and the received columns drop into an
extended local grid unchanged — no coordinate rebasing, no global
wrap bookkeeping (z stays globally periodic inside the kernel; y is
whole per device).

This is the TPU-native analog of the reference's proxy layer
(proxy.c:199-338 exchanges boundary cells between MPI ranks before
pair tasks run): here the exchange is ONE ``jax.lax.ppermute`` of the
first/last ``ncy`` columns per neighbour inside ``shard_map``, riding
the ICI, followed by the unmodified Pallas kernel on the
``(ncx/n + 2, ncy)`` extended column grid and an interior slice.

Works for every flat-backend pass (density/gradient/force via
ops/hydro_pallas with engine='flat', and the flat P2P gravity), since
they all consume (C, K)-leading tile states.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def _extended_grid(grid, n_shards: int):
    from ..grid.cellgrid import CellGrid

    ncx, ncy, ncz = grid.cdim
    assert ncz == 1, "sharded flat loops need a column grid"
    if ncx % n_shards:
        raise ValueError(
            f"ncx={ncx} not divisible by {n_shards} shards — re-grid with "
            "a multiple (the CLI's column builder rounds ncx for this)")
    ncx_loc = ncx // n_shards
    ex = grid.box[0] / ncx
    return CellGrid(
        box=((ncx_loc + 2) * ex, grid.box[1], grid.box[2]),
        cdim=(ncx_loc + 2, ncy, 1), K=grid.K), ncx_loc


def sharded_flat_loop(grid, mesh, loop_fn: Callable, s: Dict,
                      axis: str = "x"):
    """Run ``loop_fn(local_grid, local_state) -> dict of (C_loc, ...)``
    over the x-sharded column state ``s``; returns global (C, ...) dicts.

    ``loop_fn`` is any flat-backend pass; it sees a local CellGrid of
    ``ncx/n + 2`` x-rows whose first/last rows are the halo slabs.
    Periodicity across the global x boundary is inherited from the
    ppermute ring; interior pair results are exact because every
    27-stencil (here 9-column) neighbour of an interior column is
    present in the extended domain.
    """
    import jax
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]
    ext_grid, ncx_loc = _extended_grid(grid, n)
    ncy = grid.cdim[1]
    C = grid.C

    tile_keys = [k for k, v in s.items()
                 if hasattr(v, "ndim") and v.ndim >= 2
                 and v.shape[0] == C]
    other = {k: s[k] for k in s if k not in tile_keys}

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]

    def body(*tiles):
        local = dict(zip(tile_keys, tiles))
        ext = {}
        for k, a in local.items():
            # my last slab -> right neighbour's left halo, and vice versa
            left = jax.lax.ppermute(a[-ncy:], axis, fwd)
            right = jax.lax.ppermute(a[:ncy], axis, bwd)
            ext[k] = jnp.concatenate([left, a, right], axis=0)
        out = loop_fn(ext_grid, {**ext, **other})
        return tuple(out[k][ncy:-ncy] for k in sorted(out))

    # probe output keys once with abstract eval on the full state
    probe = jax.eval_shape(lambda st: loop_fn(grid, st), s)
    out_keys = sorted(probe)

    shard = NamedSharding(mesh, P(axis))
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(axis),) * len(tile_keys),
                  out_specs=(P(axis),) * len(out_keys),
                  check_vma=False)
    args = [jax.device_put(s[k], shard) for k in tile_keys]
    res = f(*args)
    return dict(zip(out_keys, res))


def shard_flat_call(grid, n: int, axis: str, loop_fn: Callable, s: Dict):
    """In-jit variant of ``sharded_flat_loop`` — the ENGINE-level sharded
    flat backend.  Same ppermute column-slab halo exchange, but callable
    on traced tiles inside a jitted engine step: the mesh is built from
    the first ``n`` devices at trace time, tile inputs are demanded in
    x-slab layout by ``in_specs`` (GSPMD inserts any resharding), and
    non-tile state entries ride along replicated.

    This is what lets the full hydro_step (rebucket under GSPMD, pair
    passes under shard_map) run multi-chip without a host round-trip at
    the rebucket/loop boundary.
    """
    import jax
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:n]), (axis,))
    ext_grid, ncx_loc = _extended_grid(grid, n)
    ncy = grid.cdim[1]
    C = grid.C

    tile_keys = [k for k, v in s.items()
                 if hasattr(v, "ndim") and v.ndim >= 2
                 and v.shape[0] == C]
    other_keys = [k for k in s if k not in tile_keys]

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]

    # output keys via abstract eval (works on tracers too)
    probe = jax.eval_shape(lambda st: loop_fn(grid, st), s)
    out_keys = sorted(probe)

    def body(tiles, others):
        local = dict(zip(tile_keys, tiles))
        ext = {}
        for k, a in local.items():
            left = jax.lax.ppermute(a[-ncy:], axis, fwd)
            right = jax.lax.ppermute(a[:ncy], axis, bwd)
            ext[k] = jnp.concatenate([left, a, right], axis=0)
        out = loop_fn(ext_grid, {**ext, **dict(zip(other_keys, others))})
        return tuple(out[k][ncy:-ncy] for k in out_keys)

    f = shard_map(body, mesh=mesh,
                  in_specs=((P(axis),) * len(tile_keys),
                            (P(),) * len(other_keys)),
                  out_specs=(P(axis),) * len(out_keys),
                  check_vma=False)
    res = f(tuple(s[k] for k in tile_keys),
            tuple(s[k] for k in other_keys))
    return dict(zip(out_keys, res))


def shard_flat_multi_call(grid, n: int, axis: str, loop_fn: Callable,
                          states):
    """Multi-species ``shard_flat_call``: halo-exchange the boundary
    column slabs of EVERY species' tile fields, then run
    ``loop_fn(ext_grid, ext_states) -> [dict, ...]`` under shard_map.

    This is what the joint short-range gravity needs (every species
    sources every species): one ppermute ring per species per side, all
    riding the same x-slab mesh.  Species tiles may have different
    capacities (gas K vs star K) — only the leading (C, ...) layout
    must match the column grid.
    """
    import jax
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:n]), (axis,))
    ext_grid, _ = _extended_grid(grid, n)
    ncy = grid.cdim[1]
    C = grid.C

    def is_tile(v):
        return hasattr(v, "ndim") and v.ndim >= 2 and v.shape[0] == C

    tile_keys = [[k for k, v in st.items() if is_tile(v)]
                 for st in states]
    in_specs = [{k: (P(axis) if k in tks else P()) for k in st}
                for st, tks in zip(states, tile_keys)]

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]

    probe = jax.eval_shape(lambda ss: loop_fn(grid, ss), states)
    out_keys = [sorted(d) for d in probe]

    def body(ss):
        ext_states = []
        for st, tks in zip(ss, tile_keys):
            e = dict(st)
            for k in tks:
                a = st[k]
                left = jax.lax.ppermute(a[-ncy:], axis, fwd)
                right = jax.lax.ppermute(a[:ncy], axis, bwd)
                e[k] = jnp.concatenate([left, a, right], axis=0)
            ext_states.append(e)
        outs = loop_fn(ext_grid, ext_states)
        return [{k: out[k][ncy:-ncy] for k in ks}
                for out, ks in zip(outs, out_keys)]

    f = shard_map(body, mesh=mesh, in_specs=(in_specs,),
                  out_specs=[{k: P(axis) for k in ks} for ks in out_keys],
                  check_vma=False)
    return f(list(states))
