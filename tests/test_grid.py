"""Cell-grid bucketing tests (analog of reference space_rebuild checks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.grid import (
    CellGrid, bucket_fields, rebucket_offsets, global_positions)


def _random_setup(n=500, seed=0, cdim=(4, 4, 4), K=32):
    rng = np.random.default_rng(seed)
    box = (1.0, 1.0, 1.0)
    grid = CellGrid(box=box, cdim=cdim, K=K)
    pos = rng.uniform(0, 1, size=(n, 3))
    return grid, pos, rng


def test_bucket_roundtrip():
    grid, pos, rng = _random_setup()
    ids = np.arange(len(pos), dtype=np.int32)
    m = rng.uniform(1, 2, len(pos)).astype(np.float32)
    fields, mask, off, n_over = bucket_fields(
        grid, jnp.asarray(pos), {"pid": jnp.asarray(ids), "m": jnp.asarray(m)})
    assert int(n_over) == 0
    assert int(mask.sum()) == len(pos)
    # reconstruct positions and compare
    gpos = global_positions(grid, off)
    flat_ids = np.asarray(fields["pid"]).reshape(-1)
    valid = np.asarray(mask).reshape(-1) > 0
    got = gpos.reshape(-1, 3)[valid]
    ids_v = flat_ids[valid]
    order = np.argsort(ids_v)
    np.testing.assert_allclose(got[order], pos[np.sort(ids_v)], atol=1e-6)
    # masses carried along
    mm = np.asarray(fields["m"]).reshape(-1)[valid]
    np.testing.assert_allclose(mm[order], m[np.sort(ids_v)], rtol=1e-7)


def test_bucket_cell_assignment():
    """Every particle lands in the cell containing it."""
    grid, pos, _ = _random_setup(n=200)
    fields, mask, off, _ = bucket_fields(
        grid, jnp.asarray(pos),
        {"pid": jnp.arange(200, dtype=jnp.int32)})
    off = np.asarray(off)
    mask = np.asarray(mask)
    # offsets of real particles must lie in [0, edge)
    edge = grid.edge_arr
    for k in range(3):
        vals = off[..., k][mask > 0]
        assert (vals >= 0).all() and (vals < edge[k] + 1e-7).all()


def test_rebucket_after_drift():
    grid, pos, rng = _random_setup(n=400)
    ids = np.arange(len(pos), dtype=np.int32)
    fields, mask, off, _ = bucket_fields(
        grid, jnp.asarray(pos), {"pid": jnp.asarray(ids)})
    # drift: move offsets by up to 1.5 cells
    delta = rng.uniform(-0.35, 0.35, size=off.shape).astype(np.float32)
    off2 = jnp.asarray(np.asarray(off) + delta * np.asarray(mask)[..., None])
    new_fields, new_mask, new_off, n_over = rebucket_offsets(
        grid, mask, off2, {"pid": fields["pid"]})
    assert int(n_over) == 0
    assert int(new_mask.sum()) == len(pos)
    # positions preserved: corner+off invariant (mod box)
    gpos_before = global_positions(grid, off2)
    gpos_after = global_positions(grid, new_off)
    ids_b = np.asarray(fields["pid"]).reshape(-1)
    ids_a = np.asarray(new_fields["pid"]).reshape(-1)
    vb = np.asarray(mask).reshape(-1) > 0
    va = np.asarray(new_mask).reshape(-1) > 0
    pb = gpos_before.reshape(-1, 3)[vb][np.argsort(ids_b[vb])]
    pa = gpos_after.reshape(-1, 3)[va][np.argsort(ids_a[va])]
    # compare modulo box
    d = np.abs(pb - pa)
    d = np.minimum(d, 1.0 - d)
    assert d.max() < 1e-6
    # new offsets lie in cell
    off_n = np.asarray(new_off)
    for k in range(3):
        vals = off_n[..., k][np.asarray(new_mask) > 0]
        assert (vals >= -1e-7).all() and (vals < grid.edge_arr[k] + 1e-7).all()


def test_overflow_detection():
    """Cramming too many particles in one cell reports overflow."""
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=8)
    pos = np.full((20, 3), 0.05)  # all in cell 0
    _, mask, _, n_over = bucket_fields(grid, jnp.asarray(pos), {})
    assert int(n_over) == 20 - 8
    assert int(mask.sum()) == 8


def test_build_heuristic():
    grid = CellGrid.build((1.0, 1.0, 1.0), interaction_range=0.1,
                          n_particles=10000)
    assert all(c <= 10 for c in grid.cdim)
    assert grid.K % 8 == 0
    assert grid.K * grid.C >= 10000


def test_build_columns_cost_balanced():
    """n_shards>0 picks an ncx multiple of n_shards minimizing the fullest
    x-slab (partition.c METIS-repartition analog for equal-shard slabs)."""
    rng = np.random.default_rng(17)
    # skewed distribution: 80% of particles in the left third of the box
    n = 20000
    x = np.where(rng.uniform(size=n) < 0.8,
                 rng.uniform(0.0, 0.33, n), rng.uniform(0.33, 1.0, n))
    pos = np.stack([x, rng.uniform(size=n), rng.uniform(size=n)], axis=1)
    g = CellGrid.build_columns((1.0, 1.0, 1.0), interaction_range=0.02,
                               pos=pos, n_shards=4)
    assert g.cdim[0] % 4 == 0 and g.cdim[2] == 1

    def worst(nx):
        ix = np.clip((pos[:, 0] * nx).astype(int), 0, nx - 1)
        return np.bincount(ix, minlength=nx).reshape(4, -1).sum(1).max()

    # chosen ncx is at least as balanced as every other feasible multiple
    best = min(worst(nx) for nx in range(4, 51, 4) if nx >= 3)
    assert worst(g.cdim[0]) == best


def test_build_columns_shards_infeasible():
    with pytest.raises(ValueError):
        CellGrid.build_columns((1.0, 1.0, 1.0), interaction_range=0.4,
                               pos=np.zeros((10, 3)), n_shards=4)


def test_rank_in_run_matches_searchsorted():
    """_rank_in_run (boundary + cummax scan) equals the searchsorted
    definition of rank-within-equal-run on sorted keys — including
    empty runs, a single run, and a trailing sentinel run."""
    from swift_subtask_dev_tpu.grid.cellgrid import _rank_in_run

    rng = np.random.default_rng(5)
    for n, hi in [(1, 1), (17, 3), (1000, 40), (4096, 1)]:
        cell_s = np.sort(rng.integers(0, hi, n))
        first = np.searchsorted(cell_s, cell_s, side="left")
        expect = np.arange(n) - first
        got = np.asarray(_rank_in_run(jnp.asarray(cell_s, jnp.int32)))
        assert np.array_equal(got, expect), (n, hi)
