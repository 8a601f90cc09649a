"""Occupancy re-grid trigger — the TPU analog of the reference's
load-imbalance repartition (engine.c:1781, partition.c).

Under shard_map/GSPMD every device computes the same padded shapes, so
live-count imbalance is free; the real cost is the global per-cell
capacity K outgrowing the distribution (masked-but-computed lanes).
The engine watches the fullest live cell (diag['k_max_live']) and
re-grids when the tiles are mostly padding; the overflow direction is
the existing RegridNeeded path (tools/collapse_demo.py).
"""

import numpy as np

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams


def _engine(K, trigger, cooldown=0):
    ic = uniform_box_ic(n=10, jitter=0.1, seed=5)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    grid = CellGrid(box=ic["box"], cdim=(3, 3, 3), K=K)
    grid.validate_range(float(ic["h"].max() * P.kernel.gamma * 1.05))
    eng = Engine(grid, P,
                 EngineConfig(dt_max=2e-4,
                              regrid_shrink_trigger=trigger,
                              regrid_cooldown=cooldown),
                 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    return eng, ic


def test_shrink_regrid_fires_on_padded_tiles():
    # 1000 particles over 27 cells: ~40 live/cell in tiles of K=512 —
    # > 92% padding, the dispersed-remnant regime
    eng, ic = _engine(K=512, trigger=0.5, cooldown=0)
    n0 = int((np.asarray(eng.state["mask"]) > 0).sum())
    eng.step()
    assert getattr(eng, "n_shrink_regrids", 0) == 1
    assert eng.grid.K < 512 // 2, f"K still {eng.grid.K}"
    # no particles lost, engine keeps stepping on the tight grid
    assert int((np.asarray(eng.state["mask"]) > 0).sum()) == n0
    eng.step()
    assert getattr(eng, "n_shrink_regrids", 0) == 1  # no re-fire


def test_shrink_regrid_respects_cooldown_and_fit():
    # well-fitted tiles never shrink
    eng, _ = _engine(K=128, trigger=0.5, cooldown=0)
    eng.step()
    assert getattr(eng, "n_shrink_regrids", 0) == 0

    # padded tiles but a long cooldown: engine start counts as the last
    # re-grid, so nothing fires within the first `cooldown` steps
    eng2, _ = _engine(K=512, trigger=0.5, cooldown=100)
    eng2.step()
    eng2.step()
    assert getattr(eng2, "n_shrink_regrids", 0) == 0


def test_slab_split_rebalances_clustered_on_regrid():
    """Measured-count slab balancing (partition.c:1033 analog): on a
    clustered IC the builder picks the (ncx, x_roll) pair minimizing
    the fullest x-slab, and Engine.regrid — which re-invokes the
    builder with the LIVE positions — re-balances as clustering
    develops."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n_shards = 4
    # two heavy clusters that BOTH land in naive shard 0 ([0, 0.25));
    # a rolled boundary between them splits the load — the case where
    # boundary PHASE is the whole game
    n_bg, n_cl = 4000, 2000
    pos = np.concatenate([
        rng.uniform(0, 1, (n_bg, 3)),
        np.mod(np.array([0.10, 0.5, 0.5])
               + rng.normal(0, 0.015, (n_cl, 3)), 1.0),
        np.mod(np.array([0.20, 0.3, 0.3])
               + rng.normal(0, 0.015, (n_cl, 3)), 1.0)])
    reach = 0.06

    grid = CellGrid.build_columns((1.0, 1.0, 1.0), reach, pos,
                                  n_shards=n_shards)
    ncx = grid.cdim[0]

    def shard_counts(roll):
        ix = np.clip((np.mod(pos[:, 0], 1.0) * ncx).astype(np.int64),
                     0, ncx - 1)
        per_col = np.roll(np.bincount(ix, minlength=ncx), roll)
        return per_col.reshape(n_shards, -1).sum(axis=1)

    worst_naive = shard_counts(0).max()
    worst_chosen = shard_counts(grid.x_roll).max()
    mean = len(pos) / n_shards
    assert worst_chosen <= worst_naive
    # naive phase: both clusters in shard 0 -> ~2.5x the mean; the
    # measured-count roll separates them (~1.6x)
    assert worst_naive / mean > 2.0
    assert worst_chosen / mean < 1.8

    # bucketing + reconstruction round-trips under the roll
    from swift_subtask_dev_tpu.grid.cellgrid import (bucket_fields,
                                                     global_positions)
    out, mask, off, nov = bucket_fields(grid, jnp.asarray(pos),
                                        {"pid": jnp.arange(len(pos),
                                                           dtype=jnp.float32)},
                                        zsort=True)
    assert int(nov) == 0
    gp = global_positions(grid, off)
    msk = np.asarray(mask) > 0
    pid = np.asarray(out["pid"])[msk].astype(np.int64)
    err = np.abs(gp[msk] - np.mod(pos, 1.0)[pid])
    err = np.minimum(err, 1.0 - err)
    assert float(err.max()) < 1e-5
