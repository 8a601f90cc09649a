"""FOF tests — port of the reference's FOF validation (fof.c)."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.grid import CellGrid, bucket_fields
from swift_subtask_dev_tpu.ops.fof import fof_labels, group_catalogue


def test_two_blobs_and_field():
    rng = np.random.default_rng(11)
    ell = 0.02
    # blob A: 100 particles in a tight ball; blob B: 60; field: 40 isolated
    a = 0.3 + rng.normal(0, 0.004, (80, 3))
    b = np.array([0.7, 0.7, 0.7]) + rng.normal(0, 0.004, (50, 3))
    # chain linking: blob A gets a chain of particles spaced < ell
    chain = np.stack([0.3 + np.arange(10) * 0.015,
                      np.full(10, 0.3), np.full(10, 0.3)], -1)
    field = rng.uniform(0, 1, (40, 3))  # mostly isolated
    pos = np.concatenate([a, b, chain, field])

    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(8, 8, 8), K=128)
    f, mask, off, nov = bucket_fields(grid, jnp.asarray(pos), {})
    assert int(nov) == 0
    labels, nsweeps = fof_labels(grid, mask, off, ell)
    cat = group_catalogue(np.asarray(labels), np.asarray(mask), min_size=20)
    sizes = cat["group_sizes"]
    assert cat["n_groups"] == 2, sizes
    # blob A + chain linked together (chain starts at blob A's centre)
    assert sizes[0] >= 85
    assert 45 <= sizes[1] <= 55
    assert int(nsweeps) < 50


def test_all_linked_single_group():
    """A dense lattice with l > spacing forms one group."""
    from swift_subtask_dev_tpu.ics import cubic_lattice
    pos = cubic_lattice((8, 8, 8), (1.0, 1.0, 1.0))
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=64)
    f, mask, off, _ = bucket_fields(grid, jnp.asarray(pos), {})
    labels, n = fof_labels(grid, mask, off, 0.2)
    cat = group_catalogue(np.asarray(labels), np.asarray(mask), min_size=20)
    assert cat["n_groups"] == 1
    assert cat["group_sizes"][0] == len(pos)
