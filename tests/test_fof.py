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


def test_group_properties():
    """Mass / periodic CoM / velocity per group (fof.c group props)."""
    from swift_subtask_dev_tpu.ops.fof import group_catalogue
    # two groups straddling the periodic boundary
    labels = np.array([[5, 5, 5, 9, 9, 0]])
    mask = np.array([[1, 1, 1, 1, 1, 0]], np.float32)
    m = np.array([[1.0, 2.0, 1.0, 3.0, 1.0, 7.0]])
    pos = np.array([[[0.95, 0.5, 0.5],
                     [0.05, 0.5, 0.5],    # wraps: group CoM near 0.0
                     [0.99, 0.5, 0.5],
                     [0.4, 0.4, 0.4],
                     [0.5, 0.4, 0.4],
                     [0.0, 0.0, 0.0]]])
    v = np.zeros((1, 6, 3))
    v[0, 3] = (1.0, 0, 0)
    cat = group_catalogue(labels, mask, min_size=2, m=m, pos=pos, v=v,
                          box=(1.0, 1.0, 1.0))
    assert cat["n_groups"] == 2
    # rank 0 = size-3 group (m=4), rank 1 = size-2 (m=4)
    assert np.allclose(cat["group_mass"], [4.0, 4.0])
    com0 = cat["group_com"][0]
    # periodic CoM of (0.95 m1, 0.05 m2, 0.99 m1): near 0.01 = (0.95+2*1.05+0.99)/4 mod 1
    assert abs(((com0[0] - 0.01) + 0.5) % 1.0 - 0.5) < 1e-6
    assert np.allclose(cat["group_com"][1], [0.425, 0.4, 0.4], atol=1e-9)
    assert np.allclose(cat["group_vel"][1], [0.75, 0, 0])
