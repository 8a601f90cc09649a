"""Power spectrum tests: single-mode recovery + Poisson shot noise."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.ops.pm_gravity import PMMeshParams
from swift_subtask_dev_tpu.ops.power_spectrum import power_spectrum


def test_single_mode_recovery():
    """Particles modulated by 1 + A cos(k1 x) give P peaked at k1 with
    P(k1) = A^2 V / 4 (for |delta_k|^2 with delta_k = A/2)."""
    rng = np.random.default_rng(3)
    L = 1.0
    n = 200000
    A = 0.5
    # rejection-sample the modulated density
    x = rng.uniform(0, L, int(n * 2.5))
    keep = rng.uniform(0, 1 + A, len(x)) < 1 + A * np.cos(2 * np.pi * x / L)
    x = x[keep][:n]
    pos = np.stack([x, rng.uniform(0, L, len(x)),
                    rng.uniform(0, L, len(x))], -1).astype(np.float32)
    m = np.ones(len(pos), np.float32)
    pm = PMMeshParams(N=64, box=(L, L, L))
    k, P, nm = power_spectrum(pm, jnp.asarray(pos), jnp.asarray(m))
    k1 = 2 * np.pi / L
    i1 = np.argmin(np.abs(k - k1))
    # shell-total power: the two signal modes (+-k1, weight 1 each) carry
    # |delta_k|^2 = A^2/4 each; the rest of the shell is noise
    shell_total = P[i1] * nm[i1]
    expect_total = 2 * (A / 2) ** 2 * L ** 3
    assert np.isclose(shell_total, expect_total, rtol=0.15), \
        (shell_total, expect_total)
    # higher-k bins are noise-level
    assert (np.abs(P[i1 + 1:10]) < 0.1 * P[i1]).all()


def test_shot_noise_subtraction():
    """Pure Poisson field: P(k) ~ 0 after shot-noise subtraction."""
    rng = np.random.default_rng(4)
    n = 100000
    pos = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    m = np.ones(n, np.float32)
    pm = PMMeshParams(N=32, box=(1.0, 1.0, 1.0))
    k, P, nm = power_spectrum(pm, jnp.asarray(pos), jnp.asarray(m))
    shot = 1.0 / n
    # residual well below the shot level over the usable k range
    assert (np.abs(P[:10]) < 0.5 * shot).all(), P[:10] / shot
