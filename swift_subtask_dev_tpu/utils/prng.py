"""Counter-based deterministic per-particle RNG.

The reference derives every stochastic subgrid decision from a counter-based
hash of (particle ID, ti_current, purpose-salt) — src/random.h:162-249 — so
results are reproducible regardless of thread/rank scheduling.  The TPU
equivalent is JAX's native counter-based Threefry: we fold the same three
counters into a key and draw from it.  Vectorized over particles.
"""

from __future__ import annotations

from enum import IntEnum

import jax
import jax.numpy as jnp


class RandomNumberType(IntEnum):
    """Purpose salts (reference random.h:36-66, random_number_* enum)."""

    STAR_FORMATION = 0x7c4865254aec6996 & 0x7FFFFFFF
    STELLAR_FEEDBACK_1 = 0x1640057025733afe & 0x7FFFFFFF
    STELLAR_FEEDBACK_2 = 0x45caec2417d19936 & 0x7FFFFFFF
    STELLAR_FEEDBACK_3 = 0x7aceb68a19d6a361 & 0x7FFFFFFF
    STELLAR_ENRICHMENT = 0x66e525cbdce2da17 & 0x7FFFFFFF
    BH_FEEDBACK = 0x7ab2f937cfd2878f & 0x7FFFFFFF
    BH_SWALLOW = 0x1f1ed0afcae54fe1 & 0x7FFFFFFF
    SNIA_FEEDBACK = 0x1fbd188a3cbd1cac & 0x7FFFFFFF
    GAS_SPLIT = 0x1a6a4b70df7a8dd7 & 0x7FFFFFFF
    MOSAIC = 0x636807e23cdf4fc5 & 0x7FFFFFFF


def unit_interval(ids: jnp.ndarray, ti_current: int,
                  purpose: int) -> jnp.ndarray:
    """Uniform [0,1) per particle, keyed by (id, ti_current, purpose).

    ti_current may exceed 2**31 — split into two i32 folds so the full 57-bit
    timeline participates without device i64.
    """
    ti_lo = int(ti_current) & 0x7FFFFFFF
    ti_hi = (int(ti_current) >> 31) & 0x7FFFFFFF
    base = jax.random.PRNGKey(int(purpose) & 0x7FFFFFFF)
    base = jax.random.fold_in(base, ti_lo)
    base = jax.random.fold_in(base, ti_hi)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        ids.astype(jnp.uint32).reshape(-1))
    u = jax.vmap(lambda k: jax.random.uniform(k, ()))(keys)
    return u.reshape(ids.shape)
