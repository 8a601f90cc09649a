"""External gravity potentials — the reference's src/potential/ stack.

The reference compiles one of 11 external potentials (configure.ac,
potential/*/potential.h).  Here they are runtime-selectable pure
functions; each returns (acceleration (.., 3), potential (..,)) given
absolute positions, plus a timestep criterion matching
external_gravity_timestep.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

F32 = jnp.float32


@dataclass(frozen=True)
class PointMass:
    """potential/point_mass: a = -G M r / |r|^3 (softened)."""

    G: float
    M: float
    centre: Tuple[float, float, float]
    softening: float = 0.0

    def __call__(self, pos):
        d = pos - jnp.asarray(self.centre, F32)
        r2 = jnp.sum(d * d, -1) + self.softening ** 2
        r = jnp.sqrt(r2)
        acc = -self.G * self.M / (r2 * r)
        return acc[..., None] * d, -self.G * self.M / r


@dataclass(frozen=True)
class IsothermalPotential:
    """potential/isothermal: v_rot^2 = const rotation curve."""

    v_rot: float
    centre: Tuple[float, float, float]
    softening: float = 0.0

    def __call__(self, pos):
        d = pos - jnp.asarray(self.centre, F32)
        r2 = jnp.sum(d * d, -1) + self.softening ** 2
        acc = -self.v_rot ** 2 / r2
        return acc[..., None] * d, 0.5 * self.v_rot ** 2 * jnp.log(r2)


@dataclass(frozen=True)
class Hernquist:
    """potential/hernquist: phi = -G M / (r + a)."""

    G: float
    M: float
    a: float
    centre: Tuple[float, float, float]

    def __call__(self, pos):
        d = pos - jnp.asarray(self.centre, F32)
        r = jnp.sqrt(jnp.sum(d * d, -1) + 1e-30)
        acc = -self.G * self.M / (r * (r + self.a) ** 2)
        return acc[..., None] * d, -self.G * self.M / (r + self.a)


@dataclass(frozen=True)
class NFW:
    """potential/nfw: Navarro-Frenk-White halo."""

    G: float
    M_200: float
    R_200: float
    c: float
    centre: Tuple[float, float, float]

    def __call__(self, pos):
        rs = self.R_200 / self.c
        rho0_fac = self.G * self.M_200 / (
            jnp.log(1 + self.c) - self.c / (1 + self.c))
        d = pos - jnp.asarray(self.centre, F32)
        r = jnp.sqrt(jnp.sum(d * d, -1) + 1e-30)
        x = r / rs
        m_enc = rho0_fac * (jnp.log(1 + x) - x / (1 + x))
        acc = -m_enc / (r * r * r)
        pot = -rho0_fac * jnp.log(1 + x) / r
        return acc[..., None] * d, pot


@dataclass(frozen=True)
class ConstantField:
    """potential/constant: uniform acceleration (e.g. a gravity slab)."""

    g: Tuple[float, float, float]

    def __call__(self, pos):
        a = jnp.broadcast_to(jnp.asarray(self.g, F32), pos.shape)
        return a, -jnp.sum(pos * jnp.asarray(self.g, F32), -1)


def external_gravity_timestep(acc, eta: float, eps: float):
    """dt = sqrt(2 eta eps / |a|) (external potential timestep criterion)."""
    a_norm = jnp.sqrt(jnp.sum(acc ** 2, -1))
    return jnp.sqrt(2.0 * eta * eps / jnp.maximum(a_norm, 1e-30))


POTENTIALS = {
    "point-mass": PointMass,
    "isothermal": IsothermalPotential,
    "hernquist": Hernquist,
    "nfw": NFW,
    "constant": ConstantField,
}
