"""Equations of state.

Ideal-gas gamma-law EOS matching the reference (src/equation_of_state/
ideal_gas/equation_of_state.h); the adiabatic index is a compile-time choice
there (configure.ac) and a construction-time constant here.  Isothermal EOS
included as well (reference src/equation_of_state/isothermal/).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class IdealGas:
    """gamma-law EOS; all quantities comoving unless stated otherwise."""

    gamma: float = 5.0 / 3.0

    @property
    def gamma_minus_one(self) -> float:
        return self.gamma - 1.0

    # u <-> P <-> A (entropic function) conversions, as in the reference.
    def pressure_from_internal_energy(self, rho, u):
        return self.gamma_minus_one * rho * u

    def internal_energy_from_pressure(self, rho, P):
        return P / (self.gamma_minus_one * rho)

    def soundspeed_from_pressure(self, rho, P):
        return jnp.sqrt(self.gamma * P / rho)

    def soundspeed_from_internal_energy(self, rho, u):
        return jnp.sqrt(self.gamma * self.gamma_minus_one * u)

    def entropy_from_internal_energy(self, rho, u):
        return self.gamma_minus_one * u * rho ** (1.0 - self.gamma)

    def internal_energy_from_entropy(self, rho, A):
        return A * rho ** self.gamma_minus_one / self.gamma_minus_one

    def pressure_from_entropy(self, rho, A):
        return A * rho ** self.gamma


@dataclass(frozen=True)
class Isothermal:
    """Fixed thermal energy EOS (reference isothermal scheme)."""

    u_const: float
    gamma: float = 5.0 / 3.0

    def pressure_from_internal_energy(self, rho, u):
        return (self.gamma - 1.0) * rho * self.u_const

    def soundspeed_from_internal_energy(self, rho, u):
        return jnp.sqrt(self.gamma * (self.gamma - 1.0) * self.u_const)
