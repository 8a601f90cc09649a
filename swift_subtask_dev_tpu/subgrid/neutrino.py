"""Neutrino delta-f particles (massive-neutrino perturbations).

Reference: src/neutrino/Default/ (neutrino.h:36-52, fermi_dirac.c):
each neutrino particle carries a momentum magnitude SAMPLED from the
relativistic Fermi-Dirac distribution (deterministically from its ID,
fermi_dirac.c neutrino_seed_to_fermi_dirac), and every step its delta-f
statistical weight is recomputed as

    w = 1 - f̄(p_current) / f̄(p_sampled),   f̄(p) ∝ 1/(e^{p/kT} + 1)

so an UNPERTURBED neutrino (current momentum == sampled momentum)
carries zero weight: the enormous thermal shot noise of the neutrino
particle load cancels analytically and only the gravitationally induced
perturbation sources the PM mesh (Elbers et al. 2021).  Neutrinos are
MESH-ONLY gravity sources/receivers (the reference deposits weighted
mass in the mesh and skips them in the tree).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

KB_EV = 8.617333262e-5      # Boltzmann constant [eV/K]
T_NU_0_K = 1.9517578        # T_nu0 = 0.71599 * 2.7255 K


def _fd_cdf_table(n_x: int = 4096, x_max: float = 25.0):
    """CDF of the FD momentum distribution x^2/(e^x+1) (fermi_dirac.c
    tabulated inverse transform)."""
    x = np.linspace(0.0, x_max, n_x)
    pdf = x ** 2 / (np.exp(np.minimum(x, 80.0)) + 1.0)
    cdf = np.concatenate([[0.0], np.cumsum(0.5 * (pdf[1:] + pdf[:-1])
                                           * np.diff(x))])
    return x, cdf / cdf[-1]


_FD_X, _FD_CDF = _fd_cdf_table()


@dataclass(frozen=True)
class NeutrinoModel:
    """Neutrino:Default parameters in internal units.

    ``v_to_y`` converts a comoving internal velocity magnitude times the
    scale factor into the dimensionless momentum y = p c /(k T_nu0):
    y = a |v| m_nu c / (k T_nu0 c^2) * c — precomputed on the host.
    """

    m_nu_eV: float = 0.3
    v_to_y: float = 1.0

    @staticmethod
    def from_params(params, units, m_nu_eV: float = None) -> "NeutrinoModel":
        m = m_nu_eV if m_nu_eV is not None else params.opt_float(
            "Neutrino", "m_nu_eV", 0.3)
        c_int = 2.99792458e10 * units.from_cgs("velocity")
        kT0 = KB_EV * T_NU_0_K          # eV
        # y = (m c^2 [eV]) * (v/c) / kT0
        return NeutrinoModel(m_nu_eV=m, v_to_y=m / kT0 / c_int)

    # --- sampling ----------------------------------------------------------
    def sample_y(self, pid):
        """Deterministic FD momentum magnitude per particle ID
        (neutrino_seed_to_fermi_dirac): inverse-CDF of an ID-hashed
        uniform."""
        key = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(0x6e75), i))(
                jnp.asarray(pid, jnp.uint32).reshape(-1))
        u = jax.vmap(lambda k: jax.random.uniform(k, ()))(key)
        y = jnp.interp(u, jnp.asarray(_FD_CDF, F32),
                       jnp.asarray(_FD_X, F32))
        return y.reshape(jnp.asarray(pid).shape)

    def thermal_velocities(self, pid, a: float, rng_dirs=None):
        """IC helper: isotropic FD velocities matching sample_y (host)."""
        y = np.asarray(self.sample_y(jnp.asarray(pid)))
        v_mag = y / self.v_to_y / a
        n = len(np.atleast_1d(y))
        rng = np.random.default_rng(12345) if rng_dirs is None else rng_dirs
        dirs = rng.normal(size=(n, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        return v_mag.reshape(-1, 1) * dirs

    # --- per-step weights --------------------------------------------------
    def weights(self, v_full, mask, y0, a):
        """delta-f weights w = 1 - f̄(y_cur)/f̄(y_0) (neutrino.h:36)."""
        v = jnp.sqrt(jnp.sum(v_full * v_full, -1))
        y_cur = v * jnp.float32(self.v_to_y) * jnp.float32(a)
        # f̄ ∝ 1/(e^y + 1); the ratio is computed log-space safe
        log_ratio = jnp.log1p(jnp.exp(-jnp.minimum(y0, 60.0))) \
            - jnp.log1p(jnp.exp(-jnp.minimum(y_cur, 60.0))) \
            + (y0 - y_cur)
        # f̄(cur)/f̄(0) = (e^{y0}+1)/(e^{yc}+1) = exp(y0-yc) * (1+e^-y0)/(1+e^-yc)
        ratio = jnp.exp(jnp.clip(log_ratio, -60.0, 60.0))
        w = 1.0 - ratio
        return jnp.where(mask > 0, w, 0.0)
