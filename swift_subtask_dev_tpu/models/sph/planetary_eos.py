"""Multi-material planetary equations of state.

TPU-native re-design of the reference's planetary EOS layer
(src/equation_of_state/planetary/equation_of_state.h): per-particle
material IDs select between EOS families.  The reference branches per
particle; here each family (ideal gas, Tillotson) is evaluated ONCE over
the whole (C, K) tile — branchless, fully vectorized on the VPU — and a
`jnp.where` cascade selects the right answer per particle.  Material
parameters live in a tiny table gathered per particle (a handful of rows;
the gather is from registers, not HBM).

Material IDs follow the reference convention (equation_of_state.h:47):
``mat_id = type * 100 + unit``, with type 0 = ideal gas, 1 = Tillotson,
2 = HM80, 3 = SESAME (4 = ANEOS, 9 = custom, both SESAME-format).  The
table families read the reference's shipped file formats via
``eos_tables.load_hm80``/``load_sesame`` (the data files themselves are
downloaded by get_eos_tables.sh); requesting a table id without its
table raises at construction.

Tillotson parameters (tillotson.h:50-118) are defined in SI and converted
to internal units at construction, mirroring convert_units_Til
(tillotson.h:120-140).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

# --- reference material ids (equation_of_state.h:77-136) -------------------
ID_IDG_DEF = 0
ID_TIL_IRON = 100
ID_TIL_GRANITE = 101
ID_TIL_WATER = 102
ID_TIL_BASALT = 103

# Tillotson parameter sets in SI units, (rho_0, a, b, A, B, u_0, u_iv,
# u_cv, alpha, beta, eta_min, eta_zero, P_min) — tillotson.h:50-118.
_TIL_SI: Dict[int, Tuple[float, ...]] = {
    ID_TIL_IRON: (7800.0, 0.5, 1.5, 1.28e11, 1.05e11, 9.5e6, 2.4e6,
                  8.67e6, 5.0, 5.0, 0.0, 0.0, 0.0),
    ID_TIL_GRANITE: (2680.0, 0.5, 1.3, 1.8e10, 1.8e10, 1.6e7, 3.5e6,
                     1.8e7, 5.0, 5.0, 0.0, 0.0, 0.0),
    ID_TIL_WATER: (998.0, 0.7, 0.15, 2.18e9, 1.325e10, 7.0e6, 4.19e5,
                   2.69e6, 10.0, 5.0, 0.925, 0.875, 0.0),
    ID_TIL_BASALT: (2700.0, 0.5, 1.5, 2.67e10, 2.67e10, 4.87e8, 4.72e6,
                    1.82e7, 5.0, 5.0, 0.0, 0.0, 0.0),
}

_TIL_FIELDS = ("rho_0", "a", "b", "A", "B", "u_0", "u_iv", "u_cv",
               "alpha", "beta", "eta_min", "eta_zero", "P_min")


def _til_pressure(rho, u, m):
    """Tillotson P(rho, u) (Til_pressure_from_internal_energy,
    tillotson.h:182-230) with the cold/expanded/hybrid regions selected
    branchlessly."""
    eta = rho / m["rho_0"]
    eta_safe = jnp.maximum(eta, 1e-10)
    eta_sq = eta * eta
    mu = eta - 1.0
    nu = 1.0 / eta_safe - 1.0
    w = u / (m["u_0"] * jnp.maximum(eta_sq, 1e-20)) + 1.0
    w_inv = 1.0 / w

    # condensed / cold branch, with the low-density taper (eta_zero..eta_min)
    P_c = (m["a"] + m["b"] * w_inv) * rho * u + m["A"] * mu \
        + m["B"] * mu * mu
    taper = (eta - m["eta_zero"]) / jnp.maximum(
        m["eta_min"] - m["eta_zero"], 1e-20)
    P_c = jnp.where(eta < m["eta_zero"], 0.0,
                    jnp.where(eta < m["eta_min"], P_c * taper, P_c))

    # expanded / hot branch
    exp_a = jnp.exp(-m["alpha"] * nu * nu)
    exp_b = jnp.exp(-m["beta"] * nu)
    P_e = m["a"] * rho * u \
        + (m["b"] * rho * u * w_inv + m["A"] * mu * exp_b) * exp_a

    cold = (eta > 1.0) | (u < m["u_iv"])
    hot = (eta < 1.0) & (u > m["u_cv"])
    frac = (u - m["u_iv"]) / jnp.maximum(m["u_cv"] - m["u_iv"], 1e-20)
    P_h = frac * P_e + (1.0 - frac) * P_c
    P = jnp.where(cold, P_c, jnp.where(hot, P_e, P_h))
    return jnp.maximum(P, m["P_min"])


def _til_soundspeed(rho, u, m):
    """Tillotson cs(rho, u) (Til_soundspeed_from_internal_energy,
    tillotson.h:240-300); floored at sqrt(A/rho_0)."""
    rho_0_inv = 1.0 / m["rho_0"]
    rho_safe = jnp.maximum(rho, 1e-20)
    rho_inv = 1.0 / rho_safe
    eta = rho * rho_0_inv
    eta_safe = jnp.maximum(eta, 1e-10)
    eta_sq = eta * eta
    mu = eta - 1.0
    nu = 1.0 / eta_safe - 1.0
    w = u / (m["u_0"] * jnp.maximum(eta_sq, 1e-20)) + 1.0
    w_inv = 1.0 / w
    w_inv_sq = w_inv * w_inv
    exp_b = jnp.exp(-m["beta"] * nu)
    exp_a = jnp.exp(-m["alpha"] * nu * nu)

    P_c = (m["a"] + m["b"] * w_inv) * rho * u + m["A"] * mu \
        + m["B"] * mu * mu
    taper = (eta - m["eta_zero"]) / jnp.maximum(
        m["eta_min"] - m["eta_zero"], 1e-20)
    P_c = jnp.where(eta < m["eta_zero"], 0.0,
                    jnp.where(eta < m["eta_min"], P_c * taper, P_c))
    c_sq_c = P_c * rho_inv * (1.0 + m["a"] + m["b"] * w_inv) \
        + m["b"] * (w - 1.0) * w_inv_sq * (2.0 * u - P_c * rho_inv) \
        + rho_inv * (m["A"] + m["B"] * (eta_sq - 1.0))

    P_e = m["a"] * rho * u \
        + (m["b"] * rho * u * w_inv + m["A"] * mu * exp_b) * exp_a
    c_sq_e = P_e * rho_inv * (1.0 + m["a"] + m["b"] * w_inv * exp_a) \
        + (m["b"] * rho * u * w_inv_sq / jnp.maximum(eta_sq, 1e-20)
           * (rho_inv / m["u_0"] * (2.0 * u - P_e * rho_inv)
              + 2.0 * m["alpha"] * nu * w * rho_0_inv)
           + m["A"] * rho_0_inv
           * (1.0 + mu / jnp.maximum(eta_sq, 1e-20)
              * (m["beta"] + 2.0 * m["alpha"] * nu - eta)) * exp_b) * exp_a

    cold = (eta > 1.0) | (u < m["u_iv"])
    hot = (eta < 1.0) & (u > m["u_cv"])
    frac = (u - m["u_iv"]) / jnp.maximum(m["u_cv"] - m["u_iv"], 1e-20)
    c_sq_h = frac * c_sq_e + (1.0 - frac) * c_sq_c
    c_sq = jnp.where(cold, c_sq_c, jnp.where(hot, c_sq_e, c_sq_h))
    c_sq = jnp.maximum(c_sq, m["A"] * rho_0_inv)
    return jnp.sqrt(c_sq)


@dataclass(frozen=True)
class PlanetaryEOS:
    """Material-id–dispatched EOS (equation_of_state.h surface).

    ``materials``: tuple of reference material ids present in the run.
    ``rho_to_si``/``u_to_si``/``P_from_si``: internal→SI density and
    specific-energy factors and SI→internal pressure factor (the analog
    of convert_units_Til); with the defaults the internal system IS SI.
    ``gamma``: adiabatic index for the ideal-gas material.
    """

    materials: Tuple[int, ...] = (ID_IDG_DEF,)
    gamma: float = 5.0 / 3.0
    rho_to_si: float = 1.0
    u_to_si: float = 1.0
    P_from_si: float = 1.0
    # table-based families: {mat_id: HM80Table} / {mat_id: SESAMETable}
    # (eos_tables.load_hm80/load_sesame), already converted to INTERNAL
    # units via .in_internal(rho_to_si, u_to_si, P_from_si).  Passed as
    # ((mat_id, table), ...) tuples so the dataclass stays hashable for
    # jit static args.
    hm80_tables: Tuple = ()
    sesame_tables: Tuple = ()
    # filled in __post_init__: dense row per known Tillotson id.  Excluded
    # from eq/hash — the params object is a jit static arg and the table
    # is a pure function of the compared fields.
    _til_table: Dict[str, np.ndarray] = field(
        default=None, repr=False, compare=False)

    def __post_init__(self):
        tabbed = {mid for mid, _ in self.hm80_tables} \
            | {mid for mid, _ in self.sesame_tables}
        for mid in self.materials:
            t = mid // 100
            if t == 2 and mid not in tabbed:
                raise ValueError(
                    f"material id {mid}: HM80 needs its table — pass "
                    "hm80_tables=((id, eos_tables.load_hm80(path)"
                    ".in_internal(...)),) (EoS:planetary_HM80_*_table_file)")
            if t in (3, 4, 9) and mid not in tabbed:
                raise ValueError(
                    f"material id {mid}: SESAME/ANEOS needs its table — "
                    "pass sesame_tables=((id, eos_tables.load_sesame(path)"
                    ".in_internal(...)),)")
            if t not in (0, 1, 2, 3, 4, 9):
                raise ValueError(f"unknown material id {mid}")
            if t == 1 and mid not in _TIL_SI:
                raise ValueError(f"unknown Tillotson material id {mid}")
        # convert the Tillotson SI table into internal units once
        rows = {k: [] for k in _TIL_FIELDS}
        object.__setattr__(self, "_til_ids",
                           np.array(sorted(_TIL_SI), np.int32))
        # unit conversions (convert_units_Til): rho_0 is a density,
        # a/b/alpha/beta/eta_* dimensionless, A/B/P_min pressures,
        # u_0/u_iv/u_cv specific energies
        conv = {"rho_0": 1.0 / self.rho_to_si,
                "A": self.P_from_si, "B": self.P_from_si,
                "P_min": self.P_from_si,
                "u_0": 1.0 / self.u_to_si, "u_iv": 1.0 / self.u_to_si,
                "u_cv": 1.0 / self.u_to_si}
        for mid in self._til_ids:
            for k, v in zip(_TIL_FIELDS, _TIL_SI[int(mid)]):
                rows[k].append(v * conv.get(k, 1.0))
        object.__setattr__(self, "_til_table",
                           {k: np.asarray(v, np.float32)
                            for k, v in rows.items()})

    # --- per-particle dispatch --------------------------------------------
    def _til_row(self, mat_id):
        """Dense Tillotson row index for each particle (0 for non-Til)."""
        row = jnp.zeros(mat_id.shape, jnp.int32)
        for i, mid in enumerate(self._til_ids):
            row = jnp.where(mat_id == int(mid), i, row)
        return row

    def _til_params(self, mat_id):
        row = self._til_row(mat_id)
        return {k: jnp.asarray(v)[row] for k, v in self._til_table.items()}

    def pressure_from_internal_energy(self, rho, u, mat_id):
        is_til = (mat_id // 100) == 1
        P = (self.gamma - 1.0) * rho * u
        if any(m // 100 == 1 for m in self.materials):
            P = jnp.where(is_til,
                          _til_pressure(rho, u, self._til_params(mat_id)), P)
        if self.hm80_tables or self.sesame_tables:
            from . import eos_tables as et
            for mid, tab in self.hm80_tables:
                P = jnp.where(mat_id == mid,
                              et.hm80_pressure(rho, u, tab), P)
            for mid, tab in self.sesame_tables:
                P = jnp.where(mat_id == mid,
                              et.sesame_pressure(rho, u, tab), P)
        return P

    def soundspeed_from_internal_energy(self, rho, u, mat_id):
        is_til = (mat_id // 100) == 1
        cs = jnp.sqrt(self.gamma * (self.gamma - 1.0)
                      * jnp.maximum(u, 0.0))
        if any(m // 100 == 1 for m in self.materials):
            cs = jnp.where(is_til,
                           _til_soundspeed(rho, u, self._til_params(mat_id)),
                           cs)
        if self.hm80_tables or self.sesame_tables:
            from . import eos_tables as et
            for mid, tab in self.hm80_tables:
                cs = jnp.where(mat_id == mid,
                               et.hm80_soundspeed(rho, u, tab), cs)
            for mid, tab in self.sesame_tables:
                cs = jnp.where(mat_id == mid,
                               et.sesame_soundspeed(rho, u, tab), cs)
        return cs

    def soundspeed_from_pressure(self, rho, P, mat_id, u=None):
        """The scheme calls cs(rho, u) everywhere it can (the reference's
        Planetary hydro does too, hydro.h:696); P-only entry kept for the
        ideal-gas material."""
        if u is not None:
            return self.soundspeed_from_internal_energy(rho, u, mat_id)
        return jnp.sqrt(self.gamma * P / jnp.maximum(rho, 1e-30))
