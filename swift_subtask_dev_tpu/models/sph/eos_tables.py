"""Table-based planetary EOS loaders: HM80 and SESAME/ANEOS families.

Real-format readers for the two tabulated planetary EOS families the
reference supports (src/equation_of_state/planetary/hm80.h:75
load_table_HM80, sesame.h:342 load_table_SESAME), with the interpolation
re-implemented as fully vectorised JAX ops:

* **HM80** (Hubbard & MacFarlane 1980): plain-text table of P(rho, u) on
  a REGULAR grid in (log rho, log u).  Lookup is a branchless bilinear
  interpolation of log P with edge extrapolation, exactly mirroring
  HM80_pressure_from_internal_energy (hm80.h:223-268).  Sound speed is
  sqrt(bulk_mod/rho) for condensed materials and the ideal-gas form with
  a pressure floor for the H/He atmosphere (hm80.h:281-301).

* **SESAME / ANEOS / SS08 / custom** (sesame.h): plain-text
  SESAME-format table on an IRREGULAR grid — a 1D density axis plus
  per-density rows of u(rho, T), P(rho, T), c(rho, T), s(rho, T).  The
  u-axis search is therefore per-row (find_value_in_monot_incr_array on
  the row slice, sesame.h:500-503); here that is a vectorised
  rank-in-row count over the gathered rows.  Includes the reference's
  duplicate-knot guards and the below-minimum-u clamp (sesame.h:522-559).

Both loaders parse the EXACT shipped file formats (headers, date stamps,
row layout) so the reference's downloaded tables
(examples/Planetary/EoSTables/, get_eos_tables.sh) drop in unchanged.
Tables are in SI; `in_internal(...)` converts to the run's unit system
like convert_units_HM80 / convert_units_SESAME.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Tuple

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


def _tokens(path: str, skip_lines: int):
    """Whitespace tokens of a text table after its header lines."""
    with open(path) as f:
        lines = f.readlines()
    body = " ".join(lines[skip_lines:])
    return body.split()


# ---------------------------------------------------------------------------
# HM80
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HM80Table:
    """P(rho, u) on a regular (log rho, log u) grid — hm80.h:43-49.

    All values in the CALLER's unit system (load in SI, then
    ``in_internal``). ``log_P`` is natural-log pressure, (num_rho, num_u).
    """

    log_rho_min: float
    log_rho_max: float
    num_rho: int
    log_u_min: float
    log_u_max: float
    num_u: int
    log_P: Tuple  # nested tuple (num_rho, num_u) — hashable for jit
    bulk_mod: float = 0.0          # set_HM80_* (hm80.h:52-70)
    P_min_for_c_min: float = 0.0
    gamma: float = 5.0 / 3.0

    @property
    def log_rho_step(self):
        return (self.log_rho_max - self.log_rho_min) / (self.num_rho - 1)

    @property
    def log_u_step(self):
        return (self.log_u_max - self.log_u_min) / (self.num_u - 1)

    def in_internal(self, rho_to_si: float, u_to_si: float,
                    P_from_si: float) -> "HM80Table":
        """convert_units_HM80 (hm80.h:148-177): shift the log axes and
        the log-P table by the unit-system ratios."""
        lp = np.asarray(self.log_P, np.float64) + np.log(P_from_si)
        return replace(
            self,
            log_rho_min=self.log_rho_min - np.log(rho_to_si),
            log_rho_max=self.log_rho_max - np.log(rho_to_si),
            log_u_min=self.log_u_min - np.log(u_to_si),
            log_u_max=self.log_u_max - np.log(u_to_si),
            log_P=tuple(map(tuple, lp)),
            bulk_mod=self.bulk_mod * P_from_si,
            P_min_for_c_min=self.P_min_for_c_min * P_from_si)


def load_hm80(path: str, bulk_mod: float = 0.0,
              P_min_for_c_min: float = 0.0,
              gamma: float = 5.0 / 3.0) -> HM80Table:
    """Parse the shipped HM80 text format (hm80.h:75-134): 5 header
    lines, a date stamp, the axis line
    ``log_rho_min log_rho_max num_rho log_u_min log_u_max num_u`` and
    num_rho*num_u pressures in Pa (row-major in rho).  The trailing
    temperature block (same shape) is ignored like the reference ignores
    it. Values stay in SI."""
    toks = _tokens(path, 5)
    # date stamp (hm80.h:104) — presence checked, value not pinned here
    int(toks[0])
    lr0, lr1, nr = float(toks[1]), float(toks[2]), int(toks[3])
    lu0, lu1, nu = float(toks[4]), float(toks[5]), int(toks[6])
    P = np.asarray(toks[7:7 + nr * nu], np.float64).reshape(nr, nu)
    return HM80Table(lr0, lr1, nr, lu0, lu1, nu,
                     tuple(map(tuple, np.log(P))),
                     bulk_mod=bulk_mod, P_min_for_c_min=P_min_for_c_min,
                     gamma=gamma)


def hm80_pressure(rho, u, tab: HM80Table):
    """Vectorised HM80_pressure_from_internal_energy (hm80.h:223-268):
    bilinear in (ln rho, ln u) on ln P with edge extrapolation."""
    lp = jnp.asarray(np.asarray(tab.log_P, np.float32))
    log_rho = jnp.log(jnp.maximum(rho, 1e-38))
    log_u = jnp.log(jnp.maximum(u, 1e-38))
    inv_dr = 1.0 / tab.log_rho_step
    inv_du = 1.0 / tab.log_u_step
    ir = jnp.floor((log_rho - tab.log_rho_min) * inv_dr)
    iu = jnp.floor((log_u - tab.log_u_min) * inv_du)
    ir = jnp.clip(ir, 0, tab.num_rho - 2).astype(jnp.int32)
    iu = jnp.clip(iu, 0, tab.num_u - 2).astype(jnp.int32)
    fr = (log_rho - tab.log_rho_min - ir * tab.log_rho_step) * inv_dr
    fu = (log_u - tab.log_u_min - iu * tab.log_u_step) * inv_du
    p00 = lp[ir, iu]
    p01 = lp[ir, iu + 1]
    p10 = lp[ir + 1, iu]
    p11 = lp[ir + 1, iu + 1]
    logP = (1 - fr) * ((1 - fu) * p00 + fu * p01) \
        + fr * ((1 - fu) * p10 + fu * p11)
    return jnp.where(u <= 0.0, 0.0, jnp.exp(logP))


def hm80_soundspeed(rho, u, tab: HM80Table):
    """hm80.h:281-301: sqrt(K/rho) when a bulk modulus is set (ice,
    rock), else ideal-gas cs from the interpolated P with the
    P_min_for_c_min floor (HHe)."""
    rho_s = jnp.maximum(rho, 1e-38)
    if tab.bulk_mod != 0.0:
        return jnp.sqrt(jnp.float32(tab.bulk_mod) / rho_s)
    P = hm80_pressure(rho, u, tab)
    P = jnp.maximum(P, jnp.float32(tab.P_min_for_c_min))
    return jnp.sqrt(jnp.float32(tab.gamma) * P / rho_s)


# ---------------------------------------------------------------------------
# SESAME
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SESAMETable:
    """SESAME-format irregular table (sesame.h:40-55): a density axis
    ``log_rho`` (num_rho,) plus per-density rows ``log_u``/``P``/``c``
    (num_rho, num_T).  Natural logs; caller's units."""

    log_rho: Tuple            # (num_rho,)
    log_u: Tuple              # (num_rho, num_T)
    P: Tuple                  # (num_rho, num_T)
    c: Tuple                  # (num_rho, num_T)

    def in_internal(self, rho_to_si: float, u_to_si: float,
                    P_from_si: float) -> "SESAMETable":
        """convert_units_SESAME (sesame.h:305-355); the speed unit is
        the square root of the specific-energy unit."""
        c_from_si = 1.0 / np.sqrt(u_to_si)
        return SESAMETable(
            log_rho=tuple(np.asarray(self.log_rho, np.float64)
                          - np.log(rho_to_si)),
            log_u=tuple(map(tuple, np.asarray(self.log_u, np.float64)
                            - np.log(u_to_si))),
            P=tuple(map(tuple, np.asarray(self.P, np.float64)
                        * P_from_si)),
            c=tuple(map(tuple, np.asarray(self.c, np.float64)
                        * c_from_si)))


def load_sesame(path: str) -> SESAMETable:
    """Parse the shipped SESAME text format (sesame.h:330-439): 12
    header lines, version date, ``num_rho num_T``, the density axis
    (kg/m^3), the temperature axis (ignored, like the reference), then
    num_rho*num_T rows of ``u P c s`` (SI), T-major with rho varying
    fastest.  The first rho=0 and T=0 rows/columns are dropped
    (sesame.h:373-376).  Values stay in SI."""
    toks = _tokens(path, 12)
    int(toks[0])                             # version date
    nr, nT = int(toks[1]), int(toks[2])
    i = 3
    rho = np.asarray(toks[i:i + nr], np.float64)
    i += nr
    i += nT                                  # temperature axis ignored
    body = np.asarray(toks[i:i + 4 * nr * nT], np.float64) \
        .reshape(nT, nr, 4)                  # (T, rho, [u P c s])
    # drop the rho=0 column and T=0 row like the reference (num--, and
    # the ignored first elements in each read loop)
    rho = rho[1:]
    body = body[1:, 1:, :]
    u = body[..., 0].T                       # (num_rho-1, num_T-1)
    P = body[..., 1].T
    c = body[..., 2].T
    u = np.where(u <= 0, 1e-20, u)           # u_tiny guard (sesame.h:286)
    c = np.where(c <= 0, 1e-20, c)
    # Enforce monotonically increasing u along each rho row, sweeping
    # from high T downward (sesame.h:245-260): real ANEOS/SESAME tables
    # have slightly non-monotonic u at low T, which would break
    # _row_search's rank-count bracket.
    for j in range(u.shape[1] - 2, -1, -1):
        u[:, j] = np.minimum(u[:, j], u[:, j + 1] * (1.0 - 1e-12))
    return SESAMETable(log_rho=tuple(np.log(rho)),
                       log_u=tuple(map(tuple, np.log(u))),
                       P=tuple(map(tuple, P)),
                       c=tuple(map(tuple, c)))


def _row_search(rows, v):
    """Per-row find_value_in_monot_incr_array (sesame.h utilities):
    rows (N, nT) gathered per particle, v (N,) — index of the knot
    interval, clipped to [0, nT-2]."""
    nT = rows.shape[-1]
    idx = jnp.sum(rows <= v[..., None], axis=-1) - 1
    return jnp.clip(idx, 0, nT - 2)


def _sesame_bilinear(rho, u, tab: SESAMETable, vals):
    """Shared irregular-grid bilinear machinery of
    SESAME_pressure/soundspeed_from_internal_energy (sesame.h:480-600):
    returns interpolated ``vals`` (a (num_rho, num_T) device array)."""
    log_rho_ax = jnp.asarray(np.asarray(tab.log_rho, np.float32))
    log_u_tab = jnp.asarray(np.asarray(tab.log_u, np.float32))
    nr = log_rho_ax.shape[0]
    log_rho = jnp.log(jnp.maximum(rho, 1e-38))
    log_u = jnp.log(jnp.maximum(u, 1e-38))

    ir = jnp.clip(jnp.sum(log_rho_ax <= log_rho[..., None], axis=-1) - 1,
                  0, nr - 2)
    row1 = log_u_tab[ir]                     # (..., num_T)
    row2 = log_u_tab[ir + 1]
    iu1 = _row_search(row1, log_u)
    iu2 = _row_search(row2, log_u)

    def take(arr, r, c):
        return arr[r, c]

    dr = log_rho_ax[ir + 1] - log_rho_ax[ir]
    fr = jnp.where(dr != 0, (log_rho - log_rho_ax[ir])
                   / jnp.where(dr != 0, dr, 1.0), 1.0)
    u11 = take(log_u_tab, ir, iu1)
    u12 = take(log_u_tab, ir, iu1 + 1)
    u21 = take(log_u_tab, ir + 1, iu2)
    u22 = take(log_u_tab, ir + 1, iu2 + 1)
    du1 = u12 - u11
    du2 = u22 - u21
    fu1 = jnp.where(du1 != 0, (log_u - u11)
                    / jnp.where(du1 != 0, du1, 1.0), 1.0)
    fu2 = jnp.where(du2 != 0, (log_u - u21)
                    / jnp.where(du2 != 0, du2, 1.0), 1.0)

    v1 = take(vals, ir, iu1)
    v2 = take(vals, ir, iu1 + 1)
    v3 = take(vals, ir + 1, iu2)
    v4 = take(vals, ir + 1, iu2 + 1)
    # below the minimum u at this rho: clamp to the lowest table values
    # (sesame.h:554-559)
    bad = (ir > 0) & ((fu1 < 0) | (fu2 < 0) | (v1 > v2) | (v3 > v4))
    fu1 = jnp.where(bad, 0.0, fu1)
    fu2 = jnp.where(bad, 0.0, fu2)
    return (1 - fr) * ((1 - fu1) * v1 + fu1 * v2) \
        + fr * ((1 - fu2) * v3 + fu2 * v4)


def sesame_pressure(rho, u, tab: SESAMETable):
    """SESAME_pressure_from_internal_energy (sesame.h:480-575)."""
    P = jnp.asarray(np.asarray(tab.P, np.float32))
    out = _sesame_bilinear(rho, u, tab, P)
    return jnp.where(u <= 0.0, 0.0, jnp.maximum(out, 0.0))


def sesame_soundspeed(rho, u, tab: SESAMETable):
    """SESAME_soundspeed_from_internal_energy (same machinery on c)."""
    c = jnp.asarray(np.asarray(tab.c, np.float32))
    out = _sesame_bilinear(rho, u, tab, c)
    return jnp.maximum(out, 1e-20)


# material-id → (family, default bulk_mod/P_min) per set_HM80_* and the
# SESAME id table (equation_of_state.h:108-148, hm80.h:52-70)
HM80_DEFAULTS = {
    200: dict(bulk_mod=0.0, P_min_for_c_min=1e3),      # HHe
    201: dict(bulk_mod=2.0e9, P_min_for_c_min=0.0),    # ice
    202: dict(bulk_mod=3.49e10, P_min_for_c_min=0.0),  # rock
}
