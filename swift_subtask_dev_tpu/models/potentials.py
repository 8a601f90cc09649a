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


@dataclass(frozen=True)
class HernquistSDMH05:
    """potential/hernquist_sdmh05: Hernquist halo parametrised by
    (M_200, concentration, R_200) following Springel, Di Matteo &
    Hernquist 2005 — the scale length absorbs the NFW-equivalent mass
    profile: a = r_s sqrt(2 (ln(1+c) - c/(1+c))) with r_s = R_200 / c
    (hernquist_sdmh05/potential.h:265)."""

    G: float
    M_200: float
    R_200: float
    c: float
    centre: Tuple[float, float, float]

    def __call__(self, pos):
        import math
        rs = self.R_200 / self.c
        al = rs * math.sqrt(2.0 * (math.log(1.0 + self.c)
                                   - self.c / (1.0 + self.c)))
        return Hernquist(G=self.G, M=self.M_200, a=al,
                         centre=self.centre)(pos)


@dataclass(frozen=True)
class PointMassSoftened:
    """potential/point_mass_softened: Plummer-softened point mass
    a = -G M r / (r^2 + eps^2)^{3/2} (point_mass_softened/potential.h:129)."""

    G: float
    M: float
    centre: Tuple[float, float, float]
    softening: float

    def __call__(self, pos):
        return PointMass(G=self.G, M=self.M, centre=self.centre,
                         softening=self.softening)(pos)


@dataclass(frozen=True)
class NFW_MN:
    """potential/nfw_mn: NFW halo + Miyamoto-Nagai disc
    (nfw_mn/potential.h:40-46).

    halo: rho(r) = rho_0 / ((r/r_s)(1+r/r_s)^2), parametrised by
    (M_200, c, rho_crit) with R_200 = (3 M_200 / (800 pi rho_c))^{1/3};
    disc: phi = -G M_d / sqrt(R^2 + (R_d + sqrt(z^2+Z_d^2))^2).
    """

    G: float
    M_200: float
    c: float
    rho_c: float
    Mdisk: float
    Rdisk: float
    Zdisk: float
    centre: Tuple[float, float, float]

    def __call__(self, pos):
        import math
        R_200 = (3.0 * self.M_200
                 / (4.0 * math.pi * 200.0 * self.rho_c)) ** (1.0 / 3.0)
        rs = R_200 / self.c
        halo = NFW(G=self.G, M_200=self.M_200, R_200=R_200, c=self.c,
                   centre=self.centre)
        acc_h, pot_h = halo(pos)

        d = pos - jnp.asarray(self.centre, F32)
        R2 = d[..., 0] ** 2 + d[..., 1] ** 2
        z = d[..., 2]
        B = jnp.sqrt(z * z + self.Zdisk ** 2)
        RB = self.Rdisk + B
        denom = R2 + RB * RB
        inv32 = 1.0 / (denom * jnp.sqrt(denom))
        GM = self.G * self.Mdisk
        a_xy = -GM * inv32                       # per unit (x, y)
        a_z = -GM * RB * inv32 * z / jnp.maximum(B, 1e-30)
        acc_d = jnp.stack([a_xy * d[..., 0], a_xy * d[..., 1], a_z], -1)
        pot_d = -GM / jnp.sqrt(denom)
        return acc_h + acc_d, pot_h + pot_d


@dataclass(frozen=True)
class DiscPatch:
    """potential/disc_patch: Creasey, Theuns & Bower 2013 hydrostatic
    disc-patch potential, plane-normal along x (disc_patch/potential.h:170):
    a_x = -2 pi G Sigma tanh(dx/b), phi = 2 pi G Sigma b ln cosh(dx/b);
    accelerations truncated 1/2+cos/2 between x_trunc and x_max."""

    G: float
    surface_density: float
    scale_height: float
    x_disc: float
    x_trunc: float = 1e30
    x_max: float = 1e30
    growth_time: float = 0.0

    def __call__(self, pos, t=None):
        import math
        norm = 2.0 * math.pi * self.G * self.surface_density
        b = self.scale_height
        dx = pos[..., 0] - self.x_disc
        adx = jnp.abs(dx)
        x_trans = max(self.x_max - self.x_trunc, 1e-30)
        a_mag = norm * jnp.tanh(adx / b)
        taper = 0.5 + 0.5 * jnp.cos(
            jnp.pi * jnp.clip((adx - self.x_trunc) / x_trans, 0.0, 1.0))
        a_mag = jnp.where(adx < self.x_trunc, a_mag,
                          jnp.where(adx < self.x_max, a_mag * taper, 0.0))
        red = 1.0
        if t is not None and self.growth_time > 0:
            red = jnp.minimum(t / self.growth_time, 1.0)
        a_x = -red * a_mag * jnp.sign(dx)
        # log cosh via |x| + log1p(exp(-2|x|)) - log 2 (overflow-safe)
        xb = adx / b
        logcosh = xb + jnp.log1p(jnp.exp(-2.0 * xb)) - math.log(2.0)
        pot = jnp.where(adx < self.x_trunc, red * norm * b * logcosh, 0.0)
        zeros = jnp.zeros_like(a_x)
        return jnp.stack([a_x, zeros, zeros], -1), pot


@dataclass(frozen=True)
class SineWave:
    """potential/sine_wave: 1D sinusoidal potential for hydrostatic-
    balance tests (sine_wave/potential.h:78-92):
    a_x = A sin(2 pi x / L), phi = A L cos(2 pi x / L) / (2 pi)."""

    amplitude: float
    box_len: float = 1.0
    growth_time: float = 0.0

    def __call__(self, pos, t=None):
        import math
        red = 1.0
        if t is not None and self.growth_time > 0:
            red = jnp.minimum(t / self.growth_time, 1.0)
        k = 2.0 * math.pi / self.box_len
        a_x = red * self.amplitude * jnp.sin(k * pos[..., 0])
        pot = red * self.amplitude * jnp.cos(k * pos[..., 0]) / k
        zeros = jnp.zeros_like(a_x)
        return jnp.stack([a_x, zeros, zeros], -1), pot


@dataclass(frozen=True)
class NoPotential:
    """potential/none: no external forces."""

    def __call__(self, pos):
        return jnp.zeros_like(pos), jnp.zeros(pos.shape[:-1], pos.dtype)


def external_gravity_timestep(acc, eta: float, eps: float):
    """dt = sqrt(2 eta eps / |a|) (external potential timestep criterion)."""
    a_norm = jnp.sqrt(jnp.sum(acc ** 2, -1))
    return jnp.sqrt(2.0 * eta * eps / jnp.maximum(a_norm, 1e-30))


POTENTIALS = {
    "point-mass": PointMass,
    "point-mass-softened": PointMassSoftened,
    "isothermal": IsothermalPotential,
    "hernquist": Hernquist,
    "hernquist-sdmh05": HernquistSDMH05,
    "nfw": NFW,
    "nfw-mn": NFW_MN,
    "disc-patch": DiscPatch,
    "sine-wave": SineWave,
    "constant": ConstantField,
    "none": NoPotential,
}


def _centre(params, sec, box):
    """position (+ box/2 unless useabspos) — the shared init idiom
    (e.g. nfw/potential.h:225-236)."""
    pos = params.opt_array(sec, "position", [0.0, 0.0, 0.0])
    if not params.opt_int(sec, "useabspos", 1):
        pos = [p + b / 2.0 for p, b in zip(pos, box)]
    return tuple(float(p) for p in pos)


def potential_from_params(params, phys_const, box, units=None):
    """ExternalPotential factory — the runtime analog of the reference's
    compile-time potential selection (configure.ac --with-ext-potential;
    potential_init_backend in each potential/*/potential.h).

    Scans for the reference's YAML section names and returns
    (potential, timestep_mult, epsilon) or None when no section is
    present.  `box` is the box side lengths (for useabspos=0 centres).
    """
    G = phys_const.const_newton_G

    if params.has("PointMassPotential"):
        sec = "PointMassPotential"
        soft = params.opt_float(sec, "softening", 0.0)
        cls = PointMassSoftened if soft > 0 else PointMass
        kw = dict(G=G, M=params.get_float(sec, "mass"),
                  centre=_centre(params, sec, box))
        if soft > 0:
            kw["softening"] = soft
        return (cls(**kw), params.opt_float(sec, "timestep_mult", 0.03),
                max(soft, 1e-3))
    if params.has("IsothermalPotential"):
        sec = "IsothermalPotential"
        eps = params.opt_float(sec, "epsilon", 0.0)
        return (IsothermalPotential(
                    v_rot=params.get_float(sec, "vrot"),
                    centre=_centre(params, sec, box), softening=eps),
                params.opt_float(sec, "timestep_mult", 0.03),
                max(eps, 1e-3))
    if params.has("HernquistPotential"):
        sec = "HernquistPotential"
        eps = params.opt_float(sec, "epsilon", 1e-3)
        mult = params.opt_float(sec, "timestep_mult", 0.03)
        centre = _centre(params, sec, box)
        if params.opt_float(sec, "mass", 0.0) > 0:
            pot = Hernquist(G=G, M=params.get_float(sec, "mass"),
                            a=params.get_float(sec, "scalelength"),
                            centre=centre)
        else:
            # SDMH05 parametrisation (hernquist/potential.h:236-270)
            c = params.get_float(sec, "concentration")
            M200 = params.get_float(sec, "M200")
            h = params.opt_float(sec, "h", 0.7)
            H0 = h * phys_const.const_reduced_hubble
            R200 = (10.0 * M200 * G * H0) ** (1.0 / 3.0) / (10.0 * H0)
            fd = params.opt_float(sec, "diskfraction", 0.0)
            fb = params.opt_float(sec, "bulgefraction", 0.0)
            pot = HernquistSDMH05(G=G, M_200=M200 * (1.0 - fd - fb),
                                  R_200=R200, c=c, centre=centre)
        return pot, mult, eps
    if params.has("NFW_MNPotential"):
        sec = "NFW_MNPotential"
        return (NFW_MN(G=G,
                       M_200=params.get_float(sec, "M_200"),
                       c=params.get_float(sec, "concentration"),
                       rho_c=params.get_float(sec, "critical_density"),
                       Mdisk=params.get_float(sec, "Mdisk"),
                       Rdisk=params.get_float(sec, "Rdisk"),
                       Zdisk=params.get_float(sec, "Zdisk"),
                       centre=_centre(params, sec, box)),
                params.opt_float(sec, "timestep_mult", 0.03), 1e-3)
    if params.has("NFWPotential"):
        sec = "NFWPotential"
        c = params.get_float(sec, "concentration")
        M200 = params.get_float(sec, "M_200")
        h = params.opt_float(sec, "h", 0.7)
        H0 = h * phys_const.const_reduced_hubble
        R200 = (10.0 * M200 * G * H0) ** (1.0 / 3.0) / (10.0 * H0)
        fd = params.opt_float(sec, "diskfraction", 0.0)
        fb = params.opt_float(sec, "bulgefraction", 0.0)
        eps = params.opt_float(sec, "epsilon", 1e-3)
        return (NFW(G=G, M_200=M200 * (1.0 - fd - fb), R_200=R200, c=c,
                    centre=_centre(params, sec, box)),
                params.opt_float(sec, "timestep_mult", 0.03), eps)
    if params.has("DiscPatchPotential"):
        sec = "DiscPatchPotential"
        b = params.get_float(sec, "scale_height")
        return (DiscPatch(
                    G=G,
                    surface_density=params.get_float(sec,
                                                     "surface_density"),
                    scale_height=b,
                    x_disc=params.get_float(sec, "x_disc"),
                    x_trunc=params.opt_float(sec, "x_trunc", 1e30),
                    x_max=params.opt_float(sec, "x_max", 1e30),
                    growth_time=params.opt_float(sec, "growth_time", 0.0)),
                params.opt_float(sec, "timestep_mult", 0.03), b)
    if params.has("SineWavePotential"):
        sec = "SineWavePotential"
        return (SineWave(
                    amplitude=params.get_float(sec, "amplitude"),
                    box_len=float(box[0]),
                    growth_time=params.opt_float(sec, "growth_time", 0.0)),
                params.opt_float(sec, "timestep_limit", 0.03),
                float(box[0]) / 64.0)
    if params.has("ConstantPotential"):
        sec = "ConstantPotential"
        g = params.get_array(sec, "g_cgs", 3)
        # g_cgs is specified in CGS (constant/potential.h:121) — convert
        # to internal units when a UnitSystem is given
        fac = units.from_cgs("acceleration") if units is not None else 1.0
        return (ConstantField(g=tuple(float(v) * fac for v in g)),
                0.03, 1e-3)
    return None
