"""SPH smoothing kernels — branchless piecewise polynomials for the VPU.

Provides the same kernel family as the reference (src/kernel_hydro.h:45-200:
cubic/quartic/quintic splines, Wendland C2/C4/C6; coefficients from Dehnen &
Aly 2012 table 1) with the same calling convention:

    ``kernel_deval(u)`` with u = r/h returns (w, dw_du) such that
    W(r, h) = w / h^d  and  dW/dr = dw_du / h^(d+1).

The branch selection of the reference (an indexed coefficient table) becomes
a data-parallel ``jnp.where`` chain / polynomial blend — no divergent control
flow, everything runs as dense VPU ops, identical inside Pallas kernels and
plain XLA.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

HYDRO_DIMENSION = 3.0


@dataclass(frozen=True)
class SPHKernel:
    """A piecewise-polynomial kernel on x = u/gamma in [0, 1].

    coeffs[i] are highest-power-first polynomial coefficients for branch i,
    branch i covering x in [i/ivals, (i+1)/ivals).
    """

    name: str
    gamma: float          # H/h: ratio of support radius to smoothing length
    constant: float       # normalisation (3D)
    coeffs: tuple         # (ivals, degree+1) nested tuples
    ivals: int
    degree: int
    # truncated-power form: w(x) = sum c_k (a_k - x)_+^degree, the classic
    # B-spline representation — ~3x fewer VPU ops than branch-select when
    # available (exactly equal to the piecewise table)
    tp_terms: tuple = ()  # ((a_k, c_k), ...)

    @property
    def gamma_inv(self) -> float:
        return 1.0 / self.gamma

    @property
    def gamma2(self) -> float:
        return self.gamma * self.gamma

    @property
    def root(self) -> float:
        """w at u=0 (W(0,h)·h^d), reference kernel_root."""
        c0 = self.coeffs[0][-1]
        return c0 * self.constant * self.gamma_inv ** 3

    @property
    def norm(self) -> float:
        """Volume normalisation 4/3 pi gamma^3 (reference kernel_norm)."""
        return (4.0 / 3.0) * math.pi * self.gamma ** 3

    def deval(self, u):
        """(w, dw_du) for u = r/h; zero beyond the support u > gamma.

        Vectorized over any array shape; f32 throughout.
        """
        x = u * jnp.float32(self.gamma_inv)
        g3 = jnp.float32(self.constant * self.gamma_inv ** 3)
        g4 = jnp.float32(self.constant * self.gamma_inv ** 4)
        if self.tp_terms:
            w = None
            dw = None
            deg = self.degree
            for a, c in self.tp_terms:
                t = jnp.maximum(jnp.float32(a) - x, 0.0)
                pw = t
                for _ in range(deg - 2):
                    pw = pw * t          # t^(deg-1)
                wt = jnp.float32(c) * (pw * t)
                dwt = jnp.float32(-deg * c) * pw
                w = wt if w is None else w + wt
                dw = dwt if dw is None else dw + dwt
            return w * g3, dw * g4
        if self.ivals == 1:
            # single polynomial on [0, 1) (Wendland family)
            cs = self.coeffs[0]
            wi = jnp.full_like(x, jnp.float32(cs[0]))
            dwi = jnp.zeros_like(x)
            for c in cs[1:]:
                dwi = dwi * x + wi
                wi = wi * x + jnp.float32(c)
            inside = x < 1.0
            w = jnp.where(inside, jnp.maximum(wi, 0.0), 0.0)
            dw = jnp.where(inside, jnp.minimum(dwi, 0.0), 0.0)
            return w * g3, dw * g4
        # Branch index: same clamped-int selection as reference kernel_deval.
        ind = jnp.clip((x * self.ivals).astype(jnp.int32), 0, self.ivals)
        # Evaluate every branch with Horner, select by branch index.
        w = jnp.zeros_like(x)
        dw = jnp.zeros_like(x)
        for i in range(self.ivals + 1):
            cs = self.coeffs[i] if i < self.ivals else (0.0,) * (self.degree + 1)
            wi = jnp.full_like(x, jnp.float32(cs[0]))
            dwi = jnp.zeros_like(x)
            for c in cs[1:]:
                dwi = dwi * x + wi
                wi = wi * x + jnp.float32(c)
            sel = ind == i
            w = jnp.where(sel, wi, w)
            dw = jnp.where(sel, dwi, dw)
        w = jnp.maximum(w, 0.0)
        dw = jnp.minimum(dw, 0.0)
        return w * g3, dw * g4

    def eval(self, u):
        return self.deval(u)[0]


_M1PI = 1.0 / math.pi

CUBIC_SPLINE = SPHKernel(
    name="Cubic spline (M4)",
    gamma=1.825742,
    constant=16.0 * _M1PI,
    ivals=2,
    degree=3,
    coeffs=(
        (3.0, -3.0, 0.0, 0.5),     # 0   < x < 0.5
        (-1.0, 3.0, -3.0, 1.0),    # 0.5 < x < 1
    ),
    tp_terms=((1.0, 1.0), (0.5, -4.0)),
)

QUARTIC_SPLINE = SPHKernel(
    name="Quartic spline (M5)",
    gamma=2.018932,
    constant=15625.0 * _M1PI / 512.0,
    ivals=5,
    degree=4,
    coeffs=(
        (6.0, 0.0, -2.4, 0.0, 0.368),
        (-4.0, 8.0, -4.8, 0.32, 0.352),
        (-4.0, 8.0, -4.8, 0.32, 0.352),
        (1.0, -4.0, 6.0, -4.0, 1.0),
        (1.0, -4.0, 6.0, -4.0, 1.0),
    ),
    tp_terms=((1.0, 1.0), (0.6, -5.0), (0.2, 10.0)),
)

QUINTIC_SPLINE = SPHKernel(
    name="Quintic spline (M6)",
    gamma=2.195775,
    constant=2187.0 * _M1PI / 40.0,
    ivals=3,
    degree=5,
    coeffs=(
        (-10.0, 10.0, 0.0, -2.2222222, 0.0, 0.271604938),
        (5.0, -15.0, 16.666667, -7.77777777, 0.925925, 0.209876543),
        (-1.0, 5.0, -10.0, 10.0, -5.0, 1.0),
    ),
    tp_terms=((1.0, 1.0), (2.0 / 3.0, -6.0), (1.0 / 3.0, 15.0)),
)

WENDLAND_C2 = SPHKernel(
    name="Wendland C2",
    gamma=1.936492,
    constant=21.0 * _M1PI / 2.0,
    ivals=1,
    degree=5,
    coeffs=((4.0, -15.0, 20.0, -10.0, 0.0, 1.0),),
)

WENDLAND_C4 = SPHKernel(
    name="Wendland C4",
    gamma=2.207940,
    constant=495.0 * _M1PI / 32.0,
    ivals=1,
    degree=8,
    coeffs=((11.666667, -64.0, 140.0, -149.333333, 70.0, 0.0,
             -9.3333333, 0.0, 1.0),),
)

WENDLAND_C6 = SPHKernel(
    name="Wendland C6",
    gamma=2.449490,
    constant=1365.0 * _M1PI / 64.0,
    ivals=1,
    degree=11,
    coeffs=((32.0, -231.0, 704.0, -1155.0, 1056.0, -462.0,
             0.0, 66.0, 0.0, -11.0, 0.0, 1.0),),
)

KERNELS = {
    "cubic-spline": CUBIC_SPLINE,
    "quartic-spline": QUARTIC_SPLINE,
    "quintic-spline": QUINTIC_SPLINE,
    "wendland-C2": WENDLAND_C2,
    "wendland-C4": WENDLAND_C4,
    "wendland-C6": WENDLAND_C6,
}
