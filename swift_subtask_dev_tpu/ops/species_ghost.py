"""Star / black-hole smoothing-length iteration (the species ghost).

The reference iterates star and BH smoothing lengths to a neighbour
target over GAS neighbours exactly like the gas ghost
(src/runner_ghost.c:72 runner_do_stars_ghost, :577
runner_do_black_holes_density_ghost): every EAGLE feedback deposition
weight, Bondi density and reposition/merger radius depends on the
converged h.  Here the same Newton/bisection update as the gas ghost
(models/sph/sphenix.ghost_h_update) drives a cross-species wcount loop
on the 27-stencil — data-dependent trip count via lax.while_loop,
static shapes throughout.

Conventions follow the reference: stars/BH sum W over gas neighbours
with NO self contribution (stars/EAGLE/stars.h:202 stars_end_density
only applies the h^-dim factors; contrast hydro_end_density's
kernel_root), and the target is eta^3 with the species' own eta
(resolution_eta in stars/BH properties, defaulting to the hydro eta).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..grid.cellgrid import CellGrid
from ..models.sph import sphenix
from ..models.sph.sphenix import SPHENIXParams
from .stencil import (_apply_offsets, _bi, _bj, _flat_view, _grid_view,
                      _pair_geometry_shift, _sanitize)

F32 = jnp.float32
HYDRO_DIM = 3.0


def species_wcount_loop(grid: CellGrid, s_i: Dict, gas_s: Dict,
                        p: SPHENIXParams, use_scan: bool = False):
    """Raw neighbour-count sums for a non-gas species over gas.

    Returns (wsum, wdh_sum), both (C, K_i) f32, the *unnormalised*
    Σ w(u) and Σ -(3 w + u w') over gas neighbours within gamma*h_i —
    the star/BH analog of the density loop's wcount/wcount_dh terms
    (stars_iact.h runner_iact_nonsym_stars_density).
    """
    gm = lambda n: _grid_view(grid, s_i[n])
    smask, soff = gm("mask"), gm("off")
    h = _sanitize(smask, gm("h"))
    hinv_i = _bi(1.0 / h)

    gamma2 = jnp.float32(p.kernel.gamma2)
    acc0 = (jnp.zeros(smask.shape, F32), jnp.zeros(smask.shape, F32))
    j_fields = {"off": _grid_view(grid, gas_s["off"]),
                "mask": _grid_view(grid, gas_s["mask"])}

    def accumulate(acc, jf, shift):
        wsum, wdh = acc
        dx, r2 = _pair_geometry_shift(soff, jf["off"], shift)
        ok = (_bj(jf["mask"]) > 0) & (r2 * hinv_i ** 2 < gamma2)
        r = jnp.sqrt(r2)
        u = r * hinv_i
        wi, wi_dx = p.kernel.deval(u)
        kick = HYDRO_DIM * wi + u * wi_dx
        w = ok.astype(F32)
        return (wsum + jnp.sum(wi * w, axis=-1),
                wdh - jnp.sum(kick * w, axis=-1))

    wsum, wdh = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return (_flat_view(grid, wsum) * s_i["mask"],
            _flat_view(grid, wdh) * s_i["mask"])


def species_h_iterate(grid: CellGrid, s_i: Dict, gas_s: Dict,
                      p: SPHENIXParams, active: jnp.ndarray,
                      max_iter: int = 10, eta: Optional[float] = None,
                      h_min: float = 0.0, h_max: Optional[float] = None,
                      use_scan: bool = False):
    """Iterate the species' h to the neighbour target over gas.

    Returns (h_new (C,K_i), wcount (C,K_i), n_iter).  Only ``active``
    slots are updated; h warm-starts from s_i["h"], so between steps the
    loop typically converges in 1-2 iterations.  ``wcount`` is the
    normalised Σ W(r, h) h^-3 at the converged h (the reference's
    sp->density.wcount after stars_end_density) — callers use it for
    the has-neighbours checks.
    """
    eta_dim = float(eta) ** 3 if eta is not None else p.eta_dim
    pp = SimpleNamespace(eta_dim=eta_dim, h_tolerance=p.h_tolerance,
                         h_min=h_min,
                         h_max=float(h_max) if h_max is not None
                         else p.h_max)

    def wpass(h):
        wsum, wdh = species_wcount_loop(grid, {**s_i, "h": h}, gas_s, p,
                                        use_scan=use_scan)
        # stars_end_density: no kernel_root self term
        hs = jnp.where(s_i["mask"] > 0, h, 1.0)
        return wsum / hs ** 3, wdh / hs ** 4

    def h_update(h, wc, wdh, left, right):
        has_ngb = wc * h ** 3 > 1e-5 * eta_dim
        return sphenix.ghost_h_update(pp, h, wc, wdh, left, right,
                                      has_ngb)

    h0 = jnp.where(s_i["mask"] > 0, s_i["h"], 1.0)
    left0 = jnp.zeros_like(h0)
    right0 = jnp.full_like(h0, pp.h_max)
    wc0, wdh0 = wpass(h0)
    _, _, _, conv0 = h_update(h0, wc0, wdh0, left0, right0)
    conv0 = conv0 | ~active

    def cond(c):
        h, wc, wdh, left, right, conv, it = c
        return (it < max_iter) & jnp.any(~conv)

    def body(c):
        h, wc, wdh, left, right, conv, it = c
        h_new, left, right, c_new = h_update(h, wc, wdh, left, right)
        upd = active & ~conv
        h = jnp.where(upd, h_new, h)
        wc_n, wdh_n = wpass(h)
        wc = jnp.where(upd, wc_n, wc)
        wdh = jnp.where(upd, wdh_n, wdh)
        _, _, _, c2 = h_update(h, wc, wdh, left, right)
        conv = conv | ~upd | (upd & c2)
        return (h, wc, wdh, left, right, conv, it + 1)

    h, wc, wdh, left, right, conv, n_iter = jax.lax.while_loop(
        cond, body, (h0, wc0, wdh0, left0, right0, conv0, jnp.int32(0)))
    h = jnp.where(s_i["mask"] > 0, h, s_i["h"])
    return h, wc, n_iter
