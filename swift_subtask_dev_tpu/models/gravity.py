"""Self-gravity solver: PM mesh (long range) + P2P/FMM near field.

The reference's gravity is FMM multipoles + PM mesh (runner_doiact_grav.c,
mesh_gravity.c).  Two regimes here, picked automatically from the grid:

* **P3M** (cell edge >= r_cut): everything inside the 27-stencil is
  direct P2P, everything beyond is mesh — valid when cells are coarse
  enough that the stencil covers the short-range force.
* **FMM + PM** (cell edge < r_cut — clustered volumes where r_cut-sized
  cells would hold thousands of particles and the O(K^2) stencil blows
  up): direct P2P only for separations |d|_inf <= 2, Cartesian
  multipole M2L (ops/fmm.py) for 3 <= |d| out to r_cut, mesh beyond —
  the uniform-grid flattening of the reference's FMM tree walk.

All species bucketed on the same grid interact: gas-gas, gas-dm, dm-dm
pairs all go through the same kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from ..grid.cellgrid import CellGrid
from ..ops import fmm, p2p_gravity, pm_gravity

F32 = jnp.float32


@dataclass(frozen=True)
class GravityParams:
    """Reference Gravity: YAML section (gravity_properties.c)."""

    G: float = 1.0
    eps: float = 1e-3            # Plummer-equivalent comoving softening
    # (the baryon value; Gravity:comoving_baryon_softening)
    eps_dm: float = 0.0          # DM softening (comoving_DM_softening);
    # 0 -> same as eps.  Pairs soften with max(eps_i, eps_j)*3 — the
    # reference's multi-softening rule (gravity_iact.h)
    mesh_N: int = 64             # Gravity:mesh_side_length
    a_smooth: float = 1.25
    r_cut_ratio: float = 4.5
    eta: float = 0.025           # Gravity:eta (timestep)
    theta_cr: float = 0.7        # MAC opening angle (the uniform-grid FMM
    # uses a fixed >=3-cell separation instead — see ops/fmm.py)
    periodic: bool = True
    multipole_order: int = 5     # FMM expansion order (SWIFT_MULTIPOLE_ORDER)
    # Gravity:MAC — "geometric" (theta_cr -> fixed near radius) or
    # "adaptive": the Dehnen 2014 MAC (multipole_accept.h:160) promotes
    # outermost-shell P2P pairs to M2L per (cell, offset) wherever the
    # error estimate stays below adaptive_eps * min|a_old| (the
    # Gravity:epsilon_fmm tolerance); needs last-step accelerations fed
    # through accelerations(..., a_old=...)
    mac: str = "geometric"
    adaptive_eps: float = 1e-3   # Gravity:epsilon_fmm
    # Gravity:mesh_gradient — "spectral" (default: exact k-space
    # derivative; clears the reference-default-split Ewald gate at
    # <1e-3 RMS) or "4pt" (the reference's finite-difference stencil,
    # mesh_gravity.c)
    mesh_gradient: str = "spectral"

    @property
    def H_soft(self) -> float:
        """Softening kernel size H = 3 * Plummer eps (kernel_gravity.h)."""
        return 3.0 * self.eps

    @property
    def H_soft_dm(self) -> float:
        return 3.0 * (self.eps_dm if self.eps_dm > 0 else self.eps)


class GravitySolver:
    """Owns the PM mesh and computes P3M accelerations for tiled species."""

    def __init__(self, gp: GravityParams, grid: CellGrid,
                 fft_shard_n: int = 0):
        self.gp = gp
        self.grid = grid
        # per-species Plummer softenings, aligned with the species list
        # the caller passes to accelerations()/short_range_* (the CLI
        # sets [baryon, dm, baryon, ...] in its species order) — the
        # multi-softening surface of gravity_properties.c; None -> gp.eps
        self.eps_per_species = None
        # >0: solve the mesh Poisson equation with the slab-decomposed
        # distributed FFT (ops/pm_gravity.long_range_potential_sharded —
        # the mesh_gravity_mpi.c analog) instead of one-device rfftn
        self.fft_shard_n = int(fft_shard_n)
        self.pm = pm_gravity.PMMeshParams(
            N=gp.mesh_N, box=grid.box, a_smooth=gp.a_smooth,
            r_cut_max_ratio=gp.r_cut_ratio,
            gradient=getattr(gp, "mesh_gradient", "spectral"))
        # column grids (cdim z == 1) run the flat Pallas P2P kernel:
        # 9 neighbour columns cover x/y, z-block windows cover |dz|<=r_cut
        self.flat = grid.cdim[2] == 1
        if self.flat:
            if min(grid.edge[:2]) < self.pm.r_cut * (1 - 1e-6):
                raise ValueError(
                    f"flat gravity needs column edges >= r_cut="
                    f"{self.pm.r_cut:.4g} (have {grid.edge[:2]}); "
                    "coarsen the PM mesh or the columns")
            self.use_fmm = False
        else:
            # regime selection: coarse cells -> pure P3M over the
            # 27-stencil; fine cells -> FMM M2L bridges the
            # 3-cell..r_cut band
            self.use_fmm = (gp.periodic
                            and min(grid.edge) < self.pm.r_cut * (1 - 1e-6))
        if gp.mac == "adaptive" and not self.use_fmm:
            # Gravity:MAC: adaptive needs the FMM band (non-flat cell
            # grid with cells finer than r_cut) to have any M2L pairs to
            # promote; on the flat/column or pure-P3M paths it silently
            # degrades to geometric — tell the user (advisor r4 finding)
            import warnings
            warnings.warn(
                "Gravity:MAC: adaptive is inert on this configuration "
                f"(flat={self.flat}, use_fmm={self.use_fmm}): the Dehnen "
                "MAC only activates on the FMM cell grid (cdim[2]>1 with "
                "cell edges < r_cut). Falling back to geometric P2P.",
                stacklevel=2)
        if self.use_fmm:
            # geometric MAC on the uniform grid: a multipole pair at
            # |d|_inf cells has opening ratio s/((|d|-1)s); accepting it
            # needs 1/(|d|-1) <= theta_cr, so P2P covers
            # |d|_inf <= ceil(1/theta_cr) — the Gravity:theta_cr contract
            # (multipole_accept.h:81 geometric criterion) mapped onto the
            # flattened tree
            self.near_radius = max(2, int(np.ceil(1.0 / gp.theta_cr)))
            need = 2 * self.near_radius + 1
            if any(c < need for c in grid.cdim):
                raise ValueError(
                    f"FMM near field at theta_cr={gp.theta_cr} needs "
                    f"cdim >= {need} (have {grid.cdim}); coarsen the "
                    "mesh or the grid, or raise theta_cr")
            self.fmm_offsets = fmm.far_offsets(
                grid, self.pm.r_cut, near_radius=self.near_radius)
            self.fmm_T = fmm.build_t_matrices(
                grid, self.fmm_offsets, gp.multipole_order,
                gp.H_soft, self.pm.r_s)
            if gp.mac == "adaptive":
                # the outermost P2P shell is the adaptive-MAC candidate
                # band: per-(cell, offset) accept masks move pairs from
                # the direct pass to masked M2L (multipole_accept.h:160)
                self.shell_offs = fmm.shell_offsets(grid,
                                                    self.near_radius)
                self.shell_T = fmm.build_t_matrices(
                    grid, self.shell_offs, gp.multipole_order,
                    gp.H_soft, self.pm.r_s)
                # STATIC promotion (update_adaptive_promotion): shell
                # offsets whose Dehnen bound holds for EVERY receiver
                # cell leave the P2P stencil entirely — a real flop
                # cut, where the per-cell masked path still computes
                # the pairs it zeroes.  Rebuilt at the caller's rebuild
                # cadence like the reference's task lists.
                self.static_promoted = ()
        # cell corner positions (C, 3) — static constant for global pos
        self.corners = jnp.asarray(grid.cell_corners(), jnp.float32)
        # eager Green-table build: the optimal influence function is far
        # too expensive to evaluate inline per mesh solve
        self.mesh_green = pm_gravity.green_table(self.pm, gp.G)

    def positions_of(self, s: Dict) -> jnp.ndarray:
        """(C, K, 3) absolute positions from tiled offsets (f32)."""
        return self.corners[:, None, :] + s["off"]

    def mesh_accelerations(self, species: Sequence[Dict]) -> List:
        """PM long-range only: [(acc_mesh (C,K,3), pot_mesh (C,K)), ...].

        Split out so the engine can update the mesh field on its own
        (longer) timestep, like the reference's separate mesh kicks
        (kick.h:255 kick_gpart mesh terms, engine.c:2406 ti_mesh)."""
        gp = self.gp
        pos_all = [self.positions_of(s) for s in species]
        m_all = [s["m"] * s["mask"] for s in species]
        grid_mass = 0.0
        for pos, m in zip(pos_all, m_all):
            grid_mass = grid_mass + pm_gravity.deposit(self.pm, pos, m)
        if self.fft_shard_n > 0:
            acc_mesh, phi = pm_gravity.long_range_fields_sharded(
                self.pm, grid_mass, gp.G, self.fft_shard_n,
                green=self.mesh_green)
        else:
            acc_mesh, phi = pm_gravity.long_range_fields(
                self.pm, grid_mass, gp.G, green=self.mesh_green)
        outs = []
        for s, pos in zip(species, pos_all):
            ax, ay, az, pot = pm_gravity.gather_multi(
                self.pm, (acc_mesh[0], acc_mesh[1], acc_mesh[2], phi),
                pos)
            outs.append((jnp.stack([ax, ay, az], -1)
                         * s["mask"][..., None], pot * s["mask"]))
        return outs

    def _H_list(self, n: int) -> List[float]:
        """Per-species softening kernel sizes H = 3*eps."""
        eps = getattr(self, "eps_per_species", None)
        if eps:
            return [3.0 * float(e) for e in eps[:n]] \
                + [self.gp.H_soft] * max(0, n - len(eps))
        return [self.gp.H_soft] * n

    def short_range_accelerations(self, species: Sequence[Dict]) -> List:
        """Near-field only (P2P + FMM band): [(acc, pot), ...]."""
        gp = self.gp
        H = self._H_list(len(species))
        if self.flat:
            from ..ops import hydro_pallas
            return [hydro_pallas.p2p_gravity_loop(
                self.grid, s, species, gp.G, H[i],
                self.pm.r_s if gp.periodic else 0.0, self.pm.r_cut,
                periodic_truncation=gp.periodic, H_soft_j=H)
                for i, s in enumerate(species)]
        pp = p2p_gravity.p2p_accelerations(
            self.grid, species, gp.G, H_soft=H,
            r_s=self.pm.r_s if gp.periodic else 0.0,
            periodic_truncation=gp.periodic,
            radius=self.near_radius if self.use_fmm else 1)
        if not self.use_fmm:
            return [(a, p) for (a, p) in pp]
        p_ord = gp.multipole_order
        M = fmm.p2m(self.grid, species, p_ord)
        L = fmm.m2l(self.grid, M, self.fmm_offsets, self.fmm_T)
        outs = []
        for s, (acc_pp, pot_pp) in zip(species, pp):
            af, pf = fmm.l2p(self.grid, L, s, p_ord, gp.G)
            outs.append((acc_pp + af, pot_pp + pf))
        return outs

    def gas_short_range_fn(self):
        """Near-field gravity_fn for an engine running split mesh kicks.

        On the flat/column solver the returned fn carries ``fuse_spec`` —
        the P2P literals — so the engine can fold the gravity pair pass
        into the hydro force pass (hydro_pallas.force_gravity_loop: one
        column traversal computes both)."""
        def fn(s: Dict):
            [(acc, pot)] = self.short_range_accelerations([s])
            return acc, pot
        if self.flat:
            gp = self.gp
            fn.fuse_spec = dict(
                G=gp.G, H_soft=self._H_list(1)[0],
                r_s=self.pm.r_s if gp.periodic else 0.0,
                r_cut=self.pm.r_cut,
                periodic_truncation=gp.periodic)
        return fn

    def short_range_sharded_fn(self, shard_n: int, axis: str = "x"):
        """Multi-species near-field gravity with every flat P2P pass
        under shard_map (parallel/flat.py shard_flat_multi_call): all
        species' boundary column slabs ride one ppermute ring, then the
        unmodified flat kernel runs per (receiver, source) pair on the
        extended grid.  Drop-in for ``short_range_accelerations`` in a
        sharded MultiEngine."""
        if not self.flat:
            raise ValueError("sharded short-range gravity needs the "
                             "flat/column solver (build_columns grid)")
        gp = self.gp
        r_s = self.pm.r_s if gp.periodic else 0.0
        r_cut = self.pm.r_cut

        def fn(species):
            from ..ops import hydro_pallas
            from ..parallel.flat import shard_flat_multi_call
            subs = [{k: s[k] for k in ("off", "m", "mask")}
                    for s in species]

            H = self._H_list(len(species))

            def loop(g, ss):
                outs = []
                for i, st in enumerate(ss):
                    acc, pot = hydro_pallas.p2p_gravity_loop(
                        g, st, ss, gp.G, H[i], r_s, r_cut,
                        periodic_truncation=gp.periodic, H_soft_j=H)
                    outs.append({"acc": acc, "pot": pot})
                return outs

            outs = shard_flat_multi_call(self.grid, shard_n, axis, loop,
                                         subs)
            return [(o["acc"], o["pot"]) for o in outs]
        return fn

    def gas_short_range_sharded_fn(self, shard_n: int, axis: str = "x"):
        """Near-field gravity_fn with the flat P2P pass under shard_map:
        same ppermute column-slab halo as the sharded hydro loops
        (parallel/flat.py shard_flat_call — proxy.c analog).  Requires
        the flat/column solver; r_cut <= column edge guarantees the
        one-slab halo covers every short-range pair."""
        if not self.flat:
            raise ValueError("sharded short-range gravity needs the "
                             "flat/column solver (build_columns grid)")
        gp = self.gp
        r_s = self.pm.r_s if gp.periodic else 0.0
        r_cut = self.pm.r_cut

        def fn(s: Dict):
            from ..ops import hydro_pallas
            from ..parallel.flat import shard_flat_call
            sub = {k: s[k] for k in ("off", "m", "mask")}

            def loop(g, st):
                acc, pot = hydro_pallas.p2p_gravity_loop(
                    g, st, [st], gp.G, gp.H_soft, r_s, r_cut,
                    periodic_truncation=gp.periodic)
                return {"acc": acc, "pot": pot}

            out = shard_flat_call(self.grid, shard_n, axis, loop, sub)
            return out["acc"], out["pot"]
        # advertise the P2P literals so the sharded engine folds gravity
        # into the hydro force pass (engine _ShardedFlat.force_gravity_loop
        # runs the fused traversal under the same one-slab halo); fn stays
        # as the fallback when the scheme runs force unfused
        fn.fuse_spec = dict(
            G=gp.G, H_soft=self._H_list(1)[0],
            r_s=r_s, r_cut=r_cut,
            periodic_truncation=gp.periodic)
        return fn

    def gas_mesh_fn(self):
        """mesh_fn hook: (acc_mesh, pot_mesh) for the gas state."""
        def fn(s: Dict):
            [(acc, pot)] = self.mesh_accelerations([s])
            return acc, pot
        return fn

    def accelerations(self, species: Sequence[Dict],
                      a_old: Sequence = None) -> List:
        """P3M accelerations + potentials for each species dict
        (mask/off/m).  Returns [(acc (C,K,3), pot (C,K)), ...].

        ``a_old``: previous-step acceleration norms or vectors per
        species ((C,K) or (C,K,3)), enabling the adaptive Dehnen MAC
        (GravityParams.mac == "adaptive"): outermost-shell P2P pairs
        whose multipole error estimate stays below
        adaptive_eps * min|a_old| run as masked M2L instead."""
        gp = self.gp
        # --- PM long range over ALL species ---------------------------------
        pos_all = [self.positions_of(s) for s in species]
        m_all = [s["m"] * s["mask"] for s in species]
        grid_mass = 0.0
        for pos, m in zip(pos_all, m_all):
            grid_mass = grid_mass + pm_gravity.deposit(self.pm, pos, m)
        if self.fft_shard_n > 0:
            acc_mesh, phi = pm_gravity.long_range_fields_sharded(
                self.pm, grid_mass, gp.G, self.fft_shard_n,
                green=self.mesh_green)
        else:
            acc_mesh, phi = pm_gravity.long_range_fields(
                self.pm, grid_mass, gp.G, green=self.mesh_green)

        # --- FMM far field (near_radius-cell .. r_cut band) ------------------
        fmm_each = None
        offset_skip = None
        H = self._H_list(len(species))
        if self.use_fmm:
            p_ord = gp.multipole_order
            M = fmm.p2m(self.grid, species, p_ord)
            L = fmm.m2l(self.grid, M, self.fmm_offsets, self.fmm_T)
            if gp.mac == "adaptive":
                promoted = set(getattr(self, "static_promoted", ()))
                if promoted:
                    # statically promoted shell offsets: their P2P is
                    # gone from the stencil below, so their far field
                    # is added UNMASKED here
                    sel = np.asarray([i for i, d in
                                      enumerate(self.shell_offs)
                                      if tuple(int(x) for x in d)
                                      in promoted])
                    L = L + fmm.m2l(self.grid, M, self.shell_offs[sel],
                                    self.shell_T[sel])
                rest = np.asarray([i for i, d in
                                   enumerate(self.shell_offs)
                                   if tuple(int(x) for x in d)
                                   not in promoted])
            if gp.mac == "adaptive" and a_old is not None \
                    and any(a is not None for a in a_old) \
                    and len(rest):
                # per-cell min |a_old| over every species' live
                # particles (m_pole.min_old_a_grav_norm analog)
                min_a = jnp.full((self.grid.C,), jnp.inf, F32)
                for s, a in zip(species, a_old):
                    if a is None:
                        continue
                    an = jnp.linalg.norm(a, axis=-1) if a.ndim == 3 \
                        else a
                    an = jnp.where(s["mask"] > 0, an, jnp.inf)
                    min_a = jnp.minimum(min_a, jnp.min(an, axis=1))
                accept = fmm.adaptive_accept(
                    self.grid, M, p_ord, self.shell_offs[rest], min_a,
                    gp.adaptive_eps, max(H))
                L = L + fmm.m2l_masked(self.grid, M,
                                       self.shell_offs[rest],
                                       self.shell_T[rest], accept)
                offset_skip = {
                    tuple(int(x) for x in d): accept[:, i]
                    for i, d in enumerate(self.shell_offs[rest])}
            fmm_each = [fmm.l2p(self.grid, L, s, p_ord, gp.G)
                        for s in species]

        # --- P2P short range -------------------------------------------------
        if self.flat:
            from ..ops import hydro_pallas
            pp = [hydro_pallas.p2p_gravity_loop(
                self.grid, s, species, gp.G, H[i],
                self.pm.r_s if gp.periodic else 0.0, self.pm.r_cut,
                periodic_truncation=gp.periodic, H_soft_j=H)
                for i, s in enumerate(species)]
        else:
            p2p_offs = None
            if self.use_fmm and gp.mac == "adaptive" \
                    and getattr(self, "static_promoted", ()):
                promoted = set(self.static_promoted)
                cube = p2p_gravity.stencil_offsets(self.near_radius)
                p2p_offs = [tuple(int(x) for x in d) for d in cube
                            if tuple(int(x) for x in d) not in promoted]
            pp = p2p_gravity.p2p_accelerations(
                self.grid, species, gp.G, H_soft=H,
                r_s=self.pm.r_s if gp.periodic else 0.0,
                periodic_truncation=gp.periodic,
                radius=self.near_radius if self.use_fmm else 1,
                offset_skip=offset_skip, offsets=p2p_offs)

        outs = []
        for i, (s, pos, (acc_pp, pot_pp)) in enumerate(
                zip(species, pos_all, pp)):
            ax, ay, az, pot = pm_gravity.gather_multi(
                self.pm, (acc_mesh[0], acc_mesh[1], acc_mesh[2], phi),
                pos)
            a_pm = jnp.stack([ax, ay, az], -1) * s["mask"][..., None]
            acc = acc_pp + a_pm
            ptot = pot_pp + pot * s["mask"]
            if fmm_each is not None:
                acc = acc + fmm_each[i][0]
                ptot = ptot + fmm_each[i][1]
            outs.append((acc, ptot))
        return outs

    def update_adaptive_promotion(self, species, a_old) -> tuple:
        """HOST-side, rebuild-cadence static MAC promotion.

        Re-evaluates the Dehnen bound for every outermost-shell offset
        and promotes those accepted by EVERY receiver cell: they leave
        the P2P stencil entirely (accelerations builds the smaller
        static offset list) and get unmasked M2L instead.  This is the
        TPU analog of the reference regenerating its gravity task list
        at rebuild (engine_maketasks.c:1812 pair-mm vs pp selection):
        per-cell dynamic masking cannot reduce flops under jit, a
        static stencil change does.  Returns the promoted offsets; a
        change invalidates the jitted step (the caller re-jits, which
        is why this belongs at rebuild cadence)."""
        gp = self.gp
        if not (self.use_fmm and gp.mac == "adaptive"):
            return ()
        min_a = jnp.full((self.grid.C,), jnp.inf, F32)
        got = False
        for s, a in zip(species, a_old):
            if a is None:
                continue
            got = True
            an = jnp.linalg.norm(a, axis=-1) if a.ndim == 3 else a
            an = jnp.where(s["mask"] > 0, an, jnp.inf)
            min_a = jnp.minimum(min_a, jnp.min(an, axis=1))
        if not got:
            return self.static_promoted
        M = fmm.p2m(self.grid, species, gp.multipole_order)
        accept = fmm.adaptive_accept(
            self.grid, M, gp.multipole_order, self.shell_offs, min_a,
            gp.adaptive_eps, max(self._H_list(len(species))))
        all_ok = np.asarray(jnp.all(accept, axis=0))
        self.static_promoted = tuple(
            tuple(int(x) for x in d)
            for d, ok in zip(self.shell_offs, all_ok) if ok)
        return self.static_promoted

    def gas_gravity_fn(self):
        """gravity_fn hook for the hydro engine (gas self-gravity only).

        Returns (acc, potential) so the engine can carry per-particle
        potentials for the E_pot statistics reduction (statistics.c:635).
        """
        def fn(s: Dict):
            [(acc, pot)] = self.accelerations([s])
            return acc, pot
        return fn
