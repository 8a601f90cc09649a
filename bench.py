#!/usr/bin/env python
"""Benchmark: particle-steps/sec/chip on an all-active SPH+gravity step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: SWIFT's PASC-2016 EAGLE-volume number (BASELINE.md): 2.9 s/step
for 376^3 particles on 256 cores = 6.9e4 particle-steps/s/core, i.e.
4.4e6 per 64-core node.  vs_baseline is ours / one 64-core node.

Scope (round 3+): full SPHENIX hydro (density+ghost+gradient+force, KDK)
PLUS self-gravity — flat-column Pallas P2P short range every step, and
the PM mesh on its own split timestep (Engine._mesh_boundary), exactly
how the production CLI runs it and how the reference amortises its mesh
(engine.c:2406 separate ti_mesh interval).
"""

import json
import os
import time

import numpy as np

BASELINE_NODE = 4.4e6  # particle-steps/s per 64-core COSMA-5 node

# Sweep knobs (env vars so the driver's invocation stays unchanged):
#   BENCH_N1        half-cube side; particles = 2*n1^3      (default 36)
#   BENCH_MESH_N    PM mesh size; larger -> smaller r_cut -> narrower
#                   columns (NOTES_ROUND4 candidate-slot algebra)
#   BENCH_JB        flat-engine j-block rows (pallas_flat.JB)
#   BENCH_PER_LAUNCH  steps fused per device launch
#   BENCH_SLACK     hydro reach slack factor (column width driver)
#   BENCH_IC        "uniform" (default) or "zel": Zel'dovich-displaced
#                   lattice (clustered variant — the all-active uniform
#                   box is this design's EASIEST case; VERDICT r3 #2)
#   BENCH_ZEL_AMP   Zel'dovich displacement amplitude in interparticle
#                   spacings (default 1.2 -> shell-crossed, ~10x
#                   density contrast on the CIC grid)
# Default geometry (round 5): 2*80^3 = 1.02M particles — per-particle
# throughput IMPROVES with N (fuller i-tiles; bench_sweep.jsonl r5 rows:
# 93k 0.41x, 1M 0.51x, DMO 10M 1.69x), and 1M is the closest committed
# size class to the reference's 5.1e7-particle baseline volumes.
# BENCH_N1=36 BENCH_MESH_N=128 reproduces the old 93k row.
_N1 = int(os.environ.get("BENCH_N1", "80"))
# mesh_N: denser PM mesh -> smaller r_cut -> narrower j-block ranges for
# the fused pass (reach_floor=r_cut), with the FFT amortised by the
# split mesh timestep; 192 pairs with n1=80 (128 with n1=36)
_MESH_N = int(os.environ.get("BENCH_MESH_N", "192"))
_JB = int(os.environ.get("BENCH_JB", "0"))
_PER_LAUNCH = int(os.environ.get("BENCH_PER_LAUNCH", "16"))
_SLACK = float(os.environ.get("BENCH_SLACK", "1.25"))
_IC = os.environ.get("BENCH_IC", "uniform")
_ZEL_AMP = float(os.environ.get("BENCH_ZEL_AMP", "1.2"))
#   BENCH_MODE      "sph" (default: SPHENIX + P3M, the headline metric)
#                   or "dmo": gravity-only DMEngine — the EAGLE_DMO_low_z
#                   configuration class, used for the >=1e7-particle
#                   scale rows where 10M gas particles' ghost iteration
#                   would dominate the wall clock
_MODE = os.environ.get("BENCH_MODE", "sph")
_STEPS = int(os.environ.get("BENCH_STEPS", "64"))
_HEADROOM = float(os.environ.get("BENCH_HEADROOM", "1.4"))
#   BENCH_VEL   rms velocity (box units/time) given to the IC so drift
#               actually accumulates and the rebucket trigger fires at a
#               realistic cadence (the v=0 uniform box never rebuckets —
#               quote rows with BENCH_VEL>0 for honest amortised cost)
_VEL = float(os.environ.get("BENCH_VEL", "0"))


def _candidate_diag(grid, state, reach_scale, reach_floor, true_ngb):
    """Candidate j-rows per i-tile from the kernel's own range words vs
    the measured true neighbour count — the waste factor the banded
    kernel work targets (VERDICT r4 #1 done-criterion)."""
    from swift_subtask_dev_tpu.ops import pallas_flat

    gran = 16
    rng = np.asarray(pallas_flat._block_ranges(
        grid, state["mask"], state["off"][..., 2], state["h"],
        reach_scale, True, jb=gran, reach_floor=reach_floor))
    cand = ((rng[..., 0] >> 16) & 0xFFFF) + ((rng[..., 1] >> 16) & 0xFFFF)
    msk = np.asarray(state["mask"])
    live_tiles = (msk.reshape(grid.C, -1, 128).sum(2) > 0).sum()
    rows_per_tile = float(cand.sum(axis=2).sum() / max(live_tiles, 1)) \
        * gran
    return {
        "cand_rows_per_tile": round(rows_per_tile, 1),
        "cand_per_true_ngb": round(rows_per_tile / max(true_ngb, 1e-9),
                                   1),
    }


def zeldovich_ic(n1: int, amp_spacings: float, seed: int = 3):
    """Clustered IC: Zel'dovich displacements (power-law P(k) ~ k^-2.5
    Gaussian field) applied to the same 2*n1^3 bcc lattice the uniform
    bench uses.  amp in units of the interparticle spacing; ~1+ gives
    shell crossing and an order-of-magnitude density contrast — the
    clustered stress case for column capacity + candidate windows."""
    import numpy as np

    from swift_subtask_dev_tpu.ics import uniform_box_ic

    ic = uniform_box_ic(n=n1, jitter=0.05, seed=seed)
    pos = np.asarray(ic["pos"], np.float64)
    rng = np.random.default_rng(seed + 1)
    ng = 64
    k1 = np.fft.fftfreq(ng, d=1.0 / ng) * 2 * np.pi
    kx, ky, kz = np.meshgrid(k1, k1, k1, indexing="ij")
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    k2[0, 0, 0] = 1.0
    phase = (rng.standard_normal((ng, ng, ng))
             + 1j * rng.standard_normal((ng, ng, ng)))
    pk = np.maximum(k2, 1e-30) ** (-2.5 / 2.0)
    pk[0, 0, 0] = 0.0
    dk = phase * np.sqrt(pk)
    psi = np.stack([np.real(np.fft.ifftn(1j * kk / k2 * dk))
                    for kk in (kx, ky, kz)], axis=-1)
    # sample the displacement field at particle positions (NGP)
    idx = np.minimum((pos * ng).astype(np.int64), ng - 1)
    disp = psi[idx[:, 0], idx[:, 1], idx[:, 2]]
    spacing = 1.0 / (2 * n1 ** 3) ** (1.0 / 3.0)
    disp *= amp_spacings * spacing / max(np.abs(disp).max(), 1e-30)
    ic["pos"] = np.mod(pos + disp, 1.0).astype(np.float32)
    return ic


def main():
    import jax  # noqa: F401  (the persistent compile cache does not hit
    # through axon's remote compiler and can stall it — do not enable)

    from swift_subtask_dev_tpu.engine import (DMEngine, Engine,
                                              EngineConfig)
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.models.gravity import (GravityParams,
                                                      GravitySolver)
    from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
    from swift_subtask_dev_tpu.ics import uniform_box_ic

    if _JB:
        from swift_subtask_dev_tpu.ops import pallas_flat
        pallas_flat.JB = _JB

    # Uniform jittered box — all particles active every step.
    n1 = _N1                     # 2*n1^3 = 93k particles at 36
    ic = (zeldovich_ic(n1, _ZEL_AMP) if _IC == "zel"
          else uniform_box_ic(n=n1, jitter=0.2, seed=3))
    n_parts = len(ic["pos"])
    if _VEL > 0:
        rng = np.random.default_rng(7)
        ic["v"] = rng.normal(scale=_VEL,
                             size=(n_parts, 3)).astype(np.float32)

    if _MODE == "dmo":
        return _main_dmo(ic, n_parts)

    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    # gravity: P3M split with the columns covering r_cut
    gp = GravityParams(G=1.0, eps=0.5 / n1, mesh_N=_MESH_N)
    r_cut = gp.r_cut_ratio * gp.a_smooth * 1.0 / gp.mesh_N
    hydro_reach = float(ic["h"].max() * P.kernel.gamma * _SLACK)
    # column/z-sorted layout for the flat Pallas engine (the fast path)
    grid = CellGrid.build_columns(
        ic["box"], interaction_range=max(hydro_reach, r_cut * 1.15),
        pos=ic["pos"])
    solver = GravitySolver(gp, grid)

    eng = Engine(grid, P,
                 EngineConfig(dt_max=2e-4, backend="flat",
                              with_self_gravity=True, eps_soft=gp.eps,
                              eta_grav=gp.eta,
                              # TimeIntegration:dt_max ceiling for the
                              # mesh interval — dt_max here is the fixed
                              # PARTICLE step; the mesh rides its own
                              # longer bin (engine.c:2406), sized by
                              # sqrt(2 eta r_s/|a|) up to this ceiling
                              mesh_dt_max=64 * 2e-4,
                              p2p_reach=solver.pm.r_cut),
                 0.0, 1.0, gravity_fn=solver.gas_short_range_fn(),
                 mesh_fn=solver.gas_mesh_fn(),
                 mesh_dt_scale=solver.pm.r_s)
    # auto re-grid support (tight-slack sweeps trigger coverage walls):
    # the engine rebinds gravity/mesh hooks from the returned solver
    eng.solver_builder = lambda g: GravitySolver(gp, g)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()

    # warm-up (compile the batched step); sync via host transfer —
    # block_until_ready is a NO-OP through the axon tunnel.  Each fused
    # launch size k compiles its own program, so the warm-up must visit
    # the full-size launch too, not only the min(16, k) tail — otherwise
    # the timed region compiles a fresh k-step program (~50 s through
    # the tunnel) and the sweep measures compile, not compute.
    eng.run_fixed_dt(16, per_launch=_PER_LAUNCH)
    if _PER_LAUNCH > 16:
        eng.run_fixed_dt(_PER_LAUNCH, per_launch=_PER_LAUNCH)
    np.asarray(eng.state["rho"])

    n_steps = _STEPS
    t0 = time.time()
    eng.run_fixed_dt(n_steps, per_launch=_PER_LAUNCH)
    np.asarray(eng.state["rho"])
    elapsed = time.time() - t0

    # true mean neighbour count from the converged density state
    msk = np.asarray(eng.state["mask"])
    ngb = float((np.asarray(eng.state["wcount"]) * (4 / 3 * np.pi)
                 * (np.asarray(eng.state["h"]) * P.kernel.gamma) ** 3
                 * msk).sum() / max(msk.sum(), 1))
    diag = _candidate_diag(eng.grid, eng.state, float(P.kernel.gamma),
                           float(solver.pm.r_cut), ngb)

    rate = n_steps * n_parts / elapsed
    print(json.dumps({
        "metric": "particle-steps/sec/chip "
                  "(SPHENIX SPH + P3M self-gravity, all-active)",
        "value": round(rate, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(rate / BASELINE_NODE, 3),
        "n_particles": n_parts,
        "grid": list(eng.grid.cdim) + [eng.grid.K],
        "mesh_N": gp.mesh_N,
        "ic": _IC,
        "steps_timed": n_steps,
        "wall_s": round(elapsed, 2),
        **diag,
    }))


def _main_dmo(ic, n_parts):
    """Gravity-only scale row: flat-column P2P + PM mesh on its own
    split timestep — the EAGLE_DMO_low_z configuration class
    (/root/reference/examples/EAGLE_DMO_low_z/EAGLE_DMO_25: 5.3e7 DM
    particles, gravity only)."""
    from swift_subtask_dev_tpu.engine import DMEngine, EngineConfig
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.models.gravity import (GravityParams,
                                                      GravitySolver)

    n1 = _N1
    gp = GravityParams(G=1.0, eps=0.5 / n1, mesh_N=_MESH_N)
    r_cut = gp.r_cut_ratio * gp.a_smooth * 1.0 / gp.mesh_N
    grid = CellGrid.build_columns(ic["box"],
                                  interaction_range=r_cut * _SLACK,
                                  pos=ic["pos"], headroom=_HEADROOM)
    solver = GravitySolver(gp, grid)

    def gfn(s):
        [(acc, pot)] = solver.short_range_accelerations([s])
        return acc, pot

    def mfn(s):
        [(acc, pot)] = solver.mesh_accelerations([s])
        return acc, pot

    eng = DMEngine(grid, EngineConfig(dt_min=1e-9, dt_max=2e-4,
                                      eta_grav=gp.eta,
                                      p2p_reach=solver.pm.r_cut,
                                      mesh_dt_max=64 * 2e-4,
                                      backend="flat"),
                   0.0, 1.0, gravity_fn=gfn, eps_soft=gp.eps,
                   mesh_fn=mfn, mesh_dt_scale=solver.pm.r_s)
    eng.solver_builder = lambda g: GravitySolver(gp, g)
    eng.load_dm(ic["pos"], ic["m"], ic["v"])
    eng.init_particles()

    # DM steps run the reference's per-step loop (integer timeline +
    # bin-driven dt); each step syncs its diag scalars, which the 1e7+
    # particle counts amortise
    for _ in range(4):                    # warm-up: compile step+rebucket
        eng.step()
    np.asarray(eng.state["a_grav"])

    n_steps = _STEPS
    t0 = time.time()
    for _ in range(n_steps):
        eng.step()
    np.asarray(eng.state["a_grav"])
    elapsed = time.time() - t0

    # candidate diagnostic at the P2P reach (all pairs within r_cut are
    # "true" work for the short-range pass)
    st = dict(eng.state)
    st["h"] = st["mask"] * 0 + np.float32(solver.pm.r_cut)
    ngb = n_parts * (4 / 3 * np.pi) * float(solver.pm.r_cut) ** 3
    diag = _candidate_diag(eng.grid, st, 1.0, float(solver.pm.r_cut),
                           ngb)

    rate = n_steps * n_parts / elapsed
    print(json.dumps({
        "metric": "particle-steps/sec/chip "
                  "(DMO P3M self-gravity, all-active)",
        "value": round(rate, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(rate / BASELINE_NODE, 3),
        "n_particles": n_parts,
        "grid": list(eng.grid.cdim) + [eng.grid.K],
        "mesh_N": gp.mesh_N,
        "ic": _IC,
        "mode": "dmo",
        "steps_timed": n_steps,
        "wall_s": round(elapsed, 2),
        **diag,
    }))


if __name__ == "__main__":
    main()
