"""Command-line interface — the analog of the reference's swift binary.

Mirrors the flag surface of swift.c:210-341: physics switches (--hydro,
--self-gravity, --cosmology), a YAML parameter file, -P overrides,
-n step limits, -r restart, and the same parameter sections
(TimeIntegration, Snapshots, SPH, Gravity, Scheduler, Statistics,
Restarts...).  Run modes:

  --hydro [--self-gravity] [--cosmology]   gas engine (SPHENIX KDK)
  --self-gravity (no --hydro)              collisionless DMO engine
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time as wallclock

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="swift-tpu",
        description="TPU-native cosmological SPH + gravity engine")
    ap.add_argument("paramfile", help="YAML parameter file")
    ap.add_argument("--hydro", action="store_true",
                    help="run with hydrodynamics")
    ap.add_argument("--self-gravity", action="store_true",
                    help="run with self-gravity")
    ap.add_argument("--cosmology", action="store_true",
                    help="comoving cosmological integration")
    ap.add_argument("--external-gravity", action="store_true",
                    help="external potential from the YAML (one of the "
                         "reference's potential/ sections: PointMass / "
                         "Isothermal / Hernquist / NFW / NFW_MN / "
                         "DiscPatch / SineWave / Constant)")
    ap.add_argument("--limiter", action="store_true",
                    help="time-step limiter (reference --limiter: wake "
                         "particles >2 bins above an active neighbour)")
    ap.add_argument("--cooling", action="store_true",
                    help="radiative cooling (model from the YAML: "
                         "LambdaCooling / ConstCooling / EAGLECooling)")
    ap.add_argument("--star-formation", action="store_true",
                    help="EAGLE pressure-law star formation "
                         "(gas -> star conversion)")
    ap.add_argument("--feedback", action="store_true",
                    help="EAGLE thermal SNII stellar feedback")
    ap.add_argument("--sinks", action="store_true",
                    help="sink particles (GEARSink: section; sink/GEAR)")
    ap.add_argument("--black-holes", action="store_true",
                    help="EAGLE black holes (seeding/accretion/AGN)")
    ap.add_argument("--eagle", action="store_true",
                    help="meta flag: hydro + self-gravity + cosmology + "
                         "cooling + star formation + feedback + limiter "
                         "(reference swift.c --eagle)")
    ap.add_argument("-R", "--radiation", action="store_true",
                    help="radiative transfer (GEARRT: section; rt/GEAR "
                         "M1 closure, subcycled per TimeIntegration:"
                         "max_nr_rt_subcycles; star particles are the "
                         "photon sources)")
    ap.add_argument("-n", "--steps", type=int, default=-1,
                    help="maximum number of steps")
    ap.add_argument("-P", "--param", action="append", default=[],
                    metavar="SEC:PAR:VAL", help="parameter override")
    ap.add_argument("-r", "--restart", action="store_true",
                    help="resume from the checkpoint in Restarts:basename")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debugging)")
    ap.add_argument("--backend", default="flat",
                    choices=["flat", "gather", "pallas", "pallas_ring",
                             "xla"],
                    help="neighbour-loop backend; default 'flat' (the "
                         "column/z-sorted Pallas engine — the fast path; "
                         "self-gravity runs fall back to 'xla')")
    ap.add_argument("--shards", type=int, default=0,
                    help="run the flat-backend pair passes sharded over N "
                         "devices (x-slab shard_map with ppermute column "
                         "halos — the MPI-rank analog, proxy.c); the "
                         "column grid is built cost-balanced for N slabs")
    ap.add_argument("-v", "--verbose", action="store_true")
    return ap


def build_sph_params(params):
    """SPH: YAML section -> scheme params object (the compile-time scheme
    selection of configure.ac:1954, resolved at run time here).
    Returns (sph, scheme_name) or raises ValueError for unknown schemes."""
    from .models.sph import kernels, SCHEMES

    kernel_name = params.opt_string("SPH", "kernel", "cubic-spline")
    scheme_name = params.opt_string("SPH", "scheme", "sphenix")
    common = dict(
        kernel=kernels.KERNELS[kernel_name],
        eta_neighbours=params.get_float("SPH", "resolution_eta"),
        CFL=params.get_float("SPH", "CFL_condition"),
        h_tolerance=params.opt_float("SPH", "h_tolerance", 1e-4),
        h_max=params.opt_float("SPH", "h_max", 1e30),
        max_smoothing_iterations=params.opt_int(
            "SPH", "max_ghost_iterations", 30),
        minimal_internal_energy=params.opt_float(
            "SPH", "minimal_internal_energy", 0.0),
    )
    if scheme_name not in SCHEMES:
        raise ValueError(
            f"unknown SPH:scheme '{scheme_name}' "
            f"(have: {', '.join(sorted(SCHEMES))})")
    if scheme_name.startswith("gizmo"):
        # Gizmo: --with-riemann-solver (configure.ac:2036) -> runtime param
        common["riemann_solver"] = params.opt_string(
            "SPH", "riemann_solver", "exact")
    if scheme_name == "planetary":
        common["eos"] = _build_planetary_eos(params)
    return SCHEMES[scheme_name](**common), scheme_name


def _build_planetary_eos(params):
    """EoS: YAML section -> PlanetaryEOS (eos_init, planetary
    equation_of_state.h:1140; material selection flags mirror the
    reference's planetary_use_* parameters, converted to internal units
    like convert_units_Til)."""
    from .models.sph import planetary_eos as pe

    from .models.sph import eos_tables as et

    flags = (("planetary_use_idg_def", pe.ID_IDG_DEF),
             ("planetary_use_Til_iron", pe.ID_TIL_IRON),
             ("planetary_use_Til_granite", pe.ID_TIL_GRANITE),
             ("planetary_use_Til_water", pe.ID_TIL_WATER),
             ("planetary_use_Til_basalt", pe.ID_TIL_BASALT))
    mats = tuple(mid for name, mid in flags
                 if params.opt_int("EoS", name, 0))
    # internal -> SI factors from the InternalUnitSystem section
    UM = params.opt_float("InternalUnitSystem", "UnitMass_in_cgs", 1e3)
    UL = params.opt_float("InternalUnitSystem", "UnitLength_in_cgs", 1e2)
    UV = params.opt_float("InternalUnitSystem", "UnitVelocity_in_cgs", 1e2)
    rho_to_si = (UM * 1e-3) / (UL * 1e-2) ** 3
    u_to_si = (UV * 1e-2) ** 2
    P_from_si = 1.0 / (rho_to_si * u_to_si)
    # table-based families: planetary_use_* flag + *_table_file path
    # (equation_of_state.h:1140 eos_init reads the same pairs)
    hm80, sesame = [], []
    table_flags = (("HM80_HHe", 200), ("HM80_ice", 201),
                   ("HM80_rock", 202), ("SESAME_iron", 300),
                   ("SESAME_basalt", 301), ("SESAME_water", 302),
                   ("SS08_water", 303), ("ANEOS_forsterite", 400),
                   ("ANEOS_iron", 401), ("ANEOS_Fe85Si15", 402))
    for name, mid in table_flags:
        if not params.opt_int("EoS", f"planetary_use_{name}", 0):
            continue
        path = params.get_string("EoS", f"planetary_{name}_table_file")
        mats = mats + (mid,)
        if mid // 100 == 2:
            kw = et.HM80_DEFAULTS[mid]
            hm80.append((mid, et.load_hm80(path, **kw)
                         .in_internal(rho_to_si, u_to_si, P_from_si)))
        else:
            sesame.append((mid, et.load_sesame(path)
                           .in_internal(rho_to_si, u_to_si, P_from_si)))
    if not mats:
        mats = (pe.ID_IDG_DEF,)
    return pe.PlanetaryEOS(
        materials=mats,
        gamma=params.opt_float("EoS", "planetary_idg_gamma", 5.0 / 3.0),
        rho_to_si=rho_to_si, u_to_si=u_to_si,
        P_from_si=P_from_si,
        hm80_tables=tuple(hm80), sesame_tables=tuple(sesame))


def _needs_xla_backend(sph) -> bool:
    """Schemes using the force-loop j-extras / gradient min-max protocol
    (Gizmo) run on the XLA stencil only — the Pallas kernels don't carry
    those extensions yet."""
    return bool(getattr(sph.mod, "FORCE_J_EXTRA", ())
                or getattr(sph.mod, "GRADIENT_MAX_KEYS", ()))


def build_pressure_floor(params, units, sph):
    """GEARPressureFloor: YAML section -> the Jeans pressure floor
    clamped into the ghost-finalised pressure (pressure_floor/GEAR)."""
    if not params.has("GEARPressureFloor"):
        return None
    from .subgrid.pressure_floor import GEARPressureFloor
    return GEARPressureFloor.from_params(
        params, units.constants(), kernel_gamma=float(sph.kernel.gamma))


def build_subgrid(params, units, args, cosmology, sph):
    """Wire the subgrid stack from the YAML sections + CLI switches.

    Returns (cooling_fn, star_formation, entropy_floor, feedback,
    bh_model) — any of which may be None.  Mirrors the reference's
    *_props_init chain (cooling_init, entropy_floor_init,
    starformation_init, feedback_init, black_holes_props_init).
    """
    from .subgrid.cooling import (ConstDuCooling, ConstLambdaCooling,
                                  make_cooling_fn)
    from .subgrid.entropy_floor import EagleEntropyFloor
    from .subgrid.star_formation import EagleStarFormation
    from .subgrid.feedback import EagleThermalFeedback

    phys_const = units.constants()
    G = phys_const.const_newton_G

    # comoving critical baryon density anchors the over-density thresholds
    rho_crit_baryon_0 = 0.0
    if cosmology is not None:
        import math
        rho_crit0 = 3.0 * cosmology.H0 ** 2 / (8.0 * math.pi * G)
        rho_crit_baryon_0 = cosmology.Omega_b * rho_crit0

    floor = None
    if params.has("EAGLEEntropyFloor"):
        floor = EagleEntropyFloor.from_params(
            params, units, phys_const,
            rho_crit_baryon_0=rho_crit_baryon_0)

    cooling_fn = None
    if args.cooling:
        u_min = params.opt_float("SPH", "minimal_internal_energy", 0.0)
        if params.has("EAGLECooling") or params.has("QLACooling") \
                or params.has("COLIBRECooling"):
            from .subgrid.eagle_cooling import (EagleCooling,
                                                make_eagle_cooling_fn)
            if params.has("QLACooling"):
                # cooling/QLA: same tables, primordial abundances only
                model = EagleCooling.from_params(
                    params, units, phys_const, section="QLACooling",
                    metal_free=True)
            elif params.has("COLIBRECooling"):
                # cooling/COLIBRE: the newer Ploeckinger & Schaye table
                # set — same interpolation/implicit-solve machinery over
                # the synthesized tables (swap build for real tables)
                model = EagleCooling.from_params(
                    params, units, phys_const, section="COLIBRECooling")
            else:
                # real Wiersma tables when EAGLECooling:dir_name points
                # at a table directory (the reference's required
                # parameter, EAGLE/cooling.c:939); synthesized analytic
                # stand-ins otherwise
                import os as _os
                tdir = params.opt_string("EAGLECooling", "dir_name", "")
                if tdir and _os.path.isdir(tdir):
                    model = EagleCooling.from_wiersma(
                        tdir, units,
                        hydrogen_mass_fraction=params.opt_float(
                            "EAGLECooling", "H_mass_fraction", 0.752),
                        helium_mass_fraction=params.opt_float(
                            "EAGLECooling", "He_mass_fraction", 0.248))
                else:
                    model = EagleCooling.from_params(params, units,
                                                     phys_const)
            cooling_fn = make_eagle_cooling_fn(model, floor,
                                               u_minimal=u_min)
        elif params.has("GrackleCooling"):
            # cooling/grackle analog: primordial H/He non-equilibrium
            # network, substepped in the cooling hook
            # (cooling/grackle/cooling.c:772)
            from .subgrid.primordial import (PrimordialCooling,
                                             initial_fractions,
                                             make_primordial_cooling_fn)
            model = PrimordialCooling.from_params(params, units)
            cooling_fn = make_primordial_cooling_fn(model, floor,
                                                    u_minimal=u_min)
            # the run() path adds these species tiles to the gas state
            cooling_fn.species_init = (
                lambda shape, m=model: initial_fractions(m, shape))
        else:
            if params.has("LambdaCooling"):
                model = ConstLambdaCooling.from_cgs(
                    params.get_float("LambdaCooling", "lambda_nH2_cgs"),
                    units, phys_const)
            elif params.has("ConstCooling"):
                model = ConstDuCooling(
                    cooling_rate=params.get_float("ConstCooling",
                                                  "cooling_rate"))
            else:
                raise ValueError(
                    "--cooling given but no cooling section in the YAML "
                    "(EAGLECooling / LambdaCooling / ConstCooling / "
                    "GrackleCooling)")
            cooling_fn = make_cooling_fn(model, floor, u_minimal=u_min)

    star_formation = None
    if args.star_formation:
        # the reference picks the SF model at ./configure time
        # (--with-star-formation=EAGLE|GEAR|QLA); here the YAML section
        # name selects it at runtime
        if params.has("GEARStarFormation"):
            from .subgrid.star_formation_variants import GEARStarFormation
            star_formation = GEARStarFormation.from_params(
                params, units, phys_const, G,
                kernel_gamma=float(sph.kernel.gamma))
        elif params.has("QLAStarFormation"):
            from .subgrid.star_formation_variants import QLAStarFormation
            star_formation = QLAStarFormation.from_params(
                params, units, phys_const,
                rho_crit_baryon_0=rho_crit_baryon_0)
        else:
            star_formation = EagleStarFormation.from_params(
                params, units, phys_const, G,
                rho_crit_baryon_0=rho_crit_baryon_0, floor=floor)

    feedback = None
    if args.feedback:
        if params.has("GEARFeedback"):
            from .subgrid.feedback import GEARFeedback
            sec = "GEARFeedback"
            feedback = GEARFeedback.from_physical(
                units, phys_const,
                f_E=params.opt_float(sec, "supernovae_efficiency", 1.0),
                E_SNII_cgs=params.opt_float(sec, "SNII_energy_erg",
                                            1.0e51),
                snii_delay=params.opt_float(sec, "SNII_delay", 0.0))
        else:
            sec = "EAGLEFeedback"
            model = params.opt_string(sec, "SNII_feedback_model",
                                      "Thermal")
            if model.lower() == "kinetic":
                # feedback/EAGLE_kinetic: paired isotropic kicks
                from .subgrid.feedback import EagleKineticFeedback
                feedback = EagleKineticFeedback.from_physical(
                    units, phys_const,
                    f_E=params.opt_float(sec, "SNII_energy_fraction",
                                         1.0),
                    E_SNII_cgs=params.opt_float(sec, "SNII_energy_erg",
                                                1.0e51),
                    snii_delay=params.opt_float(sec, "SNII_delay", 0.0))
            else:
                feedback = EagleThermalFeedback.from_physical(
                    units, phys_const,
                    delta_T_K=10.0 ** params.opt_float(
                        sec, "SNII_delta_T_K_log10", 7.5),
                    f_E=params.opt_float(sec, "SNII_energy_fraction",
                                         1.0),
                    E_SNII_cgs=params.opt_float(sec, "SNII_energy_erg",
                                                1.0e51),
                    snii_delay=params.opt_float(sec, "SNII_delay", 0.0))

    bh_model = None
    if getattr(args, "black_holes", False):
        if params.has("DefaultBlackHoles"):
            # black_holes/Default: passive BHs, density pass only
            from .subgrid.black_holes import DefaultBlackHoles
            bh_model = DefaultBlackHoles.from_params(params, units,
                                                     phys_const, G)
        elif params.has("SPINJETAGN"):
            # black_holes/SPIN_JET: spin evolution + AGN jets
            from .subgrid.spin_jet import SpinJetBlackHoles
            bh_model = SpinJetBlackHoles.from_params(params, units,
                                                     phys_const, G)
        else:
            from .subgrid.black_holes import EagleBlackHoles
            bh_model = EagleBlackHoles.from_params(params, units,
                                                   phys_const, G)

    sink_model = None
    if getattr(args, "sinks", False):
        from .subgrid.sinks import GEARSinks
        sink_model = GEARSinks.from_params(params, units, phys_const)

    enrichment = None
    if args.feedback and params.opt_int("EAGLEFeedback",
                                        "with_enrichment", 1):
        from .subgrid.enrichment import (EagleEnrichment,
                                         load_yield_tables)
        enrichment = EagleEnrichment.from_params(params, units)
        # real Portinari/Marigo/Thielemann yield tables when
        # EAGLEFeedback:filename points at the table directory
        # (feedback.c:728; yield_tables.h read_yield_tables); the
        # shipped EAGLE files store lifetimes in years
        import os as _os
        ypath = params.opt_string("EAGLEFeedback", "filename", "")
        if ypath and _os.path.isdir(ypath):
            enrichment = load_yield_tables(
                ypath, enrichment,
                lifetime_unit_Gyr=params.opt_float(
                    "EAGLEFeedback", "lifetime_unit_Gyr", 1e-9))
    return (cooling_fn, star_formation, floor, feedback, bh_model,
            sink_model, enrichment)


def _run_moving_mesh(args, params, parts, box, t_begin, t_end,
                     dt_max) -> int:
    """Shadowswift driver: 3D moving-mesh finite volumes from the CLI
    (src/hydro/Shadowswift/hydro.h + voronoi3d_algorithm.h semantics —
    conserved quantities on Voronoi cells, exact Riemann face fluxes,
    generators moving with the fluid).  Global adaptive timestep;
    snapshot/statistics cadence from the usual YAML sections."""
    import numpy as np

    from .io.snapshot import PTYPE_GAS, write_snapshot
    from .models.moving_mesh import (ShadowswiftParams, mm3d_step,
                                     mm3d_timestep, voronoi3d)

    gas = parts.get(PTYPE_GAS)
    if gas is None:
        print("shadowswift needs PartType0 in the ICs", file=sys.stderr)
        return 1
    import jax.numpy as jnp
    pos = jnp.asarray(np.asarray(gas["Coordinates"], np.float32))
    vel = np.asarray(gas["Velocities"], np.float32)
    m = np.asarray(gas["Masses"], np.float32)
    u = np.asarray(gas["InternalEnergies"], np.float32)
    pid = np.asarray(gas.get("ParticleIDs", np.arange(len(m))))
    gamma = params.opt_float("SPH", "hydro_gamma", 5.0 / 3.0)
    M = params.opt_int("SPH", "shadowswift_candidates", 32)
    p = ShadowswiftParams(
        box=tuple(float(b) for b in box), gamma=gamma,
        CFL=params.opt_float("SPH", "CFL_condition", 0.2),
        steer=params.opt_float("SPH", "shadowswift_steer", 1.0))
    # conserved state straight from the IC masses (mm3d_init derives m
    # from rho*V; the CLI trusts the IC masses like the engines do)
    ke = 0.5 * m * (vel ** 2).sum(-1)
    Q = {"m": jnp.asarray(m),
         "p": jnp.asarray(m[:, None] * vel),
         "E": jnp.asarray(m * u + ke)}

    snap_base = params.opt_string("Snapshots", "basename", "snap")
    snap_dt = params.opt_float("Snapshots", "delta_time", 0.0)
    n_steps_max = args.steps if args.steps >= 0 else 10 ** 9
    t = float(t_begin)
    next_snap = t
    isnap = 0
    step = 0
    while t < t_end and step < n_steps_max:
        if snap_dt > 0 and t >= next_snap:
            vor = voronoi3d(pos, p.box, M=M)
            V = np.maximum(np.asarray(vor["volume"]), 1e-30)
            mm = np.asarray(Q["m"])
            mom = np.asarray(Q["p"])
            vout = mom / np.maximum(mm, 1e-30)[:, None]
            u_out = (np.asarray(Q["E"])
                     - 0.5 * (mom * vout).sum(-1)) / np.maximum(mm, 1e-30)
            write_snapshot(
                f"{snap_base}_{isnap:04d}.hdf5", p.box, t,
                {PTYPE_GAS: {"Coordinates": np.asarray(pos),
                             "Velocities": vout, "Masses": mm,
                             "InternalEnergies": u_out,
                             "Densities": mm / V,
                             "Volumes": V,
                             "ParticleIDs": pid}})
            isnap += 1
            next_snap += snap_dt
        dt = float(mm3d_timestep(p, pos, M, Q))
        dt = min(dt, float(dt_max), float(t_end) - t)
        pos, Q = mm3d_step(p, pos, Q, jnp.float32(dt), M)
        t += dt
        step += 1
        print(f"step {step} t={t:.6g} dt={dt:.3g}")
    return 0


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.eagle:
        # swift.c --eagle: shorthand for the full EAGLE model stack
        args.hydro = args.self_gravity = args.cosmology = True
        args.cooling = args.star_formation = args.feedback = True
        args.limiter = True

    if args.cpu:
        import os
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from .engine import DMEngine, Engine, EngineConfig
    from .grid import CellGrid
    from .io.snapshot import (read_snapshot, write_snapshot,
                              gas_state_to_fields, PTYPE_GAS, PTYPE_DM,
                              PTYPE_STARS)
    from .io.logs import TimestepsWriter
    from .io import restart as rst
    from .io.statistics import StatisticsWriter, species_statistics
    from .models.cosmology import make_cosmology_from_params
    from .models.gravity import GravityParams, GravitySolver
    from .models.sph.sphenix import SPHENIXParams
    from .models.sph import kernels
    from .utils import Params, UnitSystem

    params = Params.from_file(args.paramfile, overrides=args.param)

    units = UnitSystem(
        UnitMass_in_cgs=params.opt_float("InternalUnitSystem",
                                         "UnitMass_in_cgs", 1.0),
        UnitLength_in_cgs=params.opt_float("InternalUnitSystem",
                                           "UnitLength_in_cgs", 1.0),
        UnitVelocity_in_cgs=params.opt_float("InternalUnitSystem",
                                             "UnitVelocity_in_cgs", 1.0),
        UnitCurrent_in_cgs=params.opt_float("InternalUnitSystem",
                                            "UnitCurrent_in_cgs", 1.0),
        UnitTemp_in_cgs=params.opt_float("InternalUnitSystem",
                                         "UnitTemp_in_cgs", 1.0))

    cosmology = None
    if args.cosmology:
        cosmology = make_cosmology_from_params(params, units.constants())
        t_begin, t_end = cosmology.a_begin, cosmology.a_end
    else:
        t_begin = params.get_float("TimeIntegration", "time_begin")
        t_end = params.get_float("TimeIntegration", "time_end")
    dt_max = params.get_float("TimeIntegration", "dt_max")
    dt_min = params.opt_float("TimeIntegration", "dt_min", 1e-17)

    ic_file = params.get_string("InitialConditions", "file_name")
    hdr, parts, ic_units = read_snapshot(ic_file)
    box = np.atleast_1d(np.asarray(hdr["BoxSize"], np.float64))
    if box.size == 1:
        box = np.repeat(box, 3)

    if not args.hydro and not args.self_gravity \
            and not args.external_gravity:
        print("Nothing to do: pass --hydro, --self-gravity and/or "
              "--external-gravity", file=sys.stderr)
        return 1

    # --- moving-mesh scheme: its own finite-volume driver --------------------
    # (hydro/Shadowswift is not an SPH scheme — faces, not kernels; the
    # reference selects it at configure time, here via SPH:scheme)
    if args.hydro and params.opt_string("SPH", "scheme", "sphenix") \
            == "shadowswift":
        return _run_moving_mesh(args, params, parts, box,
                                t_begin, t_end, dt_max)

    # --- external potential (potential/ stack; runner_others.c:114) ----------
    ext_pot = None
    ext_mult = ext_eps = 0.0
    if args.external_gravity:
        from .models.potentials import potential_from_params
        built = potential_from_params(params, units.constants(), box,
                                      units=units)
        if built is None:
            print("--external-gravity given but no potential section in "
                  "the YAML (PointMassPotential / IsothermalPotential / "
                  "HernquistPotential / NFWPotential / NFW_MNPotential / "
                  "DiscPatchPotential / SineWavePotential / "
                  "ConstantPotential)", file=sys.stderr)
            return 1
        ext_pot, ext_mult, ext_eps = built

    from .io.snapshot import PTYPE_BH, PTYPE_NEUTRINO, PTYPE_SINK
    gas = parts.get(PTYPE_GAS)
    dm = parts.get(PTYPE_DM)
    stars_ic = parts.get(PTYPE_STARS)
    bh_ic = parts.get(PTYPE_BH)
    nu_ic = parts.get(PTYPE_NEUTRINO)
    sink_ic = parts.get(PTYPE_SINK)
    dmo = ((args.self_gravity or args.external_gravity)
           and not args.hydro)
    # gas + DM (+ stars/BH) cosmological volumes run the multi-species
    # engine (engine policies hydro|self_gravity|cosmology, engine.c:2245)
    multi = (args.hydro and args.self_gravity
             and (dm is not None or stars_ic is not None
                  or bh_ic is not None or nu_ic is not None
                  or sink_ic is not None
                  or args.star_formation or args.feedback
                  or args.black_holes or args.sinks))

    # --- gravity parameter block (shared by both run modes) ------------------
    gp = None
    if args.self_gravity:
        gp = GravityParams(
            G=units.constants().const_newton_G,
            eps=params.opt_float("Gravity", "max_physical_baryon_softening",
                                 params.opt_float("Gravity",
                                                  "comoving_baryon_softening",
                                                  1e-3)),
            eps_dm=params.opt_float(
                "Gravity", "max_physical_DM_softening",
                params.opt_float("Gravity", "comoving_DM_softening", 0.0)),
            mesh_N=params.opt_int("Gravity", "mesh_side_length", 64),
            a_smooth=params.opt_float("Gravity", "a_smooth", 1.25),
            r_cut_ratio=params.opt_float("Gravity", "r_cut_max", 4.5),
            mesh_gradient=params.opt_string("Gravity", "mesh_gradient",
                                            "spectral"),
            eta=params.opt_float("Gravity", "eta", 0.025),
            theta_cr=params.opt_float("Gravity", "theta_cr", 0.7),
            multipole_order=params.opt_int("Gravity",
                                           "multipole_order", 5),
            mac=params.opt_string("Gravity", "MAC", "geometric"),
            adaptive_eps=params.opt_float("Gravity", "epsilon_fmm",
                                          1e-3))

    # --- observability + restart policy --------------------------------------
    stats_every = params.opt_float("Statistics", "delta_time", 0.0)
    stats = StatisticsWriter(
        params.opt_string("Statistics", "basename", "statistics") + ".txt")
    steps_log = TimestepsWriter("timesteps.txt",
                                cosmological=args.cosmology)
    from .io.logs import PhaseTimers, MemuseLedger, GhostStats
    timers = PhaseTimers()
    memuse = MemuseLedger()
    ghost_stats = GhostStats()
    from .io.lightcone import LightconeParams, LightconeWriter
    from .io.csds import CSDSParams, CSDSWriter
    snap_base = params.opt_string("Snapshots", "basename", "output")
    snap_dt = params.opt_float("Snapshots", "delta_time", 0.0)
    restart_base = params.opt_string("Restarts", "basename",
                                     "restart/swift_tpu")
    policy = rst.RestartPolicy(
        delta_hours=params.opt_float("Restarts", "delta_hours", 5.0),
        max_run_time_hours=params.opt_float("Restarts", "max_run_time", 0.0)
        or None,
        restart_dir=params.opt_string("Restarts", "subdir", "restart"))
    resubmit_on = params.opt_int("Restarts", "resubmit_on_exit", 0)
    resubmit_cmd = params.opt_string("Restarts", "resubmit_command",
                                     "./resub.sh")

    # occupancy re-grid trigger — the TPU analog of the reference's
    # repartition/space_regrid sizing (engine.c:1781, space_regrid):
    # rebuild tighter tiles when K is mostly padding
    rep_kw = dict(
        regrid_shrink_trigger=params.opt_float(
            "Scheduler", "regrid_shrink_trigger", 0.5),
        regrid_cooldown=params.opt_int("Scheduler", "regrid_cooldown",
                                       20))

    if dmo and gp is None:
        # -------- external-potential-only collisionless run -------------------
        # (the reference's Hernquist/Isothermal orbit examples:
        #  swift --external-gravity without --self-gravity)
        if dm is None:
            print("--external-gravity without gas needs PartType1 in "
                  "the ICs", file=sys.stderr)
            return 1
        pos = np.asarray(dm["Coordinates"], np.float64)
        grid = CellGrid.build_for_positions(
            tuple(box), float(box[0]) / 8.0, pos, headroom=1.6)
        eng = DMEngine(grid, EngineConfig(dt_min=dt_min, dt_max=dt_max,
                                          with_external_gravity=True,
                                          eta_grav=ext_mult),
                       t_begin, t_end, gravity_fn=None,
                       eps_soft=ext_eps, cosmology=cosmology,
                       external_potential=ext_pot)
        eng.load_dm(pos, np.asarray(dm["Masses"], np.float32),
                    np.asarray(dm["Velocities"], np.float32),
                    pid=np.asarray(dm["ParticleIDs"]).astype(np.int32))
    elif dmo:
        # ---------------- gravity-only (EAGLE_DMO-style) run ------------------
        if dm is None:
            print("--self-gravity without gas needs PartType1 in the ICs",
                  file=sys.stderr)
            return 1
        pos = np.asarray(dm["Coordinates"], np.float64)
        mesh_N = gp.mesh_N
        # gravity grid: edge >= r_cut (P3M split; models/gravity.py)
        r_cut = gp.r_cut_ratio * gp.a_smooth * float(box[0]) / mesh_N
        if args.backend == "flat":
            # column layout: the flat Pallas P2P kernel drives the DMO run
            grid = CellGrid.build_columns(tuple(box), r_cut * 1.15, pos,
                                          n_shards=max(args.shards, 0))
        else:
            grid = CellGrid.build_for_positions(tuple(box), r_cut * 1.05,
                                                pos, headroom=1.6)
        if args.verbose:
            print(f"grid: cdim={grid.cdim} K={grid.K} C={grid.C}")
        solver = GravitySolver(gp, grid)

        shard_n = 0
        if args.shards > 0:
            if args.backend != "flat":
                print("--shards needs --backend flat", file=sys.stderr)
                return 1
            import jax
            if len(jax.devices()) < args.shards:
                print(f"--shards {args.shards}: only "
                      f"{len(jax.devices())} devices visible",
                      file=sys.stderr)
                return 1
            shard_n = args.shards
            solver.fft_shard_n = shard_n   # distributed slab-FFT mesh

        if params.opt_int("Gravity", "split_mesh_kicks", 1):
            if shard_n > 0:
                gfn = solver.gas_short_range_sharded_fn(shard_n)
            else:
                def gfn(s):
                    [(acc, pot)] = solver.short_range_accelerations([s])
                    return acc, pot

            def mfn(s):
                [(acc, pot)] = solver.mesh_accelerations([s])
                return acc, pot
            mesh_kw = dict(mesh_fn=mfn, mesh_dt_scale=solver.pm.r_s)
        else:
            def gfn(s):
                # adaptive MAC (Gravity:MAC: adaptive): feed last-step
                # accelerations so the Dehnen criterion can move
                # outermost-shell pairs from P2P to masked M2L
                a_prev = None
                if gp.mac == "adaptive" and "a_grav" in s:
                    import jax.numpy as jnp
                    a_prev = s["a_grav"] + s.get(
                        "a_grav_mesh", jnp.zeros_like(s["a_grav"]))
                [(acc, pot)] = solver.accelerations([s],
                                                    a_old=[a_prev])
                return acc, pot
            mesh_kw = {}

        eng = DMEngine(grid, EngineConfig(dt_min=dt_min, dt_max=dt_max,
                                          eta_grav=gp.eta,
                                          p2p_reach=solver.pm.r_cut,
                                          shard_n=shard_n,
                                          with_external_gravity=(
                                              ext_pot is not None),
                                          backend=("flat" if args.backend
                                                   == "flat" else "xla"),
                                          **rep_kw),
                       t_begin, t_end, gravity_fn=gfn,
                       eps_soft=(gp.eps_dm or gp.eps),
                       cosmology=cosmology, external_potential=ext_pot,
                       **mesh_kw)
        solver.eps_per_species = [gp.eps_dm or gp.eps]
        if gp.mac == "adaptive" and solver.use_fmm:
            # rebuild-cadence static MAC promotion (Gravity:
            # mac_update_every steps): whole shell offsets accepted by
            # every cell leave the P2P stencil — a re-jit when the set
            # changes, like the reference remaking tasks at rebuild
            cadence = params.opt_int("Gravity", "mac_update_every", 8)

            def _mac_hook(e, _c=[0], _solver=solver):
                if _c[0] % max(cadence, 1) == 0:
                    a_old = e.state["a_grav"] + e.state["a_grav_mesh"]
                    _solver.update_adaptive_promotion([e.state], [a_old])
                _c[0] += 1

            eng.pre_step_hook = _mac_hook
        eng.load_dm(pos, np.asarray(dm["Masses"], np.float32),
                    np.asarray(dm["Velocities"], np.float32),
                    pid=np.asarray(dm["ParticleIDs"]).astype(np.int32))
        def _mk_solver(g, _eps=solver.eps_per_species):
            s = GravitySolver(gp, g, fft_shard_n=shard_n)
            s.eps_per_species = _eps   # survive auto re-grids
            return s
        eng.solver_builder = _mk_solver
    elif multi:
        # -------- gas + DM (+ stars) cosmological volume (MultiEngine) -------
        from .engine_multi import MultiEngine
        if gas is None:
            print("--hydro needs PartType0 in the ICs", file=sys.stderr)
            return 1
        try:
            sph, scheme_name = build_sph_params(params)
        except ValueError as e:
            print(str(e), file=sys.stderr)
            return 1
        if _needs_xla_backend(sph) and args.backend != "xla":
            if args.verbose:
                print(f"scheme {scheme_name}: forcing --backend xla")
            args.backend = "xla"
        (cooling_fn, star_formation, floor, feedback, bh_model,
         sink_model, enrichment) = build_subgrid(params, units, args,
                                                 cosmology, sph)

        pos_g = np.asarray(gas["Coordinates"], np.float64)
        h0 = np.asarray(gas["SmoothingLengths"], np.float32)
        pos_all = [pos_g]
        if dm is not None:
            pos_all.append(np.asarray(dm["Coordinates"], np.float64))
        if stars_ic is not None:
            pos_all.append(np.asarray(stars_ic["Coordinates"], np.float64))
        if nu_ic is not None:
            pos_all.append(np.asarray(nu_ic["Coordinates"], np.float64))
        if sink_ic is not None:
            pos_all.append(np.asarray(sink_ic["Coordinates"], np.float64))
        if sph.h_max < 1e29:
            h_sizing = float(sph.h_max)
            h0 = np.minimum(h0, sph.h_max)
            reach = h_sizing * sph.kernel.gamma * 1.01
        else:
            h_sizing = float(h0.max())
            reach = h_sizing * sph.kernel.gamma * 1.3
        # flat works with the full subgrid stack: gas-gas hydro and the
        # all-species P2P gravity ride the flat Pallas kernels, while the
        # cross-species star/BH/sink loops run the 27-stencil over the
        # SAME column grid (exact: folded shifts make ncz=1 rolls genuine
        # periodic z-images)
        use_flat = args.backend == "flat"
        if use_flat:
            # column/z-sorted layout: columns must cover r_cut
            r_cut = (gp.r_cut_ratio * gp.a_smooth
                     * float(box[0]) / gp.mesh_N)
            grid = CellGrid.build_columns(
                tuple(box), max(reach, r_cut * 1.15),
                np.concatenate(pos_all), n_shards=max(args.shards, 0))
            solver = GravitySolver(gp, grid)
        else:
            grid = CellGrid.build_for_positions(
                tuple(box), reach, np.concatenate(pos_all), headroom=1.6)
            try:
                solver = GravitySolver(gp, grid)
            except ValueError:
                # fine cells but too few for the FMM band: coarsen to the
                # P3M regime (cell edge >= r_cut) like the DMO path
                r_cut = (gp.r_cut_ratio * gp.a_smooth
                         * float(box[0]) / gp.mesh_N)
                grid = CellGrid.build_for_positions(
                    tuple(box), max(reach, r_cut * 1.05),
                    np.concatenate(pos_all), headroom=1.6)
                solver = GravitySolver(gp, grid)
        if args.verbose:
            print(f"grid: cdim={grid.cdim} K={grid.K} C={grid.C}")
        shard_n = 0
        if args.shards > 0:
            if not use_flat:
                print("--shards needs --backend flat", file=sys.stderr)
                return 1
            import jax
            if len(jax.devices()) < args.shards:
                print(f"--shards {args.shards}: only "
                      f"{len(jax.devices())} devices visible",
                      file=sys.stderr)
                return 1
            shard_n = args.shards
            solver.fft_shard_n = shard_n   # distributed slab-FFT mesh
        cfg = EngineConfig(dt_min=dt_min, dt_max=dt_max,
                           with_self_gravity=True,
                           with_timestep_limiter=args.limiter,
                           with_external_gravity=ext_pot is not None,
                           eta_grav=gp.eta, eps_soft=gp.eps,
                           p2p_reach=solver.pm.r_cut,
                           pressure_floor=build_pressure_floor(
                               params, units, sph),
                           # chemistry/GEAR_DIFFUSION (0 = off)
                           chem_diffusion=params.opt_float(
                               "GEARChemistry", "diffusion_coefficient",
                               0.0),
                           backend="flat" if use_flat else "xla",
                           shard_n=shard_n,
                           # collectives can't live inside while_loop
                           ghost_unroll=(shard_n > 0),
                           max_ghost_iterations=(
                               8 if shard_n > 0 else 30), **rep_kw)
        mesh_kw = {}
        if params.opt_int("Gravity", "split_mesh_kicks", 1):
            if shard_n > 0:
                gravity_fn = solver.short_range_sharded_fn(shard_n)
            else:
                gravity_fn = solver.short_range_accelerations
            mesh_kw = dict(mesh_fn=solver.mesh_accelerations,
                           mesh_dt_scale=solver.pm.r_s)
        else:
            gravity_fn = solver.accelerations

        nu_model = None
        if nu_ic is not None:
            from .subgrid.neutrino import NeutrinoModel
            if "mesh_fn" not in mesh_kw:
                print("neutrino particles need Gravity:split_mesh_kicks",
                      file=sys.stderr)
                return 1
            nu_model = NeutrinoModel.from_params(params, units)
        rt_model = rt_fn_multi = None
        if args.radiation:
            from .rt import (rt_params_from_yaml, pick_n_subcycles,
                             make_rt_multi_fn)
            built_rt = rt_params_from_yaml(params, units)
            if built_rt is None:
                print("--radiation given but no GEARRT:/SPHM1RT: section",
                      file=sys.stderr)
                return 1
            rt_model, max_sub, rt_scheme = built_rt
            n_sub = pick_n_subcycles(rt_model, dt_max, float(h0.min()),
                                     max_sub)
            L = params.opt_array(
                "GEARRT" if rt_scheme == "gear" else "SPHM1RT",
                "star_luminosities", [1.0] * rt_model.ngroups)
            rt_fn_multi = make_rt_multi_fn(sph, rt_model, n_sub, L,
                                           scheme=rt_scheme)
        # per-species softenings (multi-softening, gravity_properties.c):
        # species order matches multi_step's short-range pool
        # (gas, dm?, stars..., all baryons after dm take gp.eps)
        eps_dm_v = gp.eps_dm or gp.eps
        solver.eps_per_species = \
            ([gp.eps, eps_dm_v] if dm is not None else [gp.eps]) \
            + [gp.eps] * 3
        tracers = None
        if params.has("EAGLETracers"):
            # --with-tracers=EAGLE analog: the YAML section switches the
            # thermal-history records on (tracers/EAGLE/tracers.h)
            from .subgrid.tracers import EagleTracers
            tracers = EagleTracers.from_units(units, units.constants())
        eng = MultiEngine(grid, sph, cfg, t_begin, t_end,
                          gravity_fn=gravity_fn,
                          eps_soft=(gp.eps, eps_dm_v),
                          cosmology=cosmology, cooling_fn=cooling_fn,
                          star_formation=star_formation,
                          entropy_floor=floor, feedback=feedback,
                          bh_model=bh_model, nu_model=nu_model,
                          sink_model=sink_model, enrichment=enrichment,
                          external_potential=ext_pot, rt_fn=rt_fn_multi,
                          tracers=tracers, **mesh_kw)
        def _mk_solver(g, _eps=solver.eps_per_species):
            s = GravitySolver(gp, g, fft_shard_n=shard_n)
            s.eps_per_species = _eps   # survive auto re-grids
            return s
        eng.solver_builder = _mk_solver
        u_ic = np.asarray(gas["InternalEnergies"], np.float32)
        if scheme_name in ("gadget2", "pressure-entropy"):
            from .models.sph.gadget2 import entropy_from_internal_energy
            rho_ic = np.asarray(gas.get(
                "Densities", np.ones(len(u_ic))), np.float32)
            u_ic = np.asarray(entropy_from_internal_energy(
                sph, rho_ic, u_ic), np.float32)
        Z_ic = ef_ic = None
        if params.has("GEARChemistry"):
            # chemistry/GEAR: metal-mass carriers, same smoothed loops
            from .subgrid.chemistry import GearChemistry
            chem = GearChemistry.from_params(params)
            Z_ic, ef_ic = chem.particle_arrays(len(pos_g), gas)
        elif params.has("EAGLEChemistry") or params.has("EAGLECooling"):
            from .subgrid.chemistry import EagleChemistry
            chem = EagleChemistry.from_params(params)
            Z_ic, ef_ic = chem.particle_arrays(len(pos_g), gas)
        eng.load_gas(pos_g, np.asarray(gas["Masses"], np.float32),
                     np.asarray(gas["Velocities"], np.float32),
                     u_ic, h0,
                     pid=np.asarray(gas["ParticleIDs"]).astype(np.int32),
                     Z=Z_ic, elem_frac=ef_ic)
        if rt_model is not None:
            from .rt import rt_init_state
            eng.state["gas"] = rt_init_state(eng.state["gas"], rt_model)
        if cooling_fn is not None and hasattr(cooling_fn, "species_init"):
            eng.state["gas"] = {
                **eng.state["gas"],
                **cooling_fn.species_init(eng.state["gas"]["mask"].shape)}
        if dm is not None:
            eng.load_dm(np.asarray(dm["Coordinates"], np.float64),
                        np.asarray(dm["Masses"], np.float32),
                        np.asarray(dm["Velocities"], np.float32),
                        pid=np.asarray(dm["ParticleIDs"]).astype(np.int32))
        if stars_ic is not None:
            eng.load_stars(
                np.asarray(stars_ic["Coordinates"], np.float64),
                np.asarray(stars_ic["Masses"], np.float32),
                np.asarray(stars_ic["Velocities"], np.float32),
                pid=np.asarray(stars_ic["ParticleIDs"]).astype(np.int32))
        elif star_formation is not None:
            eng.alloc_stars(extra_per_cell=params.opt_int(
                "Scheduler", "cell_extra_sparts", 8))
        if nu_ic is not None:
            vel = nu_ic.get("Velocities")
            eng.load_nu(
                np.asarray(nu_ic["Coordinates"], np.float64),
                np.asarray(nu_ic["Masses"], np.float32),
                v=(np.asarray(vel, np.float32) if vel is not None
                   and np.abs(np.asarray(vel)).max() > 0 else None),
                pid=np.asarray(nu_ic["ParticleIDs"]).astype(np.int32))
        if sink_ic is not None:
            eng.load_sinks(
                np.asarray(sink_ic["Coordinates"], np.float64),
                np.asarray(sink_ic["Masses"], np.float32),
                np.asarray(sink_ic["Velocities"], np.float32),
                pid=np.asarray(sink_ic["ParticleIDs"]).astype(np.int32),
                extra_per_cell=params.opt_int(
                    "Scheduler", "cell_extra_sinks", 8))
        elif sink_model is not None:
            eng.alloc_sinks(extra_per_cell=params.opt_int(
                "Scheduler", "cell_extra_sinks", 8))
        if bh_ic is not None:
            npt = len(bh_ic["Coordinates"])
            eng.load_bh(
                np.asarray(bh_ic["Coordinates"], np.float64),
                np.asarray(bh_ic["Masses"], np.float32),
                np.asarray(bh_ic["Velocities"], np.float32),
                h=np.asarray(bh_ic.get(
                    "SmoothingLengths",
                    np.full(npt, float(np.median(h0)), np.float32)),
                    np.float32),
                pid=np.asarray(bh_ic["ParticleIDs"]).astype(np.int32),
                m_subgrid=np.asarray(bh_ic.get(
                    "SubgridMasses", bh_ic["Masses"]), np.float32))
    else:
        # ---------------- hydro (+ optional self-gravity) run -----------------
        if gas is None:
            print("--hydro needs PartType0 in the ICs", file=sys.stderr)
            return 1
        try:
            sph, scheme_name = build_sph_params(params)
        except ValueError as e:
            print(str(e), file=sys.stderr)
            return 1
        if _needs_xla_backend(sph) and args.backend != "xla":
            if args.verbose:
                print(f"scheme {scheme_name}: forcing --backend xla")
            args.backend = "xla"
        cooling_fn = build_subgrid(params, units, args, cosmology, sph)[0]

        pos = np.asarray(gas["Coordinates"], np.float64)
        h0 = np.asarray(gas["SmoothingLengths"], np.float32)
        # grid sizing: SPH:h_max is the contract when given (one outlier h
        # must not coarsen the whole grid); otherwise h.max() + headroom
        if sph.h_max < 1e29:
            h_sizing = float(sph.h_max)
            h0 = np.minimum(h0, sph.h_max)
            reach = h_sizing * sph.kernel.gamma * 1.01
        else:
            h_sizing = float(h0.max())
            reach = h_sizing * sph.kernel.gamma * 1.3
        if args.backend == "flat":
            # column/z-sorted layout for the flat Pallas engine; with
            # self-gravity the columns must also cover the P2P r_cut
            reach_grid = reach
            if args.self_gravity:
                r_cut = (gp.r_cut_ratio * gp.a_smooth
                         * float(box[0]) / gp.mesh_N)
                reach_grid = max(reach, r_cut * 1.15)
            grid = CellGrid.build_columns(tuple(box), reach_grid, pos,
                                          n_shards=max(args.shards, 0))
        else:
            grid = CellGrid.build_for_positions(tuple(box), reach, pos,
                                                headroom=1.6)
        if args.verbose:
            print(f"grid: cdim={grid.cdim} K={grid.K} C={grid.C}")

        shard_n = 0
        if args.shards > 0:
            if args.backend != "flat":
                print("--shards needs --backend flat", file=sys.stderr)
                return 1
            import jax
            if len(jax.devices()) < args.shards:
                print(f"--shards {args.shards}: only "
                      f"{len(jax.devices())} devices visible",
                      file=sys.stderr)
                return 1
            shard_n = args.shards
        gravity_fn = None
        cfg = EngineConfig(dt_min=dt_min, dt_max=dt_max,
                           with_self_gravity=args.self_gravity,
                           with_timestep_limiter=args.limiter,
                           with_external_gravity=ext_pot is not None,
                           pressure_floor=build_pressure_floor(
                               params, units, sph),
                           # chemistry/GEAR_DIFFUSION (0 = off)
                           chem_diffusion=params.opt_float(
                               "GEARChemistry", "diffusion_coefficient",
                               0.0),
                           backend=args.backend, shard_n=shard_n,
                           # collectives can't live inside while_loop
                           ghost_unroll=(shard_n > 0),
                           max_ghost_iterations=(
                               8 if shard_n > 0 else 30), **rep_kw)
        if ext_pot is not None and not args.self_gravity:
            cfg = dataclasses.replace(cfg, eta_grav=ext_mult,
                                      eps_soft=ext_eps)
        mesh_fn = None
        mesh_dt_scale = 0.0
        if args.self_gravity:
            solver = GravitySolver(gp, grid, fft_shard_n=shard_n)
            cfg = dataclasses.replace(cfg, p2p_reach=solver.pm.r_cut,
                                      eps_soft=gp.eps, eta_grav=gp.eta)
            if params.opt_int("Gravity", "split_mesh_kicks", 1):
                # reference default: the PM field lives on its own
                # timestep (kick.h:255, engine.c:2406)
                if shard_n > 0:
                    gravity_fn = solver.gas_short_range_sharded_fn(shard_n)
                else:
                    gravity_fn = solver.gas_short_range_fn()
                mesh_fn = solver.gas_mesh_fn()
                mesh_dt_scale = solver.pm.r_s
            else:
                gravity_fn = solver.gas_gravity_fn()

        rt_model = rt_fn_one = None
        if args.radiation:
            # fixed photon sources = the ICs' star particles (the
            # reference's Iliev/StromgrenSphere examples: one star spart
            # emitting const luminosities, rt/GEAR)
            from .rt import (rt_params_from_yaml, pick_n_subcycles,
                             make_rt_fn)
            built_rt = rt_params_from_yaml(params, units)
            if built_rt is None:
                print("--radiation given but no GEARRT:/SPHM1RT: section",
                      file=sys.stderr)
                return 1
            rt_model, max_sub, rt_scheme = built_rt
            n_sub = pick_n_subcycles(rt_model, dt_max, float(h0.min()),
                                     max_sub)
            src_pos = src_L = None
            if stars_ic is not None:
                src_pos = np.asarray(stars_ic["Coordinates"], np.float64)
                L = params.opt_array(
                    "GEARRT" if rt_scheme == "gear" else "SPHM1RT",
                    "star_luminosities", [1.0] * rt_model.ngroups)
                src_L = np.tile(np.asarray(L, np.float64),
                                (len(src_pos), 1))
            rt_fn_one = make_rt_fn(sph, rt_model, n_sub, src_pos, src_L,
                                   scheme=rt_scheme)
        eng = Engine(grid, sph, cfg, t_begin, t_end,
                     gravity_fn=gravity_fn, cosmology=cosmology,
                     cooling_fn=cooling_fn, external_potential=ext_pot,
                     mesh_fn=mesh_fn, mesh_dt_scale=mesh_dt_scale,
                     rt_fn=rt_fn_one)
        if args.self_gravity:
            eng.solver_builder = lambda g: GravitySolver(gp, g,
                                             fft_shard_n=shard_n)
        u_ic = np.asarray(gas["InternalEnergies"], np.float32)
        if scheme_name in ("gadget2", "pressure-entropy"):
            # the entropy schemes evolve A = P/rho^gamma in the u slots;
            # convert the IC internal energies with the IC densities
            # (hydro_set_init_internal_energy analog)
            from .models.sph.gadget2 import entropy_from_internal_energy
            rho_ic = np.asarray(gas.get(
                "Densities", np.ones(len(u_ic))), np.float32)
            u_ic = np.asarray(entropy_from_internal_energy(
                sph, rho_ic, u_ic), np.float32)
        Z_ic = ef_ic = None
        if params.has("GEARChemistry"):
            # chemistry/GEAR: metal-mass carriers, same smoothed loops
            from .subgrid.chemistry import GearChemistry
            chem = GearChemistry.from_params(params)
            Z_ic, ef_ic = chem.particle_arrays(len(pos), gas)
        elif params.has("EAGLEChemistry") or params.has("EAGLECooling"):
            from .subgrid.chemistry import EagleChemistry
            chem = EagleChemistry.from_params(params)
            Z_ic, ef_ic = chem.particle_arrays(len(pos), gas)
        extra = None
        if scheme_name == "planetary":
            # planetary ICs carry per-particle material ids (hydro_io.h)
            mat = gas.get("MaterialIDs",
                          np.zeros(len(pos), np.int32))
            extra = {"mat_id": np.asarray(mat, np.int32)}
        eng.load_particles(
            pos, np.asarray(gas["Masses"], np.float32),
            np.asarray(gas["Velocities"], np.float32),
            u_ic, h0,
            pid=np.asarray(gas["ParticleIDs"]).astype(np.int32),
            Z=Z_ic, elem_frac=ef_ic, extra_fields=extra)
        if rt_model is not None:
            from .rt import rt_init_state
            eng.state = rt_init_state(eng.state, rt_model)
        if cooling_fn is not None and hasattr(cooling_fn, "species_init"):
            eng.state = {**eng.state, **cooling_fn.species_init(
                eng.state["mask"].shape)}

    # --- gas particle splitting (engine_split_gas_particles, engine.c:268;
    # SPH:particle_splitting / particle_splitting_mass_threshold) ------------
    if args.hydro and params.opt_int("SPH", "particle_splitting", 0):
        eng.split_mass_threshold = params.get_float(
            "SPH", "particle_splitting_mass_threshold")

    # --- restart resume -------------------------------------------------------
    t0 = wallclock.time()
    if args.restart:
        state, meta = rst.load_checkpoint(restart_base)
        rst.restore_engine(eng, state, meta)
        if args.verbose:
            print(f"resumed from {restart_base} at step {eng.step_count}")
    else:
        eng.init_particles()
        if args.verbose:
            print(f"init done in {wallclock.time()-t0:.1f}s")

    # field selection (output_options.c) + output list (output_list.c)
    from .io.output_options import (OutputList, apply_selection,
                                    read_output_list, read_select_output)
    select = None
    if params.opt_int("Snapshots", "select_output_on", 0):
        select = read_select_output(
            params.get_string("Snapshots", "select_output"))
    out_list = None
    if params.opt_int("Snapshots", "output_list_on", 0):
        _, listed = read_output_list(
            params.get_string("Snapshots", "output_list"))
        out_list = OutputList(listed)
        out_list.advance_past(t_begin)

    def species_states():
        """{'gas'|'dm'|'stars': tiled state} for any engine kind."""
        if "mask" in eng.state:
            return {("dm" if dmo else "gas"): eng.state}
        return eng.state

    name2pt = {"gas": PTYPE_GAS, "dm": PTYPE_DM, "stars": PTYPE_STARS,
               "bh": PTYPE_BH, "nu": PTYPE_NEUTRINO,
               "sinks": PTYPE_SINK}

    def write_snap(i):
        parts_out = {}
        for name, st in species_states().items():
            fields = gas_state_to_fields(eng.grid, st)
            if len(fields["Coordinates"]) == 0:
                continue  # e.g. star slots before any star formed
            if name == "dm":
                fields.pop("InternalEnergies", None)
                fields.pop("SmoothingLengths", None)
                fields.pop("Densities", None)
            parts_out[name2pt[name]] = fields
        parts_out = apply_selection(parts_out, select)
        # lossy per-field compression + XMF sidecar + distributed pieces
        # (io_compression.h:28, xmf.c, distributed_io.c:751)
        filt = params.opt_string("Snapshots", "lossy_compression", "")
        comp = None
        if filt:
            comp = {k: filt for st in parts_out.values() for k in st
                    if k not in ("ParticleIDs",)}
        n_dist = params.opt_int("Snapshots", "distributed", 0)
        xmf = bool(params.opt_int("Snapshots", "xmf", 0))
        if n_dist > 1:
            from .io.snapshot import write_snapshot_distributed
            write_snapshot_distributed(
                f"{snap_base}_{i:04d}", tuple(box), out_time(),
                parts_out, n_dist, units=units, cosmo=cosmology,
                compression=comp)
        else:
            write_snapshot(f"{snap_base}_{i:04d}.hdf5", tuple(box),
                           out_time(), parts_out, units=units,
                           cosmo=cosmology, cells_cdim=eng.grid.cdim,
                           compression=comp, write_xmf_sidecar=xmf)

    csds = None
    if params.opt_int("CSDS", "enabled", 0):
        csds = CSDSWriter(CSDSParams(
            delta_step=params.opt_int("CSDS", "delta_step", 10),
            basename=params.opt_string("CSDS", "basename", "csds"),
            format=params.opt_string("CSDS", "format", "hdf5")),
            eng.grid)

    stf = None
    stf_p = None
    from .io.structure_finding import (StructureFinder,
                                       StructureFindingParams)
    stf_p = StructureFindingParams.from_params(params,
                                               cosmology is not None)
    if stf_p is not None:
        stf = StructureFinder(stf_p, eng.grid, box,
                              cosmology is not None)

    lightcone = None
    if args.cosmology and params.opt_int("Lightcone0", "enabled", 0):
        lp = LightconeParams(
            observer_position=tuple(
                params.opt_array("Lightcone0", "position",
                                       [0.0, 0.0, 0.0])),
            radius_max=params.opt_float("Lightcone0", "radius_max", 1e30),
            radius_min=params.opt_float("Lightcone0", "radius_min", 0.0),
            basename=params.opt_string("Lightcone0", "basename",
                                       "lightcone"),
            nside=params.opt_int("Lightcone0", "nside", 0),
            shell_edges=tuple(params.opt_array(
                "Lightcone0", "shell_radii", [])),
            map_types=tuple(params.opt_string(
                "Lightcone0", "map_names", "TotalMass").split(",")))
        lightcone = LightconeWriter(lp, cosmology, eng.grid)

    cosmological = cosmology is not None

    def out_time():
        """Output clock: scale factor a for cosmological runs (the
        reference's snapshot/statistics triggers, engine_io.c), physical
        time otherwise."""
        if cosmological:
            return cosmology.a_of_ti(eng.timeline.ti_current)
        return eng.time

    # cosmological output cadences are MULTIPLICATIVE in a
    # (engine_io.c delta_time semantics; output_list.c for explicit lists)
    if out_list is not None:
        next_snap = out_list.next_time()
    elif snap_dt > 0:
        first = params.opt_float(
            "Snapshots",
            "scale_factor_first" if cosmological else "time_first",
            t_begin * snap_dt if cosmological else t_begin + snap_dt)
        next_snap = first
    else:
        next_snap = np.inf
    next_stat = t_begin
    snap_i = 0
    # star-formation history log (SFR.txt, star_formation_logger.h)
    sfh = None
    if getattr(eng, "sf", None) is not None:
        from .io.statistics import SFHWriter
        sfh = SFHWriter()
    max_steps = args.steps if args.steps > 0 else 10 ** 9
    stopped = False
    from .utils.timeline import MAX_NR_TIMESTEPS
    while (eng.timeline.ti_current < MAX_NR_TIMESTEPS
           and eng.step_count < max_steps and not stopped):
        t_before = out_time()
        ti_before = eng.timeline.ti_current
        t_launch = wallclock.time()
        with timers.phase("step"):
            diag = eng.step()
        busy_ms = (wallclock.time() - t_launch) * 1000.0
        if lightcone is not None or csds is not None:
            # observe the primary species (gas, else the single-species
            # state); per-species lightcones ride the same machinery
            sp = species_states()
            primary = sp.get("gas") or sp.get("dm") or eng.state
        if lightcone is not None:
            with timers.phase("lightcone"):
                lightcone.after_step(primary, ti_before,
                                     eng.timeline.ti_current)
        if csds is not None:
            with timers.phase("csds"):
                csds.after_step(primary, eng.timeline.ti_current,
                                eng.time)
        t_now = out_time()
        steps_log.write(eng.step_count, t_now, t_now - t_before,
                        diag, busy_ms=busy_ms)
        if sfh is not None:
            sfh.write(eng.step_count, eng.time,
                      t_now if cosmological else 1.0, diag)
        ghost_stats.record(int(diag.get("n_ghost_iter", 0)))
        if args.verbose and eng.step_count % 10 == 0:
            print(f"step {eng.step_count}  "
                  f"{'a' if cosmological else 't'}={t_now:.6f} "
                  f"active={int(diag['n_active'])} "
                  f"wall={wallclock.time()-t0:.1f}s")
        if t_now >= next_stat and stats_every > 0:
            with timers.phase("statistics"):
                sp = species_states()
                if len(sp) == 1:
                    st = species_statistics(eng.grid,
                                            next(iter(sp.values())))
                else:
                    from .io.statistics import collect_statistics
                    st = collect_statistics(eng.grid, sp)["total"]
                stats.write(eng.step_count, t_now, st)
            if cosmological:
                next_stat = max(next_stat, t_now) * stats_every \
                    if stats_every > 1.0 else t_now + stats_every
            else:
                next_stat += stats_every
        if stf is not None:
            with timers.phase("structure_finding"):
                stf.rebind(eng.grid)
                stf.after_step(species_states(), t_now)
        if t_now >= next_snap:
            with timers.phase("snapshot_io"):
                write_snap(snap_i)
            snap_i += 1
            if out_list is not None:
                out_list.advance_past(t_now)
                next_snap = out_list.next_time()
            elif cosmological:
                next_snap = next_snap * snap_dt if snap_dt > 1.0 \
                    else t_now + snap_dt
            else:
                next_snap += snap_dt
        if policy.should_checkpoint() or policy.should_stop():
            with timers.phase("restart_io"):
                rst.save_checkpoint(restart_base, eng.state,
                                    rst.engine_meta(eng))
            policy.checkpointed()
            if policy.should_stop():
                print("stop requested (stop file / max_run_time): "
                      "checkpointed and exiting", file=sys.stderr)
                stopped = True

    write_snap(snap_i)
    # queue-chained jobs: resubmit after a clean max_run_time stop
    # (Restarts:resubmit_on_exit + resubmit_command; swift.c:1873)
    if (stopped and resubmit_on
            and getattr(policy, "stop_reason", "") == "maxtime"):
        rc = policy.resubmit(resubmit_cmd)
        print(f"resubmitted via '{resubmit_cmd}' (rc={rc})",
              file=sys.stderr)
    if lightcone is not None:
        lightcone.flush()
    if csds is not None:
        csds.flush()
    timers.dump("phase_timings.txt")
    memuse.dump(eng.state, step=eng.step_count)
    ghost_stats.dump()
    params.dump_used("used_parameters.yml")
    params.dump_unused("unused_parameters.yml")
    if args.verbose:
        print(f"done: {eng.step_count} steps, t={eng.time:.6f}, "
              f"wrote {snap_base}_{snap_i:04d}.hdf5")
    return 0


def fof_main(argv=None) -> int:
    """swift-tpu-fof: snapshot -> FOF -> group catalogue (swift_fof.c)."""
    ap = argparse.ArgumentParser(prog="swift-tpu-fof")
    ap.add_argument("snapshot", help="input snapshot/IC HDF5")
    ap.add_argument("-o", "--output", default="fof_catalogue.hdf5")
    ap.add_argument("-l", "--linking-length", type=float, default=0.0,
                    help="absolute linking length (default: 0.2 * mean "
                         "interparticle separation)")
    ap.add_argument("--min-size", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import os
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import h5py
    import jax.numpy as jnp
    from .grid import CellGrid, bucket_fields
    from .io.snapshot import read_snapshot
    from .ops.fof import fof_labels, group_catalogue

    hdr, parts, _ = read_snapshot(args.snapshot)
    box = np.atleast_1d(np.asarray(hdr["BoxSize"], np.float64))
    if box.size == 1:
        box = np.repeat(box, 3)
    # FOF runs on all gravitating particles (reference: gparts)
    pos_all, pid_all, m_all, v_all = [], [], [], []
    for pt, fields in parts.items():
        if "Coordinates" in fields:
            npt = len(fields["Coordinates"])
            pos_all.append(np.asarray(fields["Coordinates"], np.float64))
            pid_all.append(np.asarray(fields["ParticleIDs"]))
            m_all.append(np.asarray(fields.get("Masses", np.ones(npt)),
                                    np.float64))
            v_all.append(np.asarray(fields.get("Velocities",
                                               np.zeros((npt, 3))),
                                    np.float64))
    pos = np.concatenate(pos_all)
    pids = np.concatenate(pid_all)
    masses = np.concatenate(m_all)
    vels = np.concatenate(v_all)
    n = len(pos)

    ell = args.linking_length
    if ell <= 0:
        ell = 0.2 * float(np.prod(box)) ** (1 / 3) / n ** (1 / 3)

    grid = CellGrid.build_for_positions(
        tuple(box), max(ell, min(box) / 64), pos, headroom=1.6)
    f, mask, off, nov = bucket_fields(
        grid, jnp.asarray(pos),
        {"pid": jnp.asarray(pids.astype(np.int64) & 0x7FFFFFFF,
                            jnp.int32),
         "m": jnp.asarray(masses, jnp.float32),
         "v": jnp.asarray(vels, jnp.float32)})
    if int(nov):
        print(f"warning: {int(nov)} particles overflowed cells",
              file=sys.stderr)
    labels, nsweeps = fof_labels(grid, mask, off, ell)
    corners = grid.cell_corners()
    pos_tiled = np.mod(corners[:, None, :] + np.asarray(off), box)
    cat = group_catalogue(np.asarray(labels), np.asarray(mask),
                          min_size=args.min_size,
                          m=np.asarray(f["m"]), pos=pos_tiled,
                          v=np.asarray(f["v"]), box=box)
    valid = np.asarray(mask).reshape(-1) > 0
    gid = cat["group_id"].reshape(-1)[valid]
    pid_out = np.asarray(f["pid"]).reshape(-1)[valid]
    with h5py.File(args.output, "w") as fo:
        g = fo.create_group("Groups")
        g.create_dataset("GroupSizes", data=cat["group_sizes"])
        g.create_dataset("Masses", data=cat["group_mass"])
        g.create_dataset("Centres", data=cat["group_com"])
        g.create_dataset("Velocities", data=cat["group_vel"])
        g.attrs["NumGroups"] = cat["n_groups"]
        g.attrs["LinkingLength"] = ell
        p = fo.create_group("Particles")
        p.create_dataset("ParticleIDs", data=pid_out)
        p.create_dataset("GroupIDs", data=gid)
    print(f"FOF: {cat['n_groups']} groups (min_size={args.min_size}), "
          f"largest={cat['group_sizes'][0] if cat['n_groups'] else 0}, "
          f"{int(nsweeps)} sweeps -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
