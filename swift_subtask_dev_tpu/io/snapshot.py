"""Gadget/SWIFT-compatible HDF5 snapshots.

Implements the reference's snapshot format contract (single_io.c:437
read, :1059 write; common_io.c): HDF5 groups /Header, /Units,
/InternalCodeUnits, /Cosmology, /PartType0..6 with per-field unit
attributes, and — when a cell grid is supplied — /Cells spatial metadata
(cell-contiguous storage + Centres/Counts/OffsetsInFile per type,
common_io_cells.c:275).  A user of the reference can read our snapshots
with swiftsimio/gadget tools and vice versa.
"""

from __future__ import annotations

from typing import Dict, Optional

import h5py
import numpy as np

from ..utils.units import UnitSystem

# particle type indices (reference part_type.h:28-35)
PTYPE_GAS = 0
PTYPE_DM = 1
PTYPE_DM_BACKGROUND = 2
PTYPE_SINK = 3
PTYPE_STARS = 4
PTYPE_BH = 5
PTYPE_NEUTRINO = 6
N_TYPES = 7

# unit metadata per standard field: (U_M, U_L, U_t, U_I, U_T exponents,
# a-exponent, h-exponent) following io_properties.h conventions
FIELD_UNITS = {
    "Coordinates": (0, 1, 0, 0, 0, 1.0, -1.0),
    "Velocities": (0, 1, -1, 0, 0, 0.5, 0.0),
    "Masses": (1, 0, 0, 0, 0, 0.0, -1.0),
    "InternalEnergies": (0, 2, -2, 0, 0, 0.0, 0.0),
    "SmoothingLengths": (0, 1, 0, 0, 0, 1.0, -1.0),
    "Densities": (1, -3, 0, 0, 0, -3.0, 2.0),
    "Pressures": (1, -1, -2, 0, 0, 0.0, 0.0),
    "ParticleIDs": (0, 0, 0, 0, 0, 0.0, 0.0),
    "Potentials": (0, 2, -2, 0, 0, -1.0, 0.0),
}


def apply_lossy_filter(arr: np.ndarray, filt: str) -> np.ndarray:
    """The reference's lossy output filters (io_compression.h:28):
    mantissa truncation (FMantissa9/13, DMantissa9/13) and fixed-decimal
    rounding (DScale1..6).  Implemented as bit-grooming before the
    (gzip-compressed) write — same information loss, portable storage."""
    if filt in ("on", "off", "gzip", None):
        return arr
    if filt.startswith("FMantissa") or filt.startswith("DMantissa"):
        keep = int(filt.replace("FMantissa", "").replace("DMantissa", ""))
        a = np.asarray(arr, np.float32)
        bits = a.view(np.uint32)
        drop = 23 - keep
        mask = np.uint32(0xFFFFFFFF) << np.uint32(drop)
        # round-to-nearest on the dropped bits
        half = np.uint32(1) << np.uint32(drop - 1) if drop > 0 else 0
        groomed = ((bits + half) & mask).view(np.float32)
        return groomed.astype(arr.dtype if np.issubdtype(
            np.asarray(arr).dtype, np.floating) else np.float32)
    if filt.startswith("DScale"):
        k = int(filt.replace("DScale", ""))
        return np.round(np.asarray(arr, np.float64), k)
    raise ValueError(f"unknown compression filter '{filt}' "
                     "(io_compression.h surface)")


def write_snapshot(path: str, box, time: float,
                   parts: Dict[int, Dict[str, np.ndarray]],
                   units: Optional[UnitSystem] = None,
                   cosmo=None, redshift: float = 0.0,
                   extra_header: Optional[Dict] = None,
                   cells_cdim: Optional[tuple] = None,
                   compression: Optional[Dict[str, str]] = None,
                   write_xmf_sidecar: bool = False):
    """Write a SWIFT-style snapshot.

    parts: {ptype: {field_name: (N,...) array}}; every ptype dict should
    contain at least Coordinates/Velocities/Masses/ParticleIDs.

    cells_cdim: if given, particles are stored cell-contiguously on a
    ``cells_cdim`` top grid and a /Cells group (Centres + per-type
    Counts/OffsetsInFile/Files) is written, enabling spatial sub-reads —
    the reference's common_io_cells.c:275 contract.
    """
    units = units or UnitSystem()
    box3 = np.broadcast_to(np.asarray(box, np.float64).ravel(), (3,))

    cells_meta = None
    if cells_cdim is not None:
        cdim = tuple(int(c) for c in cells_cdim)
        C = cdim[0] * cdim[1] * cdim[2]
        edge = box3 / np.asarray(cdim, np.float64)
        counts_per_type = {}
        offsets_per_type = {}
        for pt, fields in list(parts.items()):
            if not fields:
                continue
            x = np.mod(np.asarray(fields["Coordinates"], np.float64), box3)
            ijk = np.clip((x / edge).astype(np.int64), 0,
                          np.asarray(cdim) - 1)
            lin = (ijk[:, 0] * cdim[1] + ijk[:, 1]) * cdim[2] + ijk[:, 2]
            order = np.argsort(lin, kind="stable")
            parts[pt] = {name: np.asarray(arr)[order]
                         for name, arr in fields.items()}
            counts = np.bincount(lin, minlength=C).astype(np.int64)
            counts_per_type[pt] = counts
            offsets_per_type[pt] = np.concatenate(
                [[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        ix, iy, iz = np.meshgrid(*[np.arange(c) for c in cdim],
                                 indexing="ij")
        centres = (np.stack([ix, iy, iz], -1).reshape(-1, 3) + 0.5) * edge
        cells_meta = (cdim, centres, counts_per_type, offsets_per_type)

    numpart = [0] * N_TYPES
    for pt, fields in parts.items():
        n = len(next(iter(fields.values()))) if fields else 0
        numpart[pt] = n

    with h5py.File(path, "w") as f:
        h = f.create_group("Header")
        h.attrs["BoxSize"] = np.asarray(box, np.float64)
        h.attrs["Time"] = float(time)
        h.attrs["Redshift"] = float(redshift)
        h.attrs["NumPart_ThisFile"] = np.asarray(numpart, np.uint64)
        h.attrs["NumPart_Total"] = np.asarray(numpart, np.uint64)
        h.attrs["NumPart_Total_HighWord"] = np.zeros(N_TYPES, np.uint32)
        h.attrs["NumFilesPerSnapshot"] = 1
        h.attrs["MassTable"] = np.zeros(N_TYPES, np.float64)
        h.attrs["Flag_Entropy_ICs"] = 0
        h.attrs["Dimension"] = 3
        h.attrs["Code"] = np.bytes_(b"swift_subtask_dev_tpu")
        if extra_header:
            for k, v in extra_header.items():
                h.attrs[k] = v

        ug = f.create_group("Units")
        ug.attrs["Unit mass in cgs (U_M)"] = units.UnitMass_in_cgs
        ug.attrs["Unit length in cgs (U_L)"] = units.UnitLength_in_cgs
        ug.attrs["Unit time in cgs (U_t)"] = units.UnitTime_in_cgs
        ug.attrs["Unit current in cgs (U_I)"] = units.UnitCurrent_in_cgs
        ug.attrs["Unit temperature in cgs (U_T)"] = units.UnitTemp_in_cgs
        f.copy("Units", f, name="InternalCodeUnits")

        if cosmo is not None:
            cg = f.create_group("Cosmology")
            cg.attrs["Omega_cdm"] = cosmo.Omega_cdm
            cg.attrs["Omega_b"] = cosmo.Omega_b
            cg.attrs["Omega_lambda"] = cosmo.Omega_lambda
            cg.attrs["Omega_r"] = cosmo.Omega_r
            cg.attrs["Omega_k"] = cosmo.Omega_k
            cg.attrs["h"] = cosmo.h
            cg.attrs["w_0"] = cosmo.w_0
            cg.attrs["w_a"] = cosmo.w_a
            cg.attrs["Scale-factor"] = getattr(cosmo, "a_current", 1.0)
            cg.attrs["Cosmological run"] = 1

        if cells_meta is not None:
            cdim, centres, counts_per_type, offsets_per_type = cells_meta
            cg = f.create_group("Cells")
            meta = cg.create_group("Meta-data")
            meta.attrs["dimension"] = np.asarray(cdim, np.int32)
            meta.attrs["nr_cells"] = np.int32(len(centres))
            meta.attrs["size"] = (box3
                                  / np.asarray(cdim, np.float64))
            cg.create_dataset("Centres", data=centres)
            gc = cg.create_group("Counts")
            go = cg.create_group("OffsetsInFile")
            gf = cg.create_group("Files")
            for pt, counts in counts_per_type.items():
                gc.create_dataset(f"PartType{pt}", data=counts)
                go.create_dataset(f"PartType{pt}",
                                  data=offsets_per_type[pt])
                gf.create_dataset(f"PartType{pt}",
                                  data=np.zeros(len(counts), np.int32))

        for pt, fields in parts.items():
            g = f.create_group(f"PartType{pt}")
            for name, arr in fields.items():
                filt = (compression or {}).get(name)
                data = np.asarray(arr)
                kw = {}
                if filt and filt != "off":
                    data = apply_lossy_filter(data, filt)
                    kw = dict(compression="gzip", compression_opts=4)
                ds = g.create_dataset(name, data=data, **kw)
                if filt:
                    ds.attrs["Lossy compression filter"] = np.bytes_(
                        filt.encode())
                if name in FIELD_UNITS:
                    um, ul, ut, ui, utemp, a_exp, h_exp = FIELD_UNITS[name]
                    ds.attrs["U_M exponent"] = float(um)
                    ds.attrs["U_L exponent"] = float(ul)
                    ds.attrs["U_t exponent"] = float(ut)
                    ds.attrs["U_I exponent"] = float(ui)
                    ds.attrs["U_T exponent"] = float(utemp)
                    ds.attrs["a-scale exponent"] = float(a_exp)
                    ds.attrs["h-scale exponent"] = float(h_exp)
                    ds.attrs["Conversion factor to CGS"] = \
                        units.cgs_factor_for_exponents(
                            (um, ul, ut, ui, utemp))
    if write_xmf_sidecar:
        write_xmf(path, parts, time)


def write_xmf(h5path: str, parts: Dict[int, Dict[str, np.ndarray]],
              time: float) -> str:
    """XDMF sidecar describing the snapshot's particle clouds for
    ParaView/VisIt (the reference's xmf.c prepare/write chain)."""
    import os
    base = os.path.basename(h5path)
    xmf_path = h5path.rsplit(".", 1)[0] + ".xmf"
    lines = ['<?xml version="1.0" ?>',
             '<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>',
             '<Xdmf Version="2.0">', '<Domain>',
             '<Grid Name="Snapshot" GridType="Collection" '
             'CollectionType="Spatial">',
             f'<Time Value="{time}"/>']
    for pt, fields in parts.items():
        if not fields:
            continue
        n = len(next(iter(fields.values())))
        lines += [f'<Grid Name="PartType{pt}" GridType="Uniform">',
                  f'<Topology TopologyType="Polyvertex" '
                  f'NumberOfElements="{n}"/>',
                  '<Geometry GeometryType="XYZ">',
                  f'<DataItem Dimensions="{n} 3" NumberType="Float" '
                  f'Format="HDF">{base}:/PartType{pt}/Coordinates'
                  '</DataItem>', '</Geometry>']
        for name, arr in fields.items():
            if name == "Coordinates":
                continue
            a = np.asarray(arr)
            ncomp = 1 if a.ndim == 1 else a.shape[1]
            att = "Scalar" if ncomp == 1 else "Vector"
            dims = f"{len(a)}" if ncomp == 1 else f"{len(a)} {ncomp}"
            lines += [f'<Attribute Name="{name}" '
                      f'AttributeType="{att}" Center="Node">',
                      f'<DataItem Dimensions="{dims}" Format="HDF">'
                      f'{base}:/PartType{pt}/{name}</DataItem>',
                      '</Attribute>']
        lines.append('</Grid>')
    lines += ['</Grid>', '</Domain>', '</Xmf>'.replace("Xmf", "Xdmf")]
    with open(xmf_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return xmf_path


def write_snapshot_distributed(basename: str, box, time: float,
                               parts: Dict[int, Dict[str, np.ndarray]],
                               n_files: int, **kw):
    """Distributed snapshot: n_files pieces + one virtual meta-file
    (distributed_io.c:751 — one file per rank and a virtual dataset
    meta-file stitching them together).

    Returns the meta-file path; pieces land at <basename>.{i}.hdf5.
    """
    pieces = []
    splits: Dict[int, list] = {}
    for pt, fields in parts.items():
        n = len(next(iter(fields.values()))) if fields else 0
        edges = np.linspace(0, n, n_files + 1).astype(np.int64)
        splits[pt] = edges
    for i in range(n_files):
        sub = {}
        for pt, fields in parts.items():
            lo, hi = splits[pt][i], splits[pt][i + 1]
            sub[pt] = {k: np.asarray(v)[lo:hi] for k, v in fields.items()}
        piece = f"{basename}.{i}.hdf5"
        write_snapshot(piece, box, time, sub, **kw)
        pieces.append(piece)

    meta = f"{basename}.hdf5"
    import os
    with h5py.File(meta, "w") as f:
        h = f.create_group("Header")
        h.attrs["BoxSize"] = np.asarray(box, np.float64)
        h.attrs["Time"] = float(time)
        h.attrs["NumFilesPerSnapshot"] = n_files
        numpart = [0] * N_TYPES
        for pt in parts:
            numpart[pt] = int(splits[pt][-1])
        h.attrs["NumPart_Total"] = np.asarray(numpart, np.uint64)
        h.attrs["NumPart_ThisFile"] = np.asarray(numpart, np.uint64)
        for pt, fields in parts.items():
            g = f.create_group(f"PartType{pt}")
            for name, arr in fields.items():
                a = np.asarray(arr)
                shape = (int(splits[pt][-1]),) + a.shape[1:]
                layout = h5py.VirtualLayout(shape=shape, dtype=a.dtype)
                for i in range(n_files):
                    lo, hi = int(splits[pt][i]), int(splits[pt][i + 1])
                    if hi <= lo:
                        continue
                    vs = h5py.VirtualSource(
                        os.path.basename(pieces[i]),
                        f"PartType{pt}/{name}",
                        shape=(hi - lo,) + a.shape[1:])
                    layout[lo:hi] = vs
                g.create_virtual_dataset(name, layout)
    return meta


def read_snapshot(path: str):
    """Read a SWIFT/Gadget HDF5 snapshot (or ICs).

    Returns (header dict, {ptype: {field: array}}, units or None).
    """
    out: Dict[int, Dict[str, np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        hdr = dict(f["Header"].attrs)
        units = None
        for ug_name in ("InternalCodeUnits", "Units"):
            if ug_name in f:
                ua = f[ug_name].attrs
                def _get(keys, default=1.0):
                    for k in keys:
                        if k in ua:
                            return float(np.ravel(ua[k])[0])
                    return default
                units = UnitSystem(
                    UnitMass_in_cgs=_get(["Unit mass in cgs (U_M)"]),
                    UnitLength_in_cgs=_get(["Unit length in cgs (U_L)"]),
                    UnitVelocity_in_cgs=_get(
                        ["Unit velocity in cgs (U_V)"],
                        _get(["Unit length in cgs (U_L)"])
                        / max(_get(["Unit time in cgs (U_t)"]), 1e-300)),
                    UnitCurrent_in_cgs=_get(["Unit current in cgs (U_I)"]),
                    UnitTemp_in_cgs=_get(["Unit temperature in cgs (U_T)"]),
                )
                break
        for pt in range(N_TYPES):
            key = f"PartType{pt}"
            if key in f:
                out[pt] = {name: np.asarray(ds) for name, ds in
                           f[key].items()}
    return hdr, out, units


def gas_state_to_fields(grid, state) -> Dict[str, np.ndarray]:
    """Extract flat per-particle arrays from a tiled engine state.

    Works for gas and DM states alike: fields absent from the state
    (e.g. u_full/h/rho for collisionless particles) are skipped.
    """
    from ..grid.cellgrid import global_positions
    mask = np.asarray(state["mask"]) > 0
    pos = global_positions(grid, np.asarray(state["off"]))[mask]

    def flat(name):
        return np.asarray(state[name])[mask]

    out = {"Coordinates": pos,
           "Velocities": flat("v_full"),
           "Masses": flat("m"),
           "ParticleIDs": flat("pid").astype(np.uint64)}
    for key, name in (("u_full", "InternalEnergies"),
                      ("h", "SmoothingLengths"),
                      ("rho", "Densities"),
                      ("pot", "Potentials"),
                      # chemistry carriers (chemistry_io.h:
                      # chemistry_write_particles)
                      ("Z", "Metallicities"),
                      ("elem_frac", "ElementMassFractions"),
                      # star formation (star_formation_io.h
                      # star_formation_write_particles)
                      ("sfr", "StarFormationRates"),
                      # tracers (tracers_io.h tracers_write_particles)
                      ("T_max", "MaximalTemperatures"),
                      ("a_Tmax", "MaximalTemperatureScaleFactors"),
                      ("last_AGN_a", "LastAGNFeedbackScaleFactors"),
                      ("birth_time", "BirthTimes"),
                      ("birth_density", "BirthDensities"),
                      ("m_subgrid", "SubgridMasses"),
                      # SPIN_JET BH state (SPIN_JET/black_holes_io.h)
                      ("spin", "Spins"),
                      ("spin_dir", "AngularMomentumDirections"),
                      ("jet_eff", "JetEfficiencies"),
                      ("rad_eff", "RadiativeEfficiencies"),
                      ("acc_mode", "AccretionModes"),
                      ("jet_reservoir", "JetReservoir")):
        if key in state:
            out[name] = flat(key)
    # radiative transfer (rt_io.h rt_write_particles: per-group photon
    # energies/fluxes + the thermochemistry ion fraction)
    if "rt_E" in state:
        E = np.asarray(state["rt_E"])[mask]
        F = np.asarray(state["rt_F"])[mask]
        for g in range(E.shape[-1]):
            out[f"PhotonEnergiesGroup{g + 1}"] = E[..., g]
            out[f"PhotonFluxesGroup{g + 1}"] = F[..., g, :]
        out["MassFractionHI"] = np.asarray(state["x_HI"])[mask]
    return out
