"""Particle-mesh long-range gravity — TPU-native port of src/mesh_gravity.c.

Pipeline (pm_mesh_compute_potential, mesh_gravity.c:1058):
  CIC deposit -> FFT -> Green fn (-4 pi G / k^2) x Gadget smoothing
  exp(-k^2 r_s^2) x CIC deconvolution (sinc^-4) -> iFFT -> 4-point finite
  difference accelerations -> CIC gather back to particles.

All of it is dense regular math: scatter-add for CIC, ``jnp.fft`` for the
transform (sharded by XLA on a device mesh), elementwise k-space filters.
The smoothing split matches the reference's GADGET2_LONG_RANGE_CORRECTION
(kernel_long_gravity.h:34): long-range potential of a point mass is
-G m erf(r / 2 r_s) / r, and the short-range remainder is handled by the
P2P loops in p2p_gravity.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

F32 = jnp.float32


@dataclass(frozen=True)
class PMMeshParams:
    """Reference defaults: gravity_properties.c:38-40."""

    N: int                      # mesh side length (Gravity:mesh_side_length)
    box: Tuple[float, float, float]
    a_smooth: float = 1.25      # r_s in mesh cells (Gravity:a_smooth)
    r_cut_max_ratio: float = 4.5  # r_cut = ratio * r_s

    @property
    def cell(self) -> float:
        return self.box[0] / self.N

    @property
    def r_s(self) -> float:
        return self.a_smooth * self.cell

    @property
    def r_cut(self) -> float:
        return self.r_cut_max_ratio * self.r_s


def cic_deposit(pm: PMMeshParams, pos: jnp.ndarray, m: jnp.ndarray
                ) -> jnp.ndarray:
    """Cloud-in-cell mass deposit (mesh_gravity.c:56-195).

    pos: (..., 3) absolute positions; m: (...) masses (0 for empty slots).
    Returns (N, N, N) mass grid.
    """
    N = pm.N
    box = jnp.asarray(pm.box, F32)
    p = pos.reshape(-1, 3)
    w = m.reshape(-1)
    x = jnp.mod(p / box * N, N)           # in mesh cells
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - i0
    grid = jnp.zeros((N, N, N), F32)
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1 - f[:, 0], f[:, 0])
        ix = jnp.mod(i0[:, 0] + dx, N)
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1 - f[:, 1], f[:, 1])
            iy = jnp.mod(i0[:, 1] + dy, N)
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1 - f[:, 2], f[:, 2])
                iz = jnp.mod(i0[:, 2] + dz, N)
                grid = grid.at[ix, iy, iz].add(w * wx * wy * wz)
    return grid


def cic_gather(pm: PMMeshParams, field: jnp.ndarray, pos: jnp.ndarray
               ) -> jnp.ndarray:
    """CIC interpolation of a mesh field back to particle positions."""
    N = pm.N
    box = jnp.asarray(pm.box, F32)
    shp = pos.shape[:-1]
    p = pos.reshape(-1, 3)
    x = jnp.mod(p / box * N, N)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - i0
    out = 0.0
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1 - f[:, 0], f[:, 0])
        ix = jnp.mod(i0[:, 0] + dx, N)
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1 - f[:, 1], f[:, 1])
            iy = jnp.mod(i0[:, 1] + dy, N)
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1 - f[:, 2], f[:, 2])
                iz = jnp.mod(i0[:, 2] + dz, N)
                out = out + field[ix, iy, iz] * wx * wy * wz
    return out.reshape(shp)


def cic_gather_multi(pm: PMMeshParams, fields, pos: jnp.ndarray):
    """CIC-interpolate SEVERAL mesh fields at once.

    TPU gathers cost ~12-17 ns per INDEX at any row width, so fetching
    the (ax, ay, az, phi) bundle as one row gather per corner is ~4x
    cheaper than four scalar gathers (the mesh_gravity.c accelerations +
    potential interpolation fused).  Returns a list matching ``fields``.
    """
    N = pm.N
    box = jnp.asarray(pm.box, F32)
    shp = pos.shape[:-1]
    p = pos.reshape(-1, 3)
    x = jnp.mod(p / box * N, N)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - i0
    nf = len(fields)
    stacked = jnp.stack([fld.reshape(-1) for fld in fields], axis=-1)
    out = 0.0
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1 - f[:, 0], f[:, 0])
        ix = jnp.mod(i0[:, 0] + dx, N)
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1 - f[:, 1], f[:, 1])
            iy = jnp.mod(i0[:, 1] + dy, N)
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1 - f[:, 2], f[:, 2])
                iz = jnp.mod(i0[:, 2] + dz, N)
                idx = (ix * N + iy) * N + iz
                out = out + stacked[idx] * (wx * wy * wz)[:, None]
    return [out[:, i].reshape(shp) for i in range(nf)]


def long_range_potential(pm: PMMeshParams, mass_grid: jnp.ndarray,
                         G: float) -> jnp.ndarray:
    """Solve the smoothed Poisson equation on the mesh.

    phi_long(k) = -4 pi G rhohat(k) / k^2 * exp(-k^2 r_s^2) with CIC^2
    deconvolution applied twice (deposit + gather), matching
    mesh_apply_Green_function (mesh_gravity.c:611).
    """
    N = pm.N
    L = pm.box[0]
    rho_k = jnp.fft.rfftn(mass_grid.astype(jnp.float32))

    k_int = jnp.fft.fftfreq(N) * N          # integer frequencies
    kz_int = jnp.fft.rfftfreq(N) * N
    kx = k_int[:, None, None]
    ky = k_int[None, :, None]
    kz = kz_int[None, None, :]

    k_fac = jnp.pi / N
    # 1/sinc(pi k / N) per axis — CIC deconvolution
    def sinc_inv(k):
        x = k_fac * k
        return jnp.where(k == 0, 1.0, x / (jnp.sin(x) + 1e-30))

    cic = (sinc_inv(kx) * sinc_inv(ky) * sinc_inv(kz)) ** 4

    k2_phys = (2 * jnp.pi / L) ** 2 * (kx ** 2 + ky ** 2 + kz ** 2)
    smooth = jnp.exp(-k2_phys * pm.r_s ** 2)
    green = jnp.where(k2_phys > 0,
                      -4 * jnp.pi * G / (k2_phys * L ** 3) * N ** 3, 0.0)

    phi_k = rho_k * green * smooth * cic
    return jnp.fft.irfftn(phi_k, (N, N, N))


def potential_gradient(pm: PMMeshParams, phi: jnp.ndarray) -> jnp.ndarray:
    """a = -grad phi via the 4-point finite difference of the reference
    (mesh_gravity.c accelerations): f'(x) = (8(f+1 - f-1) - (f+2 - f-2))/12h.
    Returns (3, N, N, N)."""
    inv_h = pm.N / pm.box[0]
    acc = []
    for axis in range(3):
        fp1 = jnp.roll(phi, -1, axis)
        fm1 = jnp.roll(phi, 1, axis)
        fp2 = jnp.roll(phi, -2, axis)
        fm2 = jnp.roll(phi, 2, axis)
        dphi = (8.0 * (fp1 - fm1) - (fp2 - fm2)) / 12.0 * inv_h
        acc.append(-dphi)
    return jnp.stack(acc)


def pm_accelerations(pm: PMMeshParams, pos: jnp.ndarray, m: jnp.ndarray,
                     G: float):
    """Full PM pipeline: positions+masses -> (accelerations, potential@parts).

    pos may be any (..., 3); m the matching (...) masses (0 = ignore).
    """
    grid = cic_deposit(pm, pos, m)
    phi = long_range_potential(pm, grid, G)
    acc_mesh = potential_gradient(pm, phi)
    ax = cic_gather(pm, acc_mesh[0], pos)
    ay = cic_gather(pm, acc_mesh[1], pos)
    az = cic_gather(pm, acc_mesh[2], pos)
    pot = cic_gather(pm, phi, pos)
    return jnp.stack([ax, ay, az], axis=-1), pot


def long_range_potential_sharded(pm: PMMeshParams, mass_grid: jnp.ndarray,
                                 G: float, n_shards: int,
                                 axis: str = "x") -> jnp.ndarray:
    """Slab-decomposed distributed Poisson solve — the TPU analog of the
    reference's distributed mesh (mesh_gravity_mpi.c + MPI FFTW): instead
    of letting GSPMD all-gather the (N,N,N) mesh onto every device, the
    FFT itself is decomposed over x-slabs under shard_map:

      1. local rfft over (y, z) on the device's x-slab,
      2. ``all_to_all`` slab transpose x <-> y (the ICI analog of FFTW's
         MPI transpose),
      3. local full-length FFT along x,
      4. Green function x CIC^4 deconvolution x r_s smoothing, with the
         device-local ky band picked by ``axis_index``,
      5. inverse FFT along x, transpose back, inverse rfft over (y, z).

    Input/output are (N, N, N) arrays laid out (or constrained) as
    x-slabs; per-device memory never exceeds O(N^3 / n_shards).
    """
    import jax
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    import numpy as _np

    N = pm.N
    L = pm.box[0]
    if N % n_shards:
        raise ValueError(f"mesh N={N} not divisible by {n_shards} shards")
    Nloc = N // n_shards

    k_int = jnp.fft.fftfreq(N) * N          # integer frequencies
    kz_int = jnp.fft.rfftfreq(N) * N
    k_fac = jnp.pi / N

    def sinc_inv(k):
        x = k_fac * k
        return jnp.where(k == 0, 1.0, x / (jnp.sin(x) + 1e-30))

    mesh = Mesh(_np.asarray(jax.devices()[:n_shards]), (axis,))

    def body(local):                         # (Nloc, N, Nzr) x-slab
        f = jnp.fft.rfftn(local.astype(jnp.float32), axes=(1, 2))
        # slab transpose: split y, gather x  -> (N, Nloc, Nzr)
        t = jax.lax.all_to_all(f, axis, split_axis=1, concat_axis=0,
                               tiled=True)
        t = jnp.fft.fft(t, axis=0)

        i_dev = jax.lax.axis_index(axis)
        ky = jax.lax.dynamic_slice_in_dim(k_int, i_dev * Nloc, Nloc)
        kx = k_int[:, None, None]
        kyb = ky[None, :, None]
        kz = kz_int[None, None, :]
        cic = (sinc_inv(kx) * sinc_inv(kyb) * sinc_inv(kz)) ** 4
        k2_phys = (2 * jnp.pi / L) ** 2 * (kx ** 2 + kyb ** 2 + kz ** 2)
        smooth = jnp.exp(-k2_phys * pm.r_s ** 2)
        green = jnp.where(k2_phys > 0,
                          -4 * jnp.pi * G / (k2_phys * L ** 3) * N ** 3,
                          0.0)
        t = t * (green * smooth * cic)

        t = jnp.fft.ifft(t, axis=0)
        # transpose back: split x, gather y -> (Nloc, N, Nzr)
        f = jax.lax.all_to_all(t, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        return jnp.fft.irfftn(f, s=(N, N), axes=(1, 2))

    f = shard_map(body, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                  check_vma=False)
    return f(mass_grid)
