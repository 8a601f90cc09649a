"""swift_subtask_dev_tpu — a TPU-native cosmological SPH + gravity framework.

A ground-up re-design of the capabilities of SWIFT (the reference C/pthreads/
MPI code) for TPUs: the fine-grained task graph becomes a jit-compiled
bulk-synchronous kick-drift-kick step over padded, cell-bucketed SoA tiles;
neighbour loops become 27-stencil kernels (XLA rolls for the GSPMD-sharded
path, Pallas pencil tiles for the single-chip fast path); MPI proxies become
`jax.sharding` + compiler-inserted ICI collectives; the PM mesh rides
`jnp.fft.fftn`.

Subpackages
-----------
- ``utils``   : units, parameter files, integer timeline, deterministic RNG.
- ``models``  : physics schemes (SPH flavours, EOS, cosmology, gravity).
- ``grid``    : the cell grid / particle bucketing (the space/cell analog).
- ``ops``     : compute kernels (stencil engines, CIC, FFT gravity, Pallas).
- ``parallel``: device-mesh sharding and halo-exchange strategy.
- ``io``      : SWIFT-compatible HDF5 snapshots, statistics, restart.
"""

__version__ = "0.1.0"
