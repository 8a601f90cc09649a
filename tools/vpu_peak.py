#!/usr/bin/env python
"""Calibrate VPU f32 throughput on this chip: a Pallas kernel doing pure
fused multiply-adds on VMEM-resident vregs, no memory traffic in the hot
loop.  Gives the ops/s ceiling that bounds the SPH pair kernels."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 256, 128
INNER = 64          # fma chains per fori iteration (unrolled)
ITERS = 2000


def kernel(x_ref, o_ref):
    x = x_ref[:]

    def body(i, acc):
        a, b = acc
        for _ in range(INNER):
            a = a * jnp.float32(1.000001) + b      # 1 fma
            b = b * jnp.float32(0.999999) + jnp.float32(1e-7)
        return (a, b)

    a, b = jax.lax.fori_loop(0, ITERS, body, (x, x + 1.0))
    o_ref[:] = a + b


def main():
    x = jnp.ones((ROWS, LANES), jnp.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    jf = jax.jit(f)
    np.asarray(jf(x))        # compile
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = jf(x)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    # 2 fma = 4 flops per INNER element-pass
    flops = ROWS * LANES * INNER * ITERS * 2 * 2
    print(f"elapsed {dt*1e3:.2f} ms  -> VPU f32 {flops/dt/1e12:.2f} "
          f"Tflop/s ({flops/2/dt/1e12:.2f} Tfma/s)")


if __name__ == "__main__":
    main()
