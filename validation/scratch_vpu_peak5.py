"""Third VPU-envelope leg: zero per-step VMEM operand traffic.

peak3 (looped accumulators) and peak4 (unrolled chains with block-shaped
y/z operands) both saturate at ~7-8e11 lane-ops/s -- but both re-touch
VMEM-resident blocks every step.  This leg runs a fully-unrolled nonlinear
recurrence with *scalar constants only* (no block operands after the
initial load), so temporaries stay in vregs and the measured rate is the
raw VPU issue ceiling.  Per step per chain: t = u*u (mul),
u = t*1e-12 + u (fma), u = u*0.9999 + 1e-4 (fma) -> 3 slots, nonlinear so
nothing folds.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n_chains, depth):
    def kern(x_ref, o_ref):
        x = x_ref[:]
        chains = [x * (1.0 + 0.01 * i) for i in range(n_chains)]
        for _ in range(depth):
            chains = [(u * u) * 1e-12 + (u * 0.9999 + 1e-4) for u in chains]
        out = chains[0]
        for u in chains[1:]:
            out = out + u
        o_ref[:] = out
    return kern


def run(bx, by, n_chains, depth, grid=7, n=30):
    shape = (grid * bx, by)
    x = jnp.full(shape, 0.5, jnp.float32)
    blk = pl.BlockSpec((bx, by), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kernel(n_chains, depth), grid=(grid,),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[blk], out_specs=blk,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20))
    g = jax.jit(f)
    out = g(x); jax.block_until_ready(out)
    val = float(np.asarray(out)[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    pts = grid * bx * by
    slots = pts * n_chains * depth * 3
    return slots / dt, dt, val


def main():
    best = 0.0
    for n_chains in (1, 2, 4, 8):
        r, dt, val = run(232, 1024, n_chains, 128)
        best = max(best, r)
        print(json.dumps({"chains": n_chains, "depth": 128,
                          "ms": round(dt * 1e3, 3), "val": round(val, 5),
                          "lane_ops_per_s": f"{r:.3e}"}), flush=True)
    for depth in (256, 512):
        r, dt, val = run(232, 1024, 4, depth)
        best = max(best, r)
        print(json.dumps({"chains": 4, "depth": depth,
                          "ms": round(dt * 1e3, 3), "val": round(val, 5),
                          "lane_ops_per_s": f"{r:.3e}"}), flush=True)
    print(json.dumps({"in_vreg_peak_lane_ops_per_s": f"{best:.3e}"}),
          flush=True)


if __name__ == "__main__":
    main()
