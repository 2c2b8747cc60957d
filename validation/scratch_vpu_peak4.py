"""Independent fused-tree VPU ceiling (round 5, VERDICT item 3).

scratch_vpu_peak3.py shows the *looped* accumulator benchmark saturates at
~7.9e11 lane-ops/s regardless of stream count (1..16) -- each fori_loop
iteration round-trips block-sized accumulators through VMEM, so it bounds
UNFUSED stencil code, not the fused kernel, whose expression trees stay in
vregs.  This harness measures the in-vreg issue ceiling the fused EVP body
should be compared against: fully-unrolled FMA chains (no fori_loop, no
per-iter VMEM traffic), non-affine so nothing folds, with 1..8 independent
chains for ILP.  The saturated rate is the honest VPU_ENVELOPE_MEASURED.

Accounting: each chain step is u = u*y + z (1 fma) followed every 8 steps
by u = u + u*u*1e-12 (mul+fma) to break affine folding; slots counted
exactly as emitted ops.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n_chains, depth):
    def kern(x_ref, y_ref, z_ref, o_ref):
        x = x_ref[:]
        y = y_ref[:]
        z = z_ref[:]
        chains = [x * (1.0 + 0.01 * i) for i in range(n_chains)]
        for step in range(depth):
            chains = [u * y + z for u in chains]
            if step % 8 == 7:
                chains = [u + u * u * 1e-12 for u in chains]
        out = chains[0]
        for u in chains[1:]:
            out = out + u
        o_ref[:] = out
    return kern


def slots_per_point(n_chains, depth):
    fma = depth
    defold = (depth // 8) * 2
    return n_chains * (fma + defold)


def run(bx, by, n_chains, depth, grid=7, n=30):
    shape = (grid * bx, by)
    x = jnp.full(shape, 0.5, jnp.float32)
    y = jnp.full(shape, 0.999, jnp.float32)
    z = jnp.full(shape, 1e-3, jnp.float32)
    blk = pl.BlockSpec((bx, by), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kernel(n_chains, depth), grid=(grid,),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[blk, blk, blk], out_specs=blk,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20))
    g = jax.jit(f)
    out = g(x, y, z); jax.block_until_ready(out)
    val = float(np.asarray(out)[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(x, y, z)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    pts = grid * bx * by
    slots = pts * slots_per_point(n_chains, depth)
    return slots / dt, dt, val


def main():
    best = 0.0
    for n_chains in (1, 2, 4, 8):
        r, dt, val = run(232, 1024, n_chains, 128)
        best = max(best, r)
        print(json.dumps({"chains": n_chains, "depth": 128,
                          "ms": round(dt * 1e3, 3), "val": round(val, 5),
                          "lane_ops_per_s": f"{r:.3e}"}), flush=True)
    # depth-linearity sanity at 4 chains
    for depth in (64, 256):
        r, dt, val = run(232, 1024, 4, depth)
        print(json.dumps({"chains": 4, "depth": depth,
                          "ms": round(dt * 1e3, 3), "val": round(val, 5),
                          "lane_ops_per_s": f"{r:.3e}"}), flush=True)
    print(json.dumps({"fused_tree_peak_lane_ops_per_s": f"{best:.3e}"}),
          flush=True)


if __name__ == "__main__":
    main()
