"""Measure the REAL VPU issue peak on this chip with pure-FMA Pallas kernels
at the flagship block shape, with varying ILP (independent accumulator
streams).  Calibrates the vpu_frac_est denominator in bench.py/docs.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n_streams, iters):
    def kern(x_ref, o_ref):
        x = x_ref[:]
        accs = [x * (1.0 + 0.001 * i) for i in range(n_streams)]

        def body(j, accs):
            return tuple(a * 1.000001 + x for a in accs)

        accs = lax.fori_loop(0, iters, body, tuple(accs))
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[:] = out
    return kern


def run(bx, by, n_streams, iters, grid=7):
    x = jnp.ones((grid * bx, by), jnp.float32)
    blk = pl.BlockSpec((bx, by), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kernel(n_streams, iters), grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((grid * bx, by), jnp.float32),
        in_specs=[blk], out_specs=blk,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2**20))
    g = jax.jit(f)
    out = g(x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out = g(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    # each stream does 1 FMA (2 flops, 1 issue slot) per iter per point
    pts = grid * bx * by
    slots = pts * n_streams * iters
    return slots / dt


def main():
    for n_streams in (1, 2, 4, 8):
        r = run(232, 1024, n_streams, 512)
        print(json.dumps({"streams": n_streams,
                          "lane_ops_per_s": f"{r:.3e}"}), flush=True)
    # also smaller block (register pressure check)
    r = run(64, 512, 4, 512)
    print(json.dumps({"streams": 4, "block": "64x512",
                      "lane_ops_per_s": f"{r:.3e}"}), flush=True)


if __name__ == "__main__":
    main()
