"""Sanity-check the FMA microbenchmark: verify the loop really executes
(output value) and that time scales with iteration count."""
import json, sys, time
import numpy as np
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
            # non-affine update: a <- a*a*eps + x prevents closed-form folding
            return tuple(a + 1e-9 * a * a + x * 1e-3 for a in accs)

        accs = lax.fori_loop(0, iters, body, tuple(accs))
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[:] = out
    return kern


def run(bx, by, n_streams, iters, grid=7, n=20):
    x = jnp.ones((grid * bx, by), jnp.float32)
    blk = pl.BlockSpec((bx, by), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kernel(n_streams, iters), grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((grid * bx, by), jnp.float32),
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
    # 3 ops per stream-iter-point now (2 mul 1 add + 1 fma -> count 3 slots)
    slots = pts * n_streams * iters * 3
    return slots / dt, dt, val


def main():
    for iters in (256, 1024, 4096):
        r, dt, val = run(232, 1024, 4, iters)
        print(json.dumps({"iters": iters, "streams": 4,
                          "ms": round(dt * 1e3, 3), "val": val,
                          "lane_ops_per_s": f"{r:.3e}"}), flush=True)


if __name__ == "__main__":
    main()
