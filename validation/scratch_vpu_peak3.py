"""Honest VPU issue-peak sweep (round 5, VERDICT item 3).

scratch_vpu_peak.py's affine update (a*c + x) is strength-reduced by the
compiler (measured 1.5e14 "lane-ops/s" -- 20x over nominal peak, i.e. the
loop body was folded).  This sweep uses the non-affine update from
scratch_vpu_peak2.py (a <- a + 1e-9*a*a + x*1e-3; sanity leg: value
changes with iters, time scales linearly with iters) and sweeps the
number of independent accumulator streams 1..16 to find the true
issue-limited ceiling at the flagship block shape.  The saturated rate is
the *independent* VPU_ENVELOPE_MEASURED denominator bench.py should use
(the kernel's own achieved rate is circular -- VERDICT r4 weak #2).

Slot accounting per stream-iter-point: t = a*a (1 mul), s = fma(t, 1e-9,
xc) (1 fma), a = a + s (1 add) -> 3 issue slots (x*1e-3 is loop-hoisted).
"""
import json
import time

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
    slots = pts * n_streams * iters * 3
    return slots / dt, dt, val


def main():
    best = 0.0
    for n_streams in (1, 2, 4, 6, 8, 12, 16):
        r, dt, val = run(232, 1024, n_streams, 1024)
        best = max(best, r)
        print(json.dumps({"streams": n_streams, "iters": 1024,
                          "ms": round(dt * 1e3, 3), "val": round(val, 4),
                          "lane_ops_per_s": f"{r:.3e}"}), flush=True)
    # linearity sanity at the best stream count
    for iters in (512, 2048):
        r, dt, val = run(232, 1024, 8, iters)
        print(json.dumps({"streams": 8, "iters": iters,
                          "ms": round(dt * 1e3, 3), "val": round(val, 4),
                          "lane_ops_per_s": f"{r:.3e}"}), flush=True)
    print(json.dumps({"saturated_peak_lane_ops_per_s": f"{best:.3e}"}),
          flush=True)


if __name__ == "__main__":
    main()
