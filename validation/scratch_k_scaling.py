"""Scratch: split per-chunk cost into DMA vs compute by varying K at fixed
substeps=8, and locate the fused-vs-jnp diff."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_tripolar_basin import build  # noqa: E402

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import dataclasses
    import climaseaice_jl_tpu.dynamics.pallas_evp_tiled_curvilinear as tc
    from climaseaice_jl_tpu.model import update_state
    from climaseaice_jl_tpu.dynamics.momentum import (
        split_explicit_momentum_step)

    Nx, Ny = 1152, 960
    model, state = build(Nx, Ny, substeps=8)
    dt = 300.0
    state = jax.jit(lambda s: update_state(model, s))(state)

    orig_plan = tc._plan_tiles
    for K in (8, 4, 2):
        plan = (K, 240, 512, 28, 64)
        tc._plan_tiles = lambda *a, plan=plan, **k: plan
        try:
            f = jax.jit(lambda s: tc.tiled_curvilinear_momentum_step(
                model, s, dt, s.u, s.v))
            out = f(state)
            jax.block_until_ready(out["u"])
            t = timeit(f, state)
            print(json.dumps({"K": K, "chunks": 8 // K,
                              "ms": round(t * 1e3, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"K": K, "error": str(e)[:200]}), flush=True)
        finally:
            tc._plan_tiles = orig_plan

    # where is the fused-vs-jnp diff?
    jref = jax.jit(lambda s: split_explicit_momentum_step(
        model, s, dt, s.u, s.v))
    ref = jref(state)
    tc._plan_tiles = lambda *a, **k: (8, 240, 512, 28, 64)
    f = jax.jit(lambda s: tc.tiled_curvilinear_momentum_step(
        model, s, dt, s.u, s.v))
    out = f(state)
    tc._plan_tiles = orig_plan
    I = model.grid.interior
    du = np.abs(np.asarray(I(out["u"])) - np.asarray(I(ref["u"])))
    i, j = np.unravel_index(np.argmax(du), du.shape)
    print(json.dumps({"max_du": float(du.max()), "at": [int(i), int(j)],
                      "Ny": Ny,
                      "du_south_of_900": float(du[:, :900].max()),
                      "du_south_of_950": float(du[:, :950].max())}),
          flush=True)


if __name__ == "__main__":
    main()
