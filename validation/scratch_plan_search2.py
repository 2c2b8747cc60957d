"""Scratch: round-2 empirical tile-plan sweep (refines around K=12 winner).

Also reports WHERE the fused-vs-jnp max diff lives (expected: the pole-cap
band, where alpha saturates and roundoff amplifies chaotically).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_tripolar_basin import build  # noqa: E402

import jax


def timeit(fn, *args, n=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import climaseaice_jl_tpu.dynamics.pallas_evp_tiled_curvilinear as tc
    from climaseaice_jl_tpu.model import update_state
    from climaseaice_jl_tpu.dynamics.momentum import (
        split_explicit_momentum_step)

    Nx, Ny = 1152, 960
    model, state = build(Nx, Ny, substeps=120)
    dt = 300.0
    state = jax.jit(lambda s: update_state(model, s))(state)

    jref = jax.jit(lambda s: split_explicit_momentum_step(
        model, s, dt, s.u, s.v))
    ref = jref(state)
    ref_u = np.asarray(model.grid.interior(ref["u"]))
    print("jnp ref done", flush=True)

    orig_plan = tc._plan_tiles

    candidates = [
        ("E2-k12-tx176", (12, 176, 1024, 28, 0)),
        ("H-k12-tx184", (12, 184, 1024, 28, 0)),
        ("I-k15-tx152", (15, 152, 1032, 36, 0)),
        ("J-k20-tx136", (20, 136, 1056, 44, 0)),
        ("K-k24-tx120", (24, 120, 1072, 52, 0)),
        ("L-k12-2d", (12, 328, 512, 28, 64)),
        ("M-k10-tx192", (10, 192, 1016, 24, 0)),
    ]

    results = {}
    for name, plan in candidates:
        tc._plan_tiles = lambda *a, plan=plan, **k: plan
        try:
            f = jax.jit(lambda s: tc.tiled_curvilinear_momentum_step(
                model, s, dt, s.u, s.v))
            out = f(state)
            u = np.asarray(model.grid.interior(out["u"]))
            d = np.abs(u - ref_u)
            iarg = np.unravel_index(np.argmax(d), d.shape)
            t = timeit(f, state)
            results[name] = dict(plan=list(plan), ms=round(t * 1e3, 2),
                                 mpts=round(Nx * Ny / t / 1e6, 1),
                                 max_du=float(d.max()),
                                 argmax=[int(iarg[0]), int(iarg[1])])
        except Exception as e:  # noqa: BLE001
            results[name] = dict(plan=list(plan), error=str(e)[:160])
        finally:
            tc._plan_tiles = orig_plan
        print(json.dumps({name: results[name]}), flush=True)


if __name__ == "__main__":
    main()
