"""Scratch: empirical tile-plan search for the tiled curvilinear kernel.

Monkeypatches _plan_tiles / _fixed_plan to pin candidate (K, TX, TY, Wx, Wy)
plans, validates each against the jnp path on the flagship tripolar build,
and times the fused momentum step at substeps=120.
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
import jax.numpy as jnp


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

    # jnp reference (one momentum call)
    jref = jax.jit(lambda s: split_explicit_momentum_step(
        model, s, dt, s.u, s.v))
    ref = jref(state)
    ref_u = np.asarray(model.grid.interior(ref["u"]))
    ref_v = np.asarray(model.grid.interior(ref["v"]))
    print("jnp ref done", flush=True)

    orig_plan = tc._plan_tiles

    candidates = [
        ("A-auto-k10", (10, 168, 1016, 28, 0)),
        ("B-k8-nty1", (8, 200, 1008, 24, 0)),
        ("C-k8-2d-old", (8, 240, 512, 24, 64)),
        ("D-k15-nty1", (15, 168, 1032, 36, 0)),
        ("E-k12-nty1", (12, 168, 1024, 32, 0)),
        ("F-k10-wx24", (10, 168, 1016, 24, 0)),
        ("G-k8-big-mult-test", (8, 224, 1008, 24, 0)),
    ]

    results = {}
    for name, plan in candidates:
        tc._plan_tiles = lambda *a, plan=plan, **k: plan
        try:
            f = jax.jit(lambda s: tc.tiled_curvilinear_momentum_step(
                model, s, dt, s.u, s.v))
            out = f(state)
            u = np.asarray(model.grid.interior(out["u"]))
            v = np.asarray(model.grid.interior(out["v"]))
            du = float(np.max(np.abs(u - ref_u)))
            dv = float(np.max(np.abs(v - ref_v)))
            scale = float(np.max(np.abs(ref_u)) + 1e-30)
            t = timeit(f, state)
            results[name] = dict(plan=list(plan), ms=round(t * 1e3, 2),
                                 max_du=du, max_dv=dv,
                                 rel=round(max(du, dv) / scale, 9))
        except Exception as e:  # noqa: BLE001
            results[name] = dict(plan=list(plan),
                                 error=str(e)[:200])
        finally:
            tc._plan_tiles = orig_plan
        print(json.dumps({name: results[name]}), flush=True)


if __name__ == "__main__":
    main()
