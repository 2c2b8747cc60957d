"""Throughput of the flagship north-star workload: eddy-permitting,
land-masked TripolarGrid arctic basin (VERDICT r2 item 1).

Builds the same physics as validation/run_tripolar_basin.py at a chosen
size, times the full jitted RK3 step (EVP-120 + WENO-7 + slab+snow thermo)
on the default device, and reports pts/s plus which EVP tier dispatched.

Usage: python validation/perf_tripolar_fused.py [--size 1152x960]
       [--steps 10] [--fused auto|always|never]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_tripolar_basin import build  # noqa: E402  (sibling module)


def main():
    import jax
    from climaseaice_jl_tpu.model import _step

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1152x960")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--substeps", type=int, default=120)
    ap.add_argument("--dt", type=float, default=300.0)
    ap.add_argument("--fused", default="auto")
    ap.add_argument("--fixed-tiles", default=None,
                    help="TXxTY: run the bitwise-reproducibility mode "
                         "(pinned tile shape + Pallas coefficient prepare)")
    args = ap.parse_args()
    Nx, Ny = map(int, args.size.split("x"))

    model, state = build(Nx, Ny, substeps=args.substeps)
    if args.fused != "auto" or args.fixed_tiles:
        import dataclasses
        fixed = (tuple(map(int, args.fixed_tiles.split("x")))
                 if args.fixed_tiles else None)
        solver = dataclasses.replace(model.dynamics.solver, fused=args.fused,
                                     fixed_tiles=fixed)
        dyn = dataclasses.replace(model.dynamics, solver=solver)
        model = model.evolve(dynamics=dyn)

    # which tier will dispatch?
    from climaseaice_jl_tpu.dynamics.pallas_evp_curvilinear import (
        curvilinear_fused_available)
    from climaseaice_jl_tpu.dynamics.pallas_evp_tiled_curvilinear import (
        tiled_curvilinear_available, _plan_tiles, _solid_crop_rows,
        _MULT, _MULT_DRAG, _drag_on)
    tier = "jnp"
    plan = None
    cs = 0
    if curvilinear_fused_available(model):
        tier = "curvilinear-whole-array"
    elif tiled_curvilinear_available(model):
        tier = "curvilinear-tiled"
        mult = _MULT_DRAG if _drag_on(model) else _MULT
        cs = _solid_crop_rows(model)
        plan = _plan_tiles(model.grid, args.substeps, mult,
                           widen_fold=model.grid.north_fold, cs=cs)
    print(json.dumps({"tier": tier, "plan": plan and list(plan),
                      "solid_crop_rows": cs, "grid": f"{Nx}x{Ny}",
                      "backend": jax.default_backend()}), flush=True)

    step = jax.jit(lambda s, dt: _step(model, s, dt), donate_argnums=(0,))
    t0 = time.perf_counter()
    state = step(state, args.dt)
    jax.block_until_ready(state.h)
    print(json.dumps({"compile_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state = step(state, args.dt)
    jax.block_until_ready(state.h)
    elapsed = time.perf_counter() - t0

    h = np.asarray(model.grid.interior(state.h))
    pts = Nx * Ny * args.steps / elapsed
    print(json.dumps({"throughput_pts_per_s": round(pts, 1),
                      "Mpts_per_s": round(pts / 1e6, 2),
                      "steps": args.steps, "wall_s": round(elapsed, 2),
                      "finite": bool(np.isfinite(h).all())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
