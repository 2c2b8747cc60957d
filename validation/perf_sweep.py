"""Perf sweep across problem sizes and grid configurations (VERDICT r1 item 1).

Runs the flagship EVP120+WENO7+thermo step at 512^2 .. 4096^2, periodic and
bounded+immersed, on the default device, and prints one JSON line per config:
points/s plus which EVP tier the dispatcher chose.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tier_of(model):
    from climaseaice_jl_tpu.dynamics.pallas_evp import fused_available
    from climaseaice_jl_tpu.dynamics.pallas_evp_padded import padded_fused_available
    from climaseaice_jl_tpu.dynamics.pallas_evp_tiled_padded import tiled_padded_available
    if fused_available(model):
        return "fused-vmem"
    if padded_fused_available(model):
        return "padded"
    if tiled_padded_available(model):
        return "tiled-padded"
    return "jnp"


def build(N, bounded=False, substeps=120):
    import climaseaice_jl_tpu as csi

    km = 1000.0
    topo = ("bounded", "bounded") if bounded else ("periodic", "periodic")
    grid = csi.RectilinearGrid(size=(N, N), x=(0, 512 * km), y=(0, 512 * km),
                               halo=5, dtype="float32", topology=topo)
    if bounded:
        # circular island in the center, ~5% of the domain (immersed mask)
        x = (np.arange(N) + 0.5) * (512 * km / N)
        xc, yc = np.meshgrid(x, x, indexing="ij")
        r2 = (xc - 256 * km) ** 2 + (yc - 256 * km) ** 2
        grid = csi.ImmersedBoundaryGrid(grid, r2 < (60 * km) ** 2)
    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(),
        coriolis=csi.FPlane(f=1.4e-4),
        top_momentum_stress={"u": 0.1, "v": 0.05},
        bottom_momentum_stress=csi.SemiImplicitStress(),
        immersed_drag=csi.ImmersedDrag(coefficient=1e-3) if bounded else None,
        solver=csi.SplitExplicitSolver(substeps=substeps))
    model = csi.sea_ice_model(
        grid, dynamics=dynamics,
        ice_thermodynamics=csi.sea_ice_slab_thermodynamics(),
        top_heat_flux=-20.0, bottom_heat_flux=-5.0,
        advection=csi.WENO(order=7), timestepper="SplitRungeKutta3")

    def h0(x, y):
        return 1.0 + 0.25 * np.sin(2 * np.pi * x / (512 * km)) * np.sin(
            2 * np.pi * y / (512 * km))

    state = csi.initial_state(model, h=h0, a=1.0)
    return model, state


def main():
    import jax
    from climaseaice_jl_tpu.model import _step

    sizes = [int(s) for s in os.environ.get(
        "SWEEP_SIZES", "512,1024,2048,4096").split(",")]
    steps = int(os.environ.get("SWEEP_STEPS", "10"))
    results = []
    for bounded in (False, True):
        for N in sizes:
            model, state = build(N, bounded=bounded)
            tier = tier_of(model)
            step = jax.jit(lambda s, dt: _step(model, s, dt),
                           donate_argnums=(0,))
            dt = 120.0
            state = step(state, dt)
            jax.block_until_ready(state.h)
            t0 = time.perf_counter()
            for _ in range(steps):
                state = step(state, dt)
            jax.block_until_ready(state.h)
            el = time.perf_counter() - t0
            rec = {"N": N, "config": "bounded+immersed" if bounded else "periodic",
                   "tier": tier, "pts_per_s": round(N * N * steps / el, 1)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
            del model, state, step
    return 0


if __name__ == "__main__":
    sys.exit(main())
