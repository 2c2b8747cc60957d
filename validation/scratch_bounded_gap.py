"""Ablation: where does the bounded+immersed throughput gap at 512^2/1024^2
come from?  Configs: periodic (baseline), bounded walls only (no island, no
immersed drag), bounded+island (no drag), bounded+island+drag (full).
"""
import json, os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(N, topo, island, drag, substeps=120):
    import climaseaice_jl_tpu as csi
    km = 1000.0
    grid = csi.RectilinearGrid(size=(N, N), x=(0, 512 * km), y=(0, 512 * km),
                               halo=5, dtype="float32", topology=topo)
    if island:
        x = (np.arange(N) + 0.5) * (512 * km / N)
        xc, yc = np.meshgrid(x, x, indexing="ij")
        r2 = (xc - 256 * km) ** 2 + (yc - 256 * km) ** 2
        grid = csi.ImmersedBoundaryGrid(grid, r2 < (60 * km) ** 2)
    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(),
        coriolis=csi.FPlane(f=1.4e-4),
        top_momentum_stress={"u": 0.1, "v": 0.05},
        bottom_momentum_stress=csi.SemiImplicitStress(),
        immersed_drag=csi.ImmersedDrag(coefficient=1e-3) if drag else None,
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


def timeit(model, state, steps=10):
    import jax
    from climaseaice_jl_tpu.model import _step
    step = jax.jit(lambda s, dt: _step(model, s, dt), donate_argnums=(0,))
    state = step(state, 120.0)
    jax.block_until_ready(state.h)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state, 120.0)
    jax.block_until_ready(state.h)
    return (time.perf_counter() - t0) / steps


def tier_of(model):
    from climaseaice_jl_tpu.dynamics import (pallas_evp, pallas_evp_padded,
                                             pallas_evp_tiled,
                                             pallas_evp_tiled_padded)
    if pallas_evp.fused_available(model):
        return "whole-vmem"
    if pallas_evp_padded.padded_fused_available(model):
        return "padded"
    if pallas_evp_tiled.tiled_available(model):
        return "tiled"
    if pallas_evp_tiled_padded.tiled_padded_available(model):
        return "tiled-padded"
    return "jnp"


def main():
    P = ("periodic", "periodic")
    B = ("bounded", "bounded")
    cases = [("periodic", P, False, False),
             ("bounded-walls", B, False, False),
             ("bounded+island", B, True, False),
             ("bounded+island+drag", B, True, True)]
    for N in (512, 1024):
        for name, topo, isl, drag in cases:
            model, state = build(N, topo, isl, drag)
            t = timeit(model, state)
            print(json.dumps({"N": N, "case": name, "tier": tier_of(model),
                              "ms": round(t * 1e3, 2),
                              "mpts": round(N * N / t / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
