"""On-chip cost of the overlap policy's boundary-band recompute (VERDICT r4
item 7): serial ablation, no mesh needed.

Times the jnp EVP substep (the path the `overlap` halo-exchange policy
runs) on a full (N, N) local tile and on each band submodel the policy
would add for a (2,2)-meshed shard (west/east x-bands of shape
(2H+8, nyp); south/north y-bands of shape (nxp, 2H+8)), and reports the
band-recompute overhead fraction per edge.

Structural prediction being tested: y-edge bands are LANE-padded — a
(nxp, 2H+8) band occupies ceil((2H+8+2H)/128)*128 = 128 lanes of vector
width regardless of its nominal 16-24 cells, so its cost is ~128/by_nom ×
nominal, while x-edge bands (sublane-padded to a multiple of 8) are nearly
free.  This is why the overlap policy measured slower than per_substep in
round 4 at 96^2 tiles: the band overhead is structural on TPU, shrinking
only as 1/N with tile size.

Usage: python validation/scratch_band_cost.py [--sizes 96,192,384,768]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(N, substeps=120):
    import climaseaice_jl_tpu as csi
    from climaseaice_jl_tpu.dynamics.momentum import (SeaIceMomentumEquation,
                                                      SplitExplicitSolver)
    from climaseaice_jl_tpu.dynamics.rheologies import \
        ElastoViscoPlasticRheology
    from climaseaice_jl_tpu.dynamics.stresses import SemiImplicitStress

    km = 1e3
    grid = csi.RectilinearGrid(size=(N, N), x=(0, 512 * km), y=(0, 512 * km),
                               halo=5, topology=("periodic", "periodic"))
    dynamics = SeaIceMomentumEquation(
        top_momentum_stress={"u": 0.2, "v": 0.0},
        bottom_momentum_stress=SemiImplicitStress(),
        rheology=ElastoViscoPlasticRheology(),
        solver=SplitExplicitSolver(substeps=substeps))
    model = csi.sea_ice_model(grid, dynamics=dynamics)
    state = csi.initial_state(model, h=1.0, a=1.0)
    return model, state


def time_loop(one, shape, nsub=40, reps=5):
    """Time nsub chained substeps of `one` on zero-initialized state."""
    from jax import lax

    def loop(u, v, s11, s22, s12, alpha, Delta, zcc, zff):
        def body(i, c):
            return one(*c, i + 1)
        return lax.fori_loop(
            0, nsub, body, (u, v, s11, s22, s12, alpha, Delta, zcc, zff))

    f = jax.jit(loop)
    args = [jnp.zeros(shape, jnp.float32) for _ in range(6)]
    args += [jnp.full(shape, 0.1, jnp.float32) for _ in range(3)]
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / nsub


def main():
    from climaseaice_jl_tpu.dynamics.momentum import (_make_evp_substep,
                                                      _band_submodel,
                                                      _BAND_W)
    from climaseaice_jl_tpu.dynamics.rheologies import ice_strength
    from climaseaice_jl_tpu.fields import (fill_halos_fc_local,
                                           fill_halos_cf_local)

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="96,192,384,768")
    args = ap.parse_args()

    for N in map(int, args.sizes.split(",")):
        model, state = build(N)
        grid = model.grid
        P = ice_strength(model.dynamics.rheology, state.h, state.a)
        un = jnp.zeros(grid.shape, jnp.float32)
        vn = jnp.zeros(grid.shape, jnp.float32)

        def mk(m, st, g):
            return _make_evp_substep(
                m, st, 120.0, state.clock, ice_strength(
                    m.dynamics.rheology, st.h, st.a),
                jnp.zeros(g.shape, jnp.float32),
                jnp.zeros(g.shape, jnp.float32),
                lambda q, g=g: fill_halos_fc_local(q, g),
                lambda q, g=g: fill_halos_cf_local(q, g))

        t_full = time_loop(mk(model, state, grid), grid.shape)
        row = {"N": N, "full_ms_per_substep": round(t_full * 1e3, 4),
               "band_w": _BAND_W}
        tot = 0.0
        for dim, name in ((0, "x_band"), (1, "y_band")):
            bmodel, cut, _ = _band_submodel(model, dim, 0)
            bstate = state.evolve(h=cut(state.h), a=cut(state.a),
                                  hs=cut(state.hs), S=cut(state.S),
                                  Tu=cut(state.Tu), Tus=cut(state.Tus))
            t_b = time_loop(mk(bmodel, bstate, bmodel.grid),
                            bmodel.grid.shape)
            row[name + "_ms"] = round(t_b * 1e3, 4)
            row[name + "_frac"] = round(t_b / t_full, 4)
            tot += 2 * t_b  # both sides on a (2,2) mesh
        row["overlap_overhead_2x2"] = round(tot / t_full, 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
