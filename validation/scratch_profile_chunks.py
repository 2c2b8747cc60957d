"""Scratch: decompose tiled_curvilinear_momentum_step — chunk kernel vs
inter-chunk refill/gather vs prepare."""
import functools
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    import climaseaice_jl_tpu.dynamics.pallas_evp_tiled_curvilinear as tc
    from climaseaice_jl_tpu.model import update_state
    from climaseaice_jl_tpu.fields import (
        fill_halos_fc_local, fill_halos_cf_local, fill_halos_cc_local,
        fill_halos_ff_local)

    Nx, Ny = 1152, 960
    model, state = build(Nx, Ny, substeps=120)
    dt = 300.0
    state = jax.jit(lambda s: update_state(model, s))(state)
    grid0 = model.grid
    nsub = 120
    mult = tc._MULT_DRAG if tc._drag_on(model) else tc._MULT
    widen = grid0.north_fold and grid0.mesh_axes is None
    plan = tc._plan_tiles(grid0, nsub, mult, widen_fold=widen)
    K, TX, TY, Wx, Wy = plan
    print("plan", plan, "mult", mult, "drag", tc._drag_on(model))

    u_start, v_start = state.u, state.v
    model2, state2, u2, v2, crop = tc._widen_folded(model, state, u_start,
                                                    v_start, K)
    grid = model2.grid
    Hx, Hy, Nxl, Nyl = grid.Hx, grid.Hy, grid.Nx, grid.Ny
    nxp, nyp = grid.nxp, grid.nyp
    ntx, nty = -(-nxp // TX), -(-nyp // TY)
    bx, by = TX + 2 * Wx, TY + 2 * Wy
    print(dict(nxp=nxp, nyp=nyp, ntx=ntx, nty=nty, bx=bx, by=by,
               redundancy=round((ntx * bx * nty * by) / (nxp * nyp), 3)))

    prep = jax.jit(lambda s, u, v: tc._prepare_tiled_inputs(
        model2, s, dt, u, v)[:3])
    params, consts, carry_in = prep(state2, u2, v2)
    t_prep = timeit(prep, state2, u2, v2)
    print(json.dumps({"prepare_ms": round(t_prep * 1e3, 2),
                      "n_consts": len(consts)}), flush=True)

    # widen cost
    t_widen = timeit(jax.jit(lambda s, u, v: tc._widen_folded(
        model, s, u, v, K)[1].h), state, u_start, v_start)
    print(json.dumps({"widen_ms": round(t_widen * 1e3, 2)}), flush=True)

    from climaseaice_jl_tpu.grids import PERIODIC
    wrap_x = grid.topology[0] == PERIODIC
    idx_x, gx_rows = tc._tile_indices(nxp, Nxl, Hx, ntx, TX, Wx, wrap_x)
    idx_y, gy_cols = tc._tile_indices(nyp, Nyl, Hy, nty, TY, Wy, False)
    gx = jnp.broadcast_to(jnp.asarray(gx_rows)[:, None],
                          (gx_rows.size, gy_cols.size))
    gy = jnp.broadcast_to(jnp.asarray(gy_cols)[None, :],
                          (gx_rows.size, gy_cols.size))

    def slab(q):
        return q[idx_x][:, idx_y]

    const_slabs = jax.jit(lambda cs: [slab(q) for q in cs])(consts)

    edge_offsets = (Wx + Hx, Wx + Hx + Nxl - 1 - (ntx - 1) * TX,
                    Wy + Hy, Wy + Hy + Nyl - 1 - (nty - 1) * TY)
    make_fillers = tc._make_fillers(grid, TX, Wx, TY, Wy, edge_offsets)

    def gate(dim, low):
        return jnp.float32(1.0)

    gates = jnp.stack([gate(0, True), gate(0, False),
                       gate(1, True), gate(1, False)])

    blk_in = pl.BlockSpec((bx, by), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    out_rows, out_cols = ntx * TX, nty * TY
    has_drag = tc._drag_on(model)

    def run_chunk(cs, carry):
        kernel = functools.partial(tc._tiled_curv_kernel, K, True,
                                   make_fillers, has_drag)
        carry_slabs = [slab(q) for q in carry]
        outs = pl.pallas_call(
            kernel,
            grid=(ntx, nty),
            out_shape=[jax.ShapeDtypeStruct((out_rows, out_cols),
                                            jnp.float32)] * 6,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [blk_in] * (2 + len(cs) + 6),
            out_specs=[blk_out] * 6,
            **tc.vmem_compiler_params(False),
        )(params, gates, gx, gy, *cs, *carry_slabs)
        return tuple(q[:nxp, :nyp] for q in outs)

    def refill(carry):
        u, v, s11, s22, s12, alpha = carry
        return (fill_halos_fc_local(u, grid), fill_halos_cf_local(v, grid),
                fill_halos_cc_local(s11, grid),
                fill_halos_cc_local(s22, grid),
                fill_halos_ff_local(s12, grid), alpha)

    carry0 = tuple(carry_in)
    one_chunk = jax.jit(lambda cs, c: run_chunk(cs, refill(c)))
    t_chunk = timeit(one_chunk, const_slabs, carry0)
    print(json.dumps({"chunk_ms": round(t_chunk * 1e3, 2),
                      "n_chunks": nsub // K,
                      "extrapolated_ms": round(t_chunk * 1e3 * nsub / K, 1)}),
          flush=True)

    # kernel only (no refill, slabs pre-gathered)
    carry_slabs0 = jax.jit(lambda c: [slab(q) for q in c])(carry0)

    def kernel_only(cs, carry_slabs):
        kernel = functools.partial(tc._tiled_curv_kernel, K, True,
                                   make_fillers, has_drag)
        outs = pl.pallas_call(
            kernel,
            grid=(ntx, nty),
            out_shape=[jax.ShapeDtypeStruct((out_rows, out_cols),
                                            jnp.float32)] * 6,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [blk_in] * (2 + len(cs) + 6),
            out_specs=[blk_out] * 6,
            **tc.vmem_compiler_params(False),
        )(params, gates, gx, gy, *cs, *carry_slabs)
        return outs

    ko = jax.jit(kernel_only)
    t_ko = timeit(ko, const_slabs, carry_slabs0)
    print(json.dumps({"kernel_only_ms": round(t_ko * 1e3, 2)}), flush=True)

    # refill+gather only
    rg = jax.jit(lambda c: [slab(q) for q in refill(c)])
    t_rg = timeit(rg, carry0)
    print(json.dumps({"refill_gather_ms": round(t_rg * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
