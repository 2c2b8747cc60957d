"""Fixed-tile Pallas tracer-advection kernel: decomposition-invariant WENO.

The jnp advection stencils compile with shape-dependent FMA contraction, so
serial and distributed runs seed ~1e-7 differences per step that the WENO
nonlinearity amplifies (tests/test_distributed.py notes).  This kernel runs
the SAME flux-form reconstruction (`advection.py`; reference
`src/sea_ice_advection.jl:51-58`) on fixed-shape halo-extended tiles — the
Mosaic compilation depends only on the block shape, so with
``SplitExplicitSolver.fixed_tiles`` pinned, serial and every decomposition
execute bit-identical per-point arithmetic (the advection analog of the
fixed-tile EVP kernel, completing the reference's exact serial≡distributed
equality bar `test/distributed_tests_utils.jl:83-86` for the full
dynamics+advection step).

Eligibility mirrors the fixed-tile EVP path: f32 grids, ``fixed_tiles``
set, tracer halos ≥ the scheme's stencil radius.  Array-metric grids
(latlon/curvilinear/tripolar) pass Δy_fc/Δx_cf/Az_cc as tile slabs and run
the flux-form divergence with the jnp path's exact op order; the Zipper
fold needs no in-kernel handling because advection — unlike the EVP loop —
is a single stencil application over pre-filled halos.  Tiles are
gathered exactly like pallas_evp_tiled_curvilinear (periodic-unmeshed dims
wrap, others clamp — clamped cells are never read by valid outputs since the
overlap exceeds the stencil radius).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grids import PERIODIC
from ..advection import (WENO, UpwindBiased, Centered, FluxFormAdvection,
                         required_halo, _weno_tables_cached)
from .pallas_evp import vmem_compiler_params

_WX = 8    # x-overlap (sublane-aligned, ≥ max stencil radius 5)
_WY = 64   # y-overlap (TY + 2·64 keeps lane-dim blocks %128 for TY %128)


def _meshed(grid, dim):
    from ..fields import _meshed as fm
    return fm(grid, dim)


def fixed_tile_advection_available(model):
    """True when tracer advection can run on the fixed-tile Pallas kernel
    (the decomposition-invariant path)."""
    grid = model.grid
    dyn = model.dynamics
    adv = model.advection
    if adv is None or dyn is None:
        return False
    solver = getattr(dyn, "solver", None)
    fixed = getattr(solver, "fixed_tiles", None)
    if fixed is None:
        return False
    if grid.np_dtype != np.dtype("float32"):
        return False
    schemes = ((adv.x, adv.y) if isinstance(adv, FluxFormAdvection)
               else (adv, adv))
    for s in schemes:
        if not isinstance(s, (WENO, UpwindBiased, Centered)):
            return False
    r = required_halo(adv)
    if grid.Hx < r or grid.Hy < r or r > _WX:
        return False
    TX, TY = fixed
    if TY is None or TX % 8 or TY % 128:
        return False
    # array-metric grids (latlon/curvilinear/tripolar) pass dy_fc/dx_cf/az_cc
    # as tile slabs; the fold needs no in-kernel handling — unlike the EVP
    # loop, advection is a single stencil application over pre-filled halos,
    # and the gathered slabs carry the Zipper-filled halo values
    return True


def _array_metrics(grid):
    return any(getattr(m, "ndim", np.ndim(m)) != 0
               for m in (grid.dx_cc, grid.dy_cc))


# --- in-kernel face reconstructions (pltpu.roll analogs of advection.py) -----

def _recon(scheme, c, axis, sp, sm):
    """(left_biased, right_biased) face reconstructions at face I
    (`advection.py:reconstruct_face` with kernel-safe shifts)."""
    m = lambda k: sp(c, axis, k)   # c[I-k]
    p = lambda k: sm(c, axis, k)   # c[I+k]
    if isinstance(scheme, Centered):
        if scheme.order == 2:
            f = 0.5 * (m(1) + c)
        else:
            f = (-m(2) + 7 * m(1) + 7 * c - p(1)) / 12
        return f, f
    if isinstance(scheme, UpwindBiased):
        o = scheme.order
        if o == 1:
            return m(1), c
        if o == 3:
            return ((-m(2) + 5 * m(1) + 2 * c) / 6,
                    (2 * m(1) + 5 * c - p(1)) / 6)
        if o == 5:
            return ((2 * m(3) - 13 * m(2) + 47 * m(1) + 27 * c - 3 * p(1)) / 60,
                    (2 * p(2) - 13 * p(1) + 47 * c + 27 * m(1) - 3 * m(2)) / 60)
        if o == 7:
            return ((-3 * m(4) + 25 * m(3) - 101 * m(2) + 319 * m(1)
                     + 214 * c - 38 * p(1) + 4 * p(2)) / 420,
                    (-3 * p(3) + 25 * p(2) - 101 * p(1) + 319 * c
                     + 214 * m(1) - 38 * m(2) + 4 * m(3)) / 420)
        raise ValueError(f"unsupported UpwindBiased order {o}")
    # WENO
    r = (scheme.order + 1) // 2
    eps_ = scheme.epsilon

    def side(s):
        C, G, B = _weno_tables_cached(r)
        num = 0.0
        den = 0.0
        for k in range(r):
            cells = s[k:k + r]
            q = sum(C[k][j] * cells[j] for j in range(r))
            beta = sum(B[k][j1][j2] * cells[j1] * cells[j2]
                       for j1 in range(r) for j2 in range(r)
                       if B[k][j1][j2] != 0.0)
            w = G[k] / (eps_ + beta) ** 2
            num = num + w * q
            den = den + w
        return num / den

    left_stencil = (tuple(m(r - j) for j in range(r))
                    + (c,) + tuple(p(j) for j in range(1, r - 1)))
    right_stencil = (tuple(p(r - 1 - j) for j in range(r - 1))
                     + (c,) + tuple(m(j) for j in range(1, r)))
    return side(left_stencil), side(right_stencil)


def _adv_kernel(sx, sy, has_masks, arr_mets,
                params_ref, u_ref, v_ref, *refs):
    if arr_mets:
        dyfc_ref, dxcf_ref, azcc_ref = refs[:3]
        refs = refs[3:]
    if has_masks:
        mfc_ref, mcf_ref, c_ref, o_ref = refs
    else:
        c_ref, o_ref = refs
    inv_dx = params_ref[0]
    inv_dy = params_ref[1]
    u = u_ref[:]
    v = v_ref[:]
    c = c_ref[:]

    roll = pltpu.roll

    def sp(q, axis, k):   # q[I-k]
        return roll(q, k, axis)

    def sm(q, axis, k):   # q[I+k]
        return roll(q, q.shape[axis] - k, axis)

    lx, rx = _recon(sx, c, 0, sp, sm)
    cx = jnp.where(u > 0, lx, jnp.where(u < 0, rx, 0.5 * (lx + rx)))
    ly, ry = _recon(sy, c, 1, sp, sm)
    cy = jnp.where(v > 0, ly, jnp.where(v < 0, ry, 0.5 * (ly + ry)))
    if arr_mets:
        # flux-form with array metrics, op order exactly as the jnp path
        # (advection.py:273-307): Δy·u·ĉ, Δx·v·ĉ, [δx(fx) + δy(fy)]/Az
        fx = dyfc_ref[:] * u * cx
        fy = dxcf_ref[:] * v * cy
        if has_masks:
            fx = jnp.where(mfc_ref[:] > 0.5, 0.0, fx)
            fy = jnp.where(mcf_ref[:] > 0.5, 0.0, fy)
        div = ((sm(fx, 0, 1) - fx) + (sm(fy, 1, 1) - fy)) / azcc_ref[:]
    else:
        fx = u * cx
        fy = v * cy
        if has_masks:
            fx = jnp.where(mfc_ref[:] > 0.5, 0.0, fx)
            fy = jnp.where(mcf_ref[:] > 0.5, 0.0, fy)
        # uniform metrics: [δx(Δy·fx) + δy(Δx·fy)]/Az = δx(fx)/Δx + δy(fy)/Δy
        div = ((sm(fx, 0, 1) - fx) * inv_dx + (sm(fy, 1, 1) - fy) * inv_dy)

    TX = o_ref.shape[0]
    TY = o_ref.shape[1]
    Wx = (u.shape[0] - TX) // 2
    Wy = (u.shape[1] - TY) // 2
    o_ref[:] = div[Wx:Wx + TX, Wy:Wy + TY]


def make_fixed_tile_div(model, u, v):
    """Build ``div(c) -> ∇·(Uc)`` on fixed tiles; returns the same values as
    `advection.horizontal_div_Uc` with decomposition-invariant bits."""
    from .pallas_evp_tiled_curvilinear import _tile_indices

    grid = model.grid
    adv = model.advection
    sx, sy = ((adv.x, adv.y) if isinstance(adv, FluxFormAdvection)
              else (adv, adv))
    TX, TY = model.dynamics.solver.fixed_tiles
    Wx, Wy = _WX, _WY
    nxp, nyp = grid.nxp, grid.nyp
    Hx, Hy, Nx, Ny = grid.Hx, grid.Hy, grid.Nx, grid.Ny
    ntx, nty = -(-nxp // TX), -(-nyp // TY)
    bx, by = TX + 2 * Wx, TY + 2 * Wy

    arr_mets = _array_metrics(grid)
    if arr_mets:
        params = jnp.zeros(2, jnp.float32)  # unused in the array-metric form
    else:
        params = jnp.stack([1.0 / jnp.asarray(grid.dx_cc, jnp.float32),
                            1.0 / jnp.asarray(grid.dy_cc, jnp.float32)])

    wrap_x = grid.topology[0] == PERIODIC and not _meshed(grid, 0)
    wrap_y = grid.topology[1] == PERIODIC and not _meshed(grid, 1)
    idx_x, _ = _tile_indices(nxp, Nx, Hx, ntx, TX, Wx, wrap_x)
    idx_y, _ = _tile_indices(nyp, Ny, Hy, nty, TY, Wy, wrap_y)

    def slab(q):
        return q[idx_x][:, idx_y]

    def met(name):
        return jnp.broadcast_to(
            jnp.asarray(getattr(grid, name), jnp.float32), grid.shape)

    met_slabs = ([slab(met("dy_fc")), slab(met("dx_cf")),
                  slab(met("az_cc"))] if arr_mets else [])

    masks = model.masks
    has_masks = masks.per_fc is not None
    # the stencil shifts at face I read faces I±1: the f32 mask slabs must be
    # exact on the overlap like the jnp path's full-array masks
    mask_slabs = ([slab(masks.per_fc.astype(jnp.float32)),
                   slab(masks.per_cf.astype(jnp.float32))] if has_masks else [])

    # fx reads u at shifted positions only via upwind select (no shift);
    # δx(fx) reads fx[I+1] → u within the overlap.  Velocities are shared by
    # every tracer call, so gather once.
    u_slab, v_slab = slab(u), slab(v)

    kernel = functools.partial(_adv_kernel, sx, sy, has_masks, arr_mets)
    blk_in = pl.BlockSpec((bx, by), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    interpret = not on_tpu

    def div(c):
        out = pl.pallas_call(
            kernel,
            grid=(ntx, nty),
            out_shape=jax.ShapeDtypeStruct((ntx * TX, nty * TY), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [blk_in] * (3 + len(met_slabs) + len(mask_slabs)),
            out_specs=blk_out,
            interpret=interpret,
            **vmem_compiler_params(interpret),
        )(params, u_slab, v_slab, *met_slabs, *mask_slabs, slab(c))
        return out[:nxp, :nyp]

    return div
