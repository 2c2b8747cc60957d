"""Tiled, substep-chunked curvilinear fused Pallas EVP kernel.

Lifts the two restrictions of the whole-array curvilinear kernel
(pallas_evp_curvilinear.py): the whole-array VMEM bound (~660² padded
points) and the serial-only rule.  The flagship north-star workload — an
eddy-permitting land-masked TripolarGrid arctic basin, serial or
(1,Py)-meshed with communication-avoiding wide-halo EVP — runs fused
through this tier (reference hot loop
`split_explicit_momentum_equations.jl:103-195` on the grid family of
`test/distributed_tests_utils.jl:170-259`).

Design
======
The substep-chunking of pallas_evp_tiled_padded.py applied to array-metric
grids: the padded local array is ceil-covered by a 2-D grid of
halo-extended (TX+2Wx, TY+2Wy) tiles; each chunk gathers state + 14
derived metric slabs + the usual EVP coefficient slabs per tile, runs K
substeps in VMEM (validity shrinking ~2 cells/substep inside the overlap),
and stores the tile interiors.

**The Zipper fold self-evolves.**  An x-tiled kernel cannot re-impose the
fold per substep (the mirror columns live in other tiles).  Instead the
fold halo is *evolved*: a halo cell beyond the seam carries the exact
(sign-flipped for u, v) values of its mirror cell, and one EVP substep
maps exact mirrors to exact mirrors — IEEE addition is commutative,
subtraction is exactly antisymmetric, and every coefficient field is
fold-symmetric:

* metrics: exact fold images in the y-halo (grids._fold_metric_halo; the
  y-face seam column is symmetrized so the seam row's update is exactly
  x-mirror antisymmetric);
* P, masses, drag and activity coefficients: computed pointwise from
  fold-filled h, ℵ, so their halo values are automatic fold images;
* user stresses τ, uₑ, vₑ: fold-filled with the vector sign at evaluation
  (stresses._vec_value — the reference's Zipper-BC'd stress Fields,
  `sea_ice_model.jl:57-64` + `sea_ice_external_stress.jl:63-78`).

Halo validity then shrinks ~2 cells/substep like any exchange-free region,
so folded grids need a y-halo ≥ 2K+3; serial folded grids are widened
in-trace (`_widen_folded`) and u/v/σ/α halos are re-imposed between chunks
with the *local* fills (no exchange — communication avoidance preserved on
meshed grids, where the stepper already built 2·substeps+3 halos).

Bounded walls are re-imposed per substep inside the kernel with
`where`-fills gated by traced interior coordinates and shard-position
gates (so bounded+meshed shards apply wall BCs only at the global edge,
like `fields._bc_y_meshed`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grids import PERIODIC, BOUNDED
from .pallas_evp import (_P_DT, _P_F, _P_RC, _P_EINV2, _P_AMIN, _P_AMAX,
                         _P_DMIN, _P_REPL, VMEM_LIMIT_MB, vmem_compiler_params)
from .rheologies import ElastoViscoPlasticRheology

# gate-vector indices (second SMEM params input)
_G_W, _G_E, _G_S, _G_N, _NGATES = range(5)

_VMEM_BUDGET = (VMEM_LIMIT_MB - 6) * 2 ** 20
# Affine Mosaic occupancy per (bx, by) block: double-buffered 39 input
# blocks (gx, gy, 14 metric + 18 coefficient [+4 drag] slabs, 6 carries)
# + 6 output blocks + ~30 block-sized temporaries.
_MULT = 150        # Mosaic occupancy per block-byte, calibrated on a v5e:
_MULT_DRAG = 160   # measured 156.3·block at (416, 512) with ImmersedDrag


def _meshed(grid, dim):
    from ..fields import _meshed as fm
    return fm(grid, dim)


def _wx(K, periodic_x):
    W = 3 * K + 3 if periodic_x else 2 * K + 3
    return W + (-W) % 4  # keep bx = TX + 2W a sublane multiple (TX ≡ 0 mod 8)


def _chunk_options(nsub):
    """Divisor chunk lengths, largest first (pallas_evp_tiled.pick_chunk
    relaxed to return all options)."""
    from .pallas_evp_tiled import CHUNK_SUBSTEPS
    return [K for K in range(min(CHUNK_SUBSTEPS, nsub), 1, -1)
            if nsub % K == 0]


def _plan_tiles(grid, nsub, mult, widen_fold=False):
    """Joint (K, Wy, ntx, nty) search minimizing modeled cost = redundant
    -compute ratio × (1 + 2/K) (the 1/K term prices the per-chunk HBM
    round-trip + boundary refills) under the VMEM budget and the
    single-trigger-tile constraints of the gated wall fills.

    ``widen_fold``: serial folded grids are widened to Hy = max(Hy, 2K+3)
    before tiling — the effective shape depends on K, so the search accounts
    for it per candidate.  Returns (K, TX, TY, Wx, Wy) or None."""
    Hx, Nx, Ny = grid.Hx, grid.Nx, grid.Ny
    nxp = grid.nxp
    periodic_x = grid.topology[0] == PERIODIC and not _meshed(grid, 0)
    bounded_x = grid.topology[0] == BOUNDED
    bounded_y = grid.topology[1] == BOUNDED
    best = None
    for K in _chunk_options(nsub):
        Wx = _wx(K, periodic_x)
        Hy = max(grid.Hy, 2 * K + 3) if widen_fold else grid.Hy
        nyp = Ny + 2 * Hy
        # Mosaic block-shape rule: tiled lane-dim blocks must be %128 (both
        # the TY outputs and the TY+2Wy inputs ⇒ Wy %64); sublane %8.
        # A single-tile dimension may be any size (block == array dim).
        Wy = 64
        if True:
            for ntx in range(1, min(64, max(2, nxp // 8)) + 1):
                need_x = -(-nxp // ntx)
                TX = -(-need_x // 8) * 8
                if ntx > 1 and (ntx - 1) * TX >= nxp:
                    continue  # fewer tiles already cover the extent
                bx = TX + 2 * Wx
                if bounded_x and ntx > 1 and (
                        TX - Wx <= Hx or (ntx - 1) * TX + Wx > Hx + Nx):
                    continue  # wall fill must trigger on exactly one tile
                for nty in range(1, min(64, max(2, nyp // 8)) + 1):
                    need = -(-nyp // nty)
                    if nty == 1:
                        TY = -(-need // 8) * 8
                    else:
                        TY = -(-need // 128) * 128
                    if nty > 1 and nty * TY - TY >= nyp:
                        continue
                    by = TY + 2 * Wy
                    if bounded_y and nty > 1 and (
                            TY - Wy <= Hy or (
                                not grid.north_fold
                                and (nty - 1) * TY + Wy > Hy + Ny)):
                        continue
                    if mult * bx * by * 4 > _VMEM_BUDGET:
                        continue
                    ratio = (ntx * bx) * (nty * by) / (nxp * nyp)
                    cost = ratio * (1 + 2.0 / K)
                    if best is None or cost < best[0]:
                        best = (cost, K, TX, TY, Wx, Wy)
                    break  # larger nty only shrinks TY further
    if best is None:
        return None
    return best[1:]


def _drag_on(model):
    return (model.dynamics.immersed_drag is not None
            and model.grid.solid_cc is not None)


def _fixed_plan(grid, nsub, fixed, mult, widen_fold=False):
    """Pinned tile plan for ``fixed_tiles`` bitwise mode: the block shape —
    hence the Mosaic compilation, hence the per-point FMA/rounding choices —
    depends only on (TX, TY, K), never on the local array shape, topology
    flags, or mesh position, so serial and every wide-halo shard execute
    bit-identical per-point arithmetic (pallas_evp_tiled_padded's fixed-mode
    invariant extended to array-metric grids).  Returns
    (K, TX, TY, Wx, Wy) or None when the pinned shape can't serve this
    grid (VMEM, divisibility of the Mosaic block rules, or the gated wall
    fills' single-trigger-tile constraints)."""
    from .pallas_evp_tiled import pick_chunk
    K = pick_chunk(nsub)
    if K is None:
        return None
    TX, TY = fixed
    if TY is None:
        return None      # y-spanning slabs carry nyp: shape-dependent
    if TX % 8 or TY % 128:
        return None
    Wx = _wx(K, True)    # pinned wide overlap, topology-independent
    Wy = 64
    Hy = max(grid.Hy, 2 * K + 3) if widen_fold else grid.Hy
    nxp = grid.nxp
    nyp = grid.Ny + 2 * Hy
    ntx, nty = -(-nxp // TX), -(-nyp // TY)
    if mult * (TX + 2 * Wx) * (TY + 2 * Wy) * 4 > _VMEM_BUDGET:
        return None
    # single-trigger-tile constraints of the gated wall fills (see
    # _plan_tiles): the domain-edge row/col must live in exactly one tile
    if grid.topology[0] == BOUNDED and ntx > 1 and (
            TX - Wx <= grid.Hx or (ntx - 1) * TX + Wx > grid.Hx + grid.Nx):
        return None
    if grid.topology[1] == BOUNDED and nty > 1 and (
            TY - Wy <= Hy or (not grid.north_fold
                              and (nty - 1) * TY + Wy > Hy + grid.Ny)):
        return None
    return K, TX, TY, Wx, Wy


def tiled_curvilinear_available(model):
    """Eligibility: the whole-array curvilinear kernel's physics envelope,
    on any size, serial or meshed-with-wide-halo."""
    from .momentum import SplitExplicitSolver, ImmersedDrag
    from .coriolis import FPlane
    from .stresses import SemiImplicitStress, StressFunction

    grid = model.grid
    dyn = model.dynamics
    if dyn is None or not isinstance(dyn.rheology, ElastoViscoPlasticRheology):
        return False
    if not isinstance(dyn.solver, SplitExplicitSolver):
        return False
    if not _chunk_options(dyn.solver.substeps):
        return False
    if grid.kind == "rectilinear" and not grid.north_fold:
        return False  # the rectilinear tiers are cheaper
    if grid.topology[0] not in (PERIODIC, BOUNDED):
        return False
    if grid.topology[1] not in (PERIODIC, BOUNDED):
        return False
    if grid.north_fold and grid.topology[1] != BOUNDED:
        return False
    if grid.Hx == 0 or grid.Hy == 0:
        return False
    if grid.np_dtype != np.dtype("float32"):
        return False
    if grid.mesh_axes is not None:
        if getattr(dyn.solver, "halo_exchange", None) != "wide":
            return False  # per-substep exchange can't cross a fused chunk
        if grid.north_fold and _meshed(grid, 0):
            return False  # fold split across x: local fills can't refresh it
    if dyn.immersed_drag is not None and not isinstance(dyn.immersed_drag,
                                                        ImmersedDrag):
        return False
    # HBM bound: gathered slabs (36+ arrays × overlap redundancy) persist
    # across chunks; cap near the rectilinear tier's limit
    if grid.nxp * grid.nyp > 50_000_000:
        return False
    mult = _MULT_DRAG if _drag_on(model) else _MULT
    widen = grid.north_fold and grid.mesh_axes is None
    fixed = getattr(dyn.solver, "fixed_tiles", None)
    if fixed is not None:
        if _fixed_plan(grid, dyn.solver.substeps, fixed, mult,
                       widen_fold=widen) is None:
            return False
    elif _plan_tiles(grid, dyn.solver.substeps, mult, widen_fold=widen) is None:
        return False

    def ok_val(x):
        if isinstance(x, StressFunction):
            return True
        return (x is None or np.ndim(x) == 0
                or getattr(x, "shape", None) == grid.shape)

    top = dyn.top_momentum_stress
    if isinstance(top, dict):
        if not (ok_val(top.get("u")) and ok_val(top.get("v"))):
            return False
    elif top is not None and not ok_val(top):
        return False
    bottom = dyn.bottom_momentum_stress
    if bottom is not None and not isinstance(bottom, SemiImplicitStress):
        return False
    if isinstance(bottom, SemiImplicitStress):
        if not (ok_val(bottom.ue) and ok_val(bottom.ve)):
            return False
    if dyn.coriolis is not None and not isinstance(dyn.coriolis, FPlane):
        return False
    if dyn.free_drift is not None:
        return False
    if model.forcing:
        return False
    return True


# --- in-trace widening for serial folded grids ---------------------------------

def _jnp_repad_metric(grid, m, Hx, Hy, xface, yface):
    """Traced analog of grids._curvilinear_with_halo.repad + _fold_metric_halo
    for one metric array (scalars pass through)."""
    if np.ndim(m) == 0:
        return m
    Nx, Ny = grid.Nx, grid.Ny
    m = jnp.asarray(m)
    if m.shape[0] == 1:  # (1, nyp) latitude row — broadcast first
        m = jnp.broadcast_to(m, grid.shape)
    q = grid.interior(m)
    if grid.topology[0] == PERIODIC:
        left, right = q[Nx - Hx:], q[:Hx]
    else:
        left = jnp.broadcast_to(q[:1], (Hx, Ny))
        right = jnp.broadcast_to(q[-1:], (Hx, Ny))
    q = jnp.concatenate([left, q, right], 0)
    south = jnp.broadcast_to(q[:, :1], (q.shape[0], Hy))
    north = jnp.broadcast_to(q[:, -1:], (q.shape[0], Hy))
    full = jnp.concatenate([south, q, north], 1)
    if grid.north_fold:
        p = np.arange(Nx + 2 * Hx)
        if xface:
            src = ((Nx - (p - Hx)) % Nx) + Hx
        else:
            src = ((Nx - 1 - (p - Hx)) % Nx) + Hx
        r = full[src, :]
        if not yface:
            cols = [r[:, Hy + Ny - 1 - k:Hy + Ny - k] for k in range(Hy)]
            full = jnp.concatenate([full[:, :Hy + Ny]] + cols, 1)
        else:
            seam = 0.5 * (full[:, Hy + Ny:Hy + Ny + 1]
                          + r[:, Hy + Ny:Hy + Ny + 1])
            cols = [r[:, Hy + Ny - k:Hy + Ny - k + 1] for k in range(1, Hy)]
            full = jnp.concatenate([full[:, :Hy + Ny], seam] + cols, 1)
    return full


def _widened_masks(gw, solid_int, immersed):
    """Masks on the widened serial grid (traced; mirrors model construction's
    peripheral_masks/_solid_base/immersed_only_ff)."""
    from ..model import Masks
    from ..fields import fill_halos_cc
    Hx, Hy, Nx, Ny = gw.Hx, gw.Hy, gw.Nx, gw.Ny
    col = jnp.arange(gw.nxp)[:, None]
    row = jnp.arange(gw.nyp)[None, :]
    wall = jnp.zeros(gw.shape, bool)
    if gw.topology[0] == BOUNDED and Hx > 0:
        wall = wall | (col < Hx) | (col >= Hx + Nx)
    if gw.topology[1] == BOUNDED and Hy > 0:
        wall = wall | (row < Hy)
        if not gw.north_fold:
            wall = wall | (row >= Hy + Ny)
    if solid_int is not None:
        s = jnp.zeros(gw.shape, gw.np_dtype)
        s = s.at[Hx:Hx + Nx, Hy:Hy + Ny].set(solid_int.astype(gw.np_dtype))
        solid = fill_halos_cc(s, gw) > 0.5
    else:
        solid = jnp.zeros(gw.shape, bool)
    full = solid | wall

    def per(s):
        sx = jnp.roll(s, 1, 0)
        sy = jnp.roll(s, 1, 1)
        return s | sx, s | sy, s | sx | sy | jnp.roll(sx, 1, 1)

    per_fc, per_cf, per_ff = per(full)
    if immersed:
        _, _, wall_ff = per(wall)
        imm_ff = per_ff & ~wall_ff
    else:
        imm_ff = None
    return Masks(solid_cc=full if immersed else None,
                 per_fc=per_fc, per_cf=per_cf, per_ff=per_ff, imm_ff=imm_ff)


def _widen_stresses(model, state, gw):
    """Dynamics with StressFunctions resolved on the *original* grid (their
    closures carry original-shape arrays) and grid-shaped stress/ocean
    velocity arrays re-embedded into the widened padding.  Scalars pass
    through; the vector-sign fold fill happens in the prepare step."""
    import dataclasses
    from ..model import make_fields
    from ..fields import FILLERS
    from .stresses import SemiImplicitStress, StressFunction, _value

    grid = model.grid
    dyn = model.dynamics
    fields0 = make_fields(model, state)
    Hx, Hy, Hw = grid.Hx, grid.Hy, gw.Hy

    def res(x, loc):
        if isinstance(x, StressFunction):
            x = _value(x, grid, state.clock, fields0)
        if getattr(x, "shape", None) != grid.shape:
            return x  # scalar / None
        q = jnp.asarray(x, grid.np_dtype)
        ny_keep = grid.Ny + 1 if loc[1] == "f" else grid.Ny
        inner = q[Hx:Hx + grid.Nx, Hy:Hy + ny_keep]
        full = jnp.zeros(gw.shape, q.dtype)
        full = full.at[Hx:Hx + grid.Nx, Hw:Hw + ny_keep].set(inner)
        return FILLERS[loc](full, gw)

    top = dyn.top_momentum_stress
    if isinstance(top, dict):
        top = {"u": res(top.get("u"), ("f", "c")),
               "v": res(top.get("v"), ("c", "f"))}
    elif top is not None:
        top = res(top, ("f", "c"))
    bottom = dyn.bottom_momentum_stress
    if isinstance(bottom, SemiImplicitStress):
        bottom = dataclasses.replace(bottom, ue=res(bottom.ue, ("f", "c")),
                                     ve=res(bottom.ve, ("c", "f")))
    if top is dyn.top_momentum_stress and bottom is dyn.bottom_momentum_stress:
        return dyn
    return dataclasses.replace(dyn, top_momentum_stress=top,
                               bottom_momentum_stress=bottom)


def _widen_folded(model, state, u_start, v_start, K):
    """Serial folded grid with Hy < 2K+3: widen the y halo in-trace so the
    fold halo survives a K-substep exchange-free chunk.  Returns
    (wmodel, wstate, wu, wv, crop) where ``crop(q, loc)`` maps a widened
    padded array back onto the original grid's padding (zeros in the old
    halos — the caller re-fills)."""
    from ..grids import _METRIC_LOCS
    from ..fields import FILLERS

    grid = model.grid
    Hw = 2 * K + 3
    Hx, Hy = grid.Hx, grid.Hy

    mets = {f: _jnp_repad_metric(grid, getattr(grid, f), Hx, Hw, *loc)
            for f, loc in _METRIC_LOCS.items()}
    idx_y = np.arange(-Hw, grid.Ny + Hw, dtype=float)
    gw = grid.evolve(
        Hy=Hw, solid_cc=None,
        yc=jnp.asarray(idx_y + 0.5, grid.np_dtype),
        yf=jnp.asarray(idx_y, grid.np_dtype),
        lon_cc=None, lat_cc=None, **mets)
    immersed = grid.solid_cc is not None
    solid_int = grid.interior(grid.solid_cc) if immersed else None
    wmasks = _widened_masks(gw, solid_int, immersed)
    gw = gw.evolve(solid_cc=wmasks.solid_cc)
    wmodel = model.evolve(grid=gw, masks=wmasks,
                          dynamics=_widen_stresses(model, state, gw))

    def widen(q, loc):
        if q is None:
            return None
        filler = FILLERS[loc]
        # keep the seam face row for y-face fields (a physical DOF on folds)
        ny_keep = grid.Ny + 1 if loc[1] == "f" else grid.Ny
        inner = q[Hx:Hx + grid.Nx, Hy:Hy + ny_keep]
        full = jnp.zeros(gw.shape, q.dtype)
        full = full.at[Hx:Hx + grid.Nx, Hw:Hw + ny_keep].set(inner)
        return filler(full, gw)

    wu = widen(u_start, ("f", "c"))
    wv = widen(v_start, ("c", "f"))
    wstate = state.evolve(
        h=widen(state.h, ("c", "c")), a=widen(state.a, ("c", "c")),
        hs=widen(state.hs, ("c", "c")), S=widen(state.S, ("c", "c")),
        Tu=widen(state.Tu, ("c", "c")), Tus=widen(state.Tus, ("c", "c")),
        u=wu, v=wv, un=widen(state.un, ("f", "c")),
        vn=widen(state.vn, ("c", "f")),
        sig11=widen(state.sig11, ("c", "c")),
        sig22=widen(state.sig22, ("c", "c")),
        sig12=widen(state.sig12, ("f", "f")),
        alpha=widen(state.alpha, ("c", "c")),
        P=widen(state.P, ("c", "c")), Delta=widen(state.Delta, ("c", "c")),
        zeta_cc=widen(state.zeta_cc, ("c", "c")),
        zeta_ff=widen(state.zeta_ff, ("f", "f")))

    def crop(q, loc):
        ny_keep = grid.Ny + 1 if loc[1] == "f" else grid.Ny
        inner = q[Hx:Hx + grid.Nx, Hw:Hw + ny_keep]
        full = jnp.zeros(grid.shape, q.dtype)
        return full.at[Hx:Hx + grid.Nx, Hy:Hy + ny_keep].set(inner)

    return wmodel, wstate, wu, wv, crop


# --- per-substep gated boundary fills ------------------------------------------

def _make_fillers(grid, TX, Wx, TY, Wy, edge_offsets):
    """Fill closures on a halo-extended tile.  ``edge_offsets``:
    (wx_off, ex_off, sy_off, ny_off) static local offsets of the domain-edge
    row/col inside the (single) triggering tile.  ``make(gxy, gates)`` binds
    the traced coordinate blocks and shard-position gates."""
    bounded_x = grid.topology[0] == BOUNDED
    bounded_y = grid.topology[1] == BOUNDED
    fold = grid.north_fold
    Nxl, Nyl = grid.Nx, grid.Ny
    wx_off, ex_off, sy_off, ny_off = edge_offsets

    def make(gxy, gates):
        gx, gy = gxy

        def fill_x(q, face):
            if not bounded_x:
                return q
            gw_ = gates[_G_W] > 0
            ge_ = gates[_G_E] > 0
            if face:
                q = jnp.where((gx < 0) & gw_, 0.0, q)
                q = jnp.where((gx > Nxl) & ge_, 0.0, q)
            else:
                q = jnp.where((gx < 0) & gw_, q[wx_off:wx_off + 1], q)
                q = jnp.where((gx >= Nxl) & ge_, q[ex_off:ex_off + 1], q)
            return q

        def fill_y(q, face):
            if not bounded_y:
                return q
            gs_ = gates[_G_S] > 0
            if face:
                q = jnp.where((gy < 0) & gs_, 0.0, q)
            else:
                q = jnp.where((gy < 0) & gs_, q[:, sy_off:sy_off + 1], q)
            if not fold:
                gn_ = gates[_G_N] > 0
                if face:
                    q = jnp.where((gy > Nyl) & gn_, 0.0, q)
                else:
                    q = jnp.where((gy >= Nyl) & gn_,
                                  q[:, ny_off:ny_off + 1], q)
            return q

        def fill_fc(q):
            return fill_y(fill_x(q, True), False)

        def fill_cf(q):
            return fill_y(fill_x(q, False), True)

        return fill_fc, fill_cf

    return make

# --- the kernel ----------------------------------------------------------------

def _tiled_curv_kernel(K, base_even, make_fillers, has_drag,
                       params_ref, gates_ref, gx_ref, gy_ref, *refs):
    """One K-substep chunk on one halo-extended tile.  Body mirrors
    `pallas_evp_curvilinear._curvilinear_kernel` with the 14 derived metric
    forms passed as tile slabs and the boundary fills gated (no fold branch:
    the fold halo self-evolves, see module docstring)."""
    (dyfc_ref, dxcf_ref, iazcc_ref, iazfc_ref, iazcf_ref, iazff_ref,
     dycc2_ref, dxcc2_ref, dxff2_ref, dyff2_ref,
     idyfc_ref, idxcf_ref, idxfc_ref, idycf_ref) = refs[:14]
    (P_ref, Pff_ref, gcc_ref, gff_ref,
     drag_u_ref, invm_u_ref, act_u_ref, un_ref,
     drag_v_ref, invm_v_ref, act_v_ref, vn_ref,
     mcc_ref, mff_ref) = refs[14:28]
    if has_drag:
        immsu_ref, immnu_ref, immwv_ref, immev_ref = refs[28:32]
        rest = refs[32:]
    else:
        rest = refs[28:]
    (tauu_ref, tauv_ref, ue_ref, ve_ref,
     u_ref, v_ref, s11_ref, s22_ref, s12_ref, al_ref,
     o_u_ref, o_v_ref, o_s11_ref, o_s22_ref, o_s12_ref, o_al_ref) = rest
    p = params_ref
    dt = p[_P_DT]
    f_cor = p[_P_F]
    rC = p[_P_RC]
    e_inv2 = p[_P_EINV2]
    a_min = p[_P_AMIN]
    a_max = p[_P_AMAX]
    d_min = p[_P_DMIN]
    repl = p[_P_REPL]

    dy_fc = dyfc_ref[:]
    dx_cf = dxcf_ref[:]
    inv_az_cc = iazcc_ref[:]
    inv_az_fc = iazfc_ref[:]
    inv_az_cf = iazcf_ref[:]
    inv_az_ff = iazff_ref[:]
    dy_cc2 = dycc2_ref[:]
    dx_cc2 = dxcc2_ref[:]
    dx_ff2 = dxff2_ref[:]
    dy_ff2 = dyff2_ref[:]
    inv_dy_fc = idyfc_ref[:]
    inv_dx_cf = idxcf_ref[:]
    inv_dx_fc = idxfc_ref[:]
    inv_dy_cf = idycf_ref[:]

    P = P_ref[:]
    Pff = Pff_ref[:]
    gcc = gcc_ref[:]
    gff = gff_ref[:]
    drag_u = drag_u_ref[:]
    invm_u = invm_u_ref[:]
    act_u = act_u_ref[:]
    un = un_ref[:]
    drag_v = drag_v_ref[:]
    invm_v = invm_v_ref[:]
    act_v = act_v_ref[:]
    vn = vn_ref[:]
    msk_cc = mcc_ref[:]
    msk_ff = mff_ref[:]
    if has_drag:
        imms_u = immsu_ref[:]
        immn_u = immnu_ref[:]
        immw_v = immwv_ref[:]
        imme_v = immev_ref[:]
    tau_u_top = tauu_ref[:]
    tau_v_top = tauv_ref[:]
    ue = ue_ref[:]
    ve = ve_ref[:]
    fill_fc, fill_cf = make_fillers((gx_ref[:], gy_ref[:]), gates_ref)

    roll = pltpu.roll

    def sp(q, axis):
        return roll(q, 1, axis)

    def sm(q, axis):
        return roll(q, q.shape[axis] - 1, axis)

    def ixf_(q):
        return 0.5 * (q + sp(q, 0))

    def iyf_(q):
        return 0.5 * (q + sp(q, 1))

    def ixc_(q):
        return 0.5 * (q + sm(q, 0))

    def iyc_(q):
        return 0.5 * (q + sm(q, 1))

    # loop-invariant external-velocity interpolations (hoisted: consts)
    ve_fc = ixf_(iyc_(ve))
    ue_cf = ixc_(iyf_(ue))

    # transcendental-lean scalar forms (see pallas_evp._evp_kernel)
    inv_dt = 1.0 / dt
    inv_dmin = 1.0 / d_min
    amin2 = a_min * a_min
    amax2 = a_max * a_max
    rsqrt = lax.rsqrt

    def stresses(u, v, s11, s22, s12):
        u_dy = u * dy_fc
        v_dx = v * dx_cf
        eD = ((sm(u_dy, 0) - u_dy) + (sm(v_dx, 1) - v_dx)) * inv_az_cc
        u_ody = u * inv_dy_fc
        v_odx = v * inv_dx_cf
        eT = (dy_cc2 * (sm(u_ody, 0) - u_ody)
              - dx_cc2 * (sm(v_odx, 1) - v_odx)) * inv_az_cc
        u_odx = u * inv_dx_fc
        v_ody = v * inv_dy_cf
        eS = (dx_ff2 * (u_odx - sp(u_odx, 1))
              + dy_ff2 * (v_ody - sp(v_ody, 0))) * inv_az_ff
        # (d, t) = (eD, eT) directly on curvilinear grids; the ff-point
        # invariants interpolate the pair (one ixy and the e11/e22 splits
        # saved; see pallas_evp._evp_kernel for the transcendental-lean
        # algebra, validation/perf_kernel_surgery.py for the measurement)
        e12 = 0.5 * eS
        d_ff = ixf_(iyf_(eD))
        t_ff = ixf_(iyf_(eT))
        e12c = ixc_(iyc_(e12))
        dd_cc = eD * eD + (eT * eT + 4 * e12c * e12c) * e_inv2
        dd_ff = d_ff * d_ff + (t_ff * t_ff + 4 * e12 * e12) * e_inv2
        rD_cc = jnp.minimum(rsqrt(dd_cc), inv_dmin)
        rD_ff = jnp.minimum(rsqrt(dd_ff), inv_dmin)
        Dcc = jnp.maximum(dd_cc * rD_cc, d_min)
        zcc = 0.5 * P * rD_cc
        zff = 0.5 * Pff * rD_ff
        Pr = jnp.where(repl > 0, P * Dcc / (Dcc + d_min), P)
        eta_cc = zcc * e_inv2
        eta_ff = zff * e_inv2
        iso = (zcc - eta_cc) * eD - Pr * 0.5
        s11_t = eta_cc * (eD + eT) + iso
        s22_t = eta_cc * (eD - eT) + iso
        s12_t = 2 * eta_ff * e12
        g2cc = jnp.clip(zcc * gcc, amin2, amax2)
        g2ff = jnp.clip(zff * gff, amin2, amax2)
        rg_cc = rsqrt(g2cc)
        rg_ff = rsqrt(g2ff)
        ok_g = gcc > 0
        gamma_cc = jnp.where(ok_g, g2cc * rg_cc, a_max)
        s11 = s11 + jnp.where(ok_g, (s11_t - s11) * rg_cc, 0.0)
        s22 = s22 + jnp.where(ok_g, (s22_t - s22) * rg_cc, 0.0)
        s12 = s12 + jnp.where(gff > 0, (s12_t - s12) * rg_ff, 0.0)
        return s11, s22, s12, gamma_cc

    def divergences(s11, s22, s12):
        s11m = s11 * msk_cc
        s22m = s22 * msk_cc
        s12m = s12 * msk_ff
        sD = s11m + s22m
        sT = s11m - s22m
        yT = dy_cc2 * sT
        xS = dx_ff2 * s12m
        div_x = (dy_fc * (sD - sp(sD, 0)) * 0.5
                 + (yT - sp(yT, 0)) * inv_dy_fc * 0.5
                 + (sm(xS, 1) - xS) * inv_dx_fc) * inv_az_fc
        xT = dx_cc2 * sT
        yS = dy_ff2 * s12m
        div_y = (dx_cf * (sD - sp(sD, 1)) * 0.5
                 - (xT - sp(xT, 1)) * inv_dx_cf * 0.5
                 + (sm(yS, 0) - yS) * inv_dy_cf) * inv_az_cf
        return div_x, div_y

    def u_update(u, v, div_x, alpha):
        v_fc = ixf_(iyc_(v))
        du = ue - u
        dv = ve_fc - v_fc
        speed = jnp.sqrt(du * du + dv * dv)
        imm = (imms_u * u + immn_u * sm(u, 1)) * invm_u if has_drag else 0.0
        Gu = (f_cor * v_fc - tau_u_top * drag_u + rC * speed * ue * drag_u
              + div_x * invm_u - imm
              + (un - u) * inv_dt)
        Gu = jnp.where(invm_u > 0, Gu, 0.0)
        idtau = ixf_(alpha) * inv_dt
        u_new = (u * idtau + Gu) / (idtau + rC * speed * drag_u) * act_u
        return fill_fc(u_new)

    def v_update(u, v, div_y, alpha):
        u_cf = ixc_(iyf_(u))
        dv = ve - v
        du = ue_cf - u_cf
        speed = jnp.sqrt(du * du + dv * dv)
        imm = (immw_v * v + imme_v * sm(v, 0)) * invm_v if has_drag else 0.0
        Gv = (-f_cor * u_cf - tau_v_top * drag_v + rC * speed * ve * drag_v
              + div_y * invm_v - imm
              + (vn - v) * inv_dt)
        Gv = jnp.where(invm_v > 0, Gv, 0.0)
        idtau = iyf_(alpha) * inv_dt
        v_new = (v * idtau + Gv) / (idtau + rC * speed * drag_v) * act_v
        return fill_cf(v_new)

    def one(carry, even):
        u, v, s11, s22, s12, alpha = carry
        s11, s22, s12, alpha = stresses(u, v, s11, s22, s12)
        div_x, div_y = divergences(s11, s22, s12)
        if even:
            u = u_update(u, v, div_x, alpha)
            v = v_update(u, v, div_y, alpha)
        else:
            v = v_update(u, v, div_y, alpha)
            u = u_update(u, v, div_x, alpha)
        return (u, v, s11, s22, s12, alpha)

    # chunk covers substeps base+1 … base+K; substep parity baked in
    # statically (see pallas_evp_tiled_padded)
    first_even = not base_even

    def pair(j, carry):
        return one(one(carry, first_even), not first_even)

    init = (fill_fc(u_ref[:]), fill_cf(v_ref[:]),
            s11_ref[:], s22_ref[:], s12_ref[:], al_ref[:])
    carry = lax.fori_loop(0, K // 2, pair, init)
    if K % 2:
        carry = one(carry, first_even)
    u, v, s11, s22, s12, alpha = carry

    TX = o_u_ref.shape[0]
    TY = o_u_ref.shape[1]
    Wx = (u.shape[0] - TX) // 2
    Wy = (u.shape[1] - TY) // 2
    sx = slice(Wx, Wx + TX)
    sy = slice(Wy, Wy + TY)
    o_u_ref[:] = u[sx, sy]
    o_v_ref[:] = v[sx, sy]
    o_s11_ref[:] = s11[sx, sy]
    o_s22_ref[:] = s22[sx, sy]
    o_s12_ref[:] = s12[sx, sy]
    o_al_ref[:] = alpha[sx, sy]


# --- input preparation ----------------------------------------------------------

def _derived_metric_slabs(grid):
    """The 14 loop-invariant metric forms the kernel consumes, computed once
    on host/f32 exactly as the whole-array kernel derives them in VMEM
    (pallas_evp_curvilinear._curvilinear_kernel)."""
    def met(name):
        return jnp.broadcast_to(
            jnp.asarray(getattr(grid, name), jnp.float32), grid.shape)

    dy_fc = met("dy_fc")
    dx_cf = met("dx_cf")
    return [dy_fc, dx_cf,
            1.0 / met("az_cc"), 1.0 / met("az_fc"),
            1.0 / met("az_cf"), 1.0 / met("az_ff"),
            met("dy_cc") ** 2, met("dx_cc") ** 2,
            met("dx_ff") ** 2, met("dy_ff") ** 2,
            1.0 / dy_fc, 1.0 / dx_cf,
            1.0 / met("dx_fc"), 1.0 / met("dy_cf")]


def _prepare_tiled_inputs(model, state, dt, u_start, v_start, fixed=None,
                          interpret=False):
    """Whole-array curvilinear prepare (whose τ/uₑ/vₑ arrays already carry
    the Zipper sign flip on folded grids — required here for exact fold-halo
    self-evolution, see module docstring), with the raw 12-metric block
    replaced by the 14 derived forms.

    ``fixed`` (TX, TY): fixed-tile bitwise mode — XLA fuses the jnp
    mass/strength coefficient chain with the surrounding step graph and
    contracts FMAs shape-dependently, seeding ~1e-10 serial-vs-shard
    differences that α⁺-level EVP amplifies.  Recompute the coefficient
    block on fixed-shape Pallas tiles (the array-metric analog of
    pallas_evp_padded._fixed_tile_prepare) so its values are identical in
    every decomposition."""
    from .pallas_evp_curvilinear import _prepare_curvilinear_inputs

    params, consts, carry_in, P, has_drag = _prepare_curvilinear_inputs(
        model, state, dt, u_start, v_start)
    consts = _derived_metric_slabs(model.grid) + consts[12:]
    if fixed is not None:
        (P, Pff, gcc, gff, drag_u, invm_u, act_u,
         drag_v, invm_v, act_v) = _fixed_tile_prepare_curv(
            model, state.h, state.a, dt, fixed, interpret)
        masks = model.masks
        if masks.per_fc is not None:
            act_u = act_u * (~masks.per_fc).astype(jnp.float32)
        if masks.per_cf is not None:
            act_v = act_v * (~masks.per_cf).astype(jnp.float32)
        # const layout (_prepare_curvilinear_inputs + 14 derived metrics):
        # 14..17 = P, Pff, gcc, gff; 18..20 = drag_u, invm_u, act_u;
        # 21 = u_start; 22..24 = drag_v, invm_v, act_v (kernel ref order)
        consts[14:18] = [P, Pff, gcc, gff]
        consts[18:21] = [drag_u, invm_u, act_u]
        consts[22:25] = [drag_v, invm_v, act_v]
    return params, consts, carry_in, P, has_drag


def _prep_kernel_curv(params_ref, h_ref, a_ref, azcc_ref, azff_ref,
                      *out_refs):
    """Pointwise/interp EVP coefficient block on one fixed tile with
    array-valued cell areas (the curvilinear analog of
    pallas_evp_padded._prep_kernel; ops and order match
    pallas_evp_curvilinear._prepare_curvilinear_inputs exactly)."""
    (oP, oPff, ogcc, ogff, odrag_u, oinvm_u, oact_u,
     odrag_v, oinvm_v, oact_v) = out_refs
    p = params_ref
    rho = p[0]
    Pstar = p[1]
    Chard = p[2]
    cadt = p[3]       # relaxation_strength · Δt
    mass_min = p[4]
    conc_min = p[5]

    h = h_ref[:]
    a = a_ref[:]
    az_cc = azcc_ref[:]
    az_ff = azff_ref[:]
    roll = pltpu.roll

    def ixf_(q):
        return 0.5 * (q + roll(q, 1, 0))

    def iyf_(q):
        return 0.5 * (q + roll(q, 1, 1))

    m_cc = h * a * rho
    P = Pstar * h * jnp.exp(-Chard * (1 - a))
    Pff = ixf_(iyf_(P))
    m_ff = ixf_(iyf_(m_cc))
    m_fc = ixf_(m_cc)
    a_fc = ixf_(a)
    m_cf = iyf_(m_cc)
    a_cf = iyf_(a)

    gcc = jnp.where(m_cc > 0,
                    cadt / (jnp.where(m_cc > 0, m_cc, 1.0) * az_cc), -1.0)
    gff = jnp.where(m_ff > 0,
                    cadt / (jnp.where(m_ff > 0, m_ff, 1.0) * az_ff), -1.0)
    ok_u = m_fc > 0
    invm_u = jnp.where(ok_u, 1.0 / jnp.where(ok_u, m_fc, 1.0), 0.0)
    ok_v = m_cf > 0
    invm_v = jnp.where(ok_v, 1.0 / jnp.where(ok_v, m_cf, 1.0), 0.0)
    drag_u = invm_u * a_fc
    drag_v = invm_v * a_cf
    act_u = ((m_fc >= mass_min) & (a_fc >= conc_min)).astype(jnp.float32)
    act_v = ((m_cf >= mass_min) & (a_cf >= conc_min)).astype(jnp.float32)

    TX = oP.shape[0]
    TY = oP.shape[1]
    Wx = (h.shape[0] - TX) // 2
    Wy = (h.shape[1] - TY) // 2
    sx = slice(Wx, Wx + TX)
    sy = slice(Wy, Wy + TY)
    for ref, q in ((oP, P), (oPff, Pff), (ogcc, gcc), (ogff, gff),
                   (odrag_u, drag_u), (oinvm_u, invm_u), (oact_u, act_u),
                   (odrag_v, drag_v), (oinvm_v, invm_v), (oact_v, act_v)):
        ref[:] = q[sx, sy]


def _fixed_tile_prepare_curv(model, h, a, dt, fixed, interpret):
    """Run `_prep_kernel_curv` over fixed (TX, TY) tiles of the padded
    arrays; returns the 10 coefficient arrays on the padded shape."""
    grid = model.grid
    dyn = model.dynamics
    rheo = dyn.rheology
    TX, TY = fixed
    Wx, Wy = 8, 64     # prep stencil radius 1: pinned small overlaps
    nxp, nyp = grid.nxp, grid.nyp
    ntx, nty = -(-nxp // TX), -(-nyp // TY)
    bx, by = TX + 2 * Wx, TY + 2 * Wy

    wrap_x = grid.topology[0] == PERIODIC and not _meshed(grid, 0)
    wrap_y = grid.topology[1] == PERIODIC and not _meshed(grid, 1)
    idx_x, _ = _tile_indices(nxp, grid.Nx, grid.Hx, ntx, TX, Wx, wrap_x)
    idx_y, _ = _tile_indices(nyp, grid.Ny, grid.Hy, nty, TY, Wy, wrap_y)

    def slab(q):
        return q[idx_x][:, idx_y]

    def met(name):
        return jnp.broadcast_to(
            jnp.asarray(getattr(grid, name), jnp.float32), grid.shape)

    params = jnp.stack([
        jnp.asarray(model.sea_ice_density, jnp.float32),
        jnp.asarray(rheo.ice_compressive_strength, jnp.float32),
        jnp.asarray(rheo.ice_compaction_hardening, jnp.float32),
        jnp.asarray(rheo.relaxation_strength, jnp.float32)
        * jnp.asarray(dt, jnp.float32),
        jnp.asarray(dyn.minimum_mass, jnp.float32),
        jnp.asarray(dyn.minimum_concentration, jnp.float32)])

    blk_in = pl.BlockSpec((bx, by), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _prep_kernel_curv,
        grid=(ntx, nty),
        out_shape=[jax.ShapeDtypeStruct((ntx * TX, nty * TY),
                                        jnp.float32)] * 10,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk_in] * 4,
        out_specs=[blk_out] * 10,
        interpret=interpret,
        **vmem_compiler_params(interpret),
    )(params, slab(h), slab(a), slab(met("az_cc")), slab(met("az_ff")))
    return tuple(q[:nxp, :nyp] for q in outs)


def _tile_indices(ext, n_int, H, n_tiles, T, W, wrap):
    """Carried-array gather indices + interior coordinates for all tiles
    along one dimension.  ``wrap``: periodic-unmeshed dims wrap into the
    interior; others clamp at the carried-array edge."""
    idx, coords = [], []
    for i in range(n_tiles):
        r = np.arange(i * T - W, i * T + T + W)
        coords.append((r - H).astype(np.float32))
        if wrap:
            idx.append(H + (r - H) % n_int)
        else:
            idx.append(np.clip(r, 0, ext - 1))
    return np.concatenate(idx), np.concatenate(coords)


def tiled_curvilinear_momentum_step(model, state, dt, u_start, v_start,
                                    interpret=False):
    """Substep-chunked tiled curvilinear fused step; returns the jnp path's
    update dict (pallas_evp_curvilinear.curvilinear_fused_momentum_step
    contract)."""
    from ..fields import (fill_halos_cc, fill_halos_ff,
                          fill_halos_fc_local, fill_halos_cf_local,
                          fill_halos_cc_local, fill_halos_ff_local)

    grid0 = model.grid
    nsub = model.dynamics.solver.substeps
    mult = _MULT_DRAG if _drag_on(model) else _MULT
    widen = grid0.north_fold and grid0.mesh_axes is None
    fixed = getattr(model.dynamics.solver, "fixed_tiles", None)
    if fixed is not None:
        plan = _fixed_plan(grid0, nsub, fixed, mult, widen_fold=widen)
    else:
        plan = _plan_tiles(grid0, nsub, mult, widen_fold=widen)
    if plan is None:
        raise ValueError("tiled curvilinear EVP: no tile plan fits VMEM")
    K, TX, TY, Wx, Wy = plan
    n_chunks = nsub // K

    state0, u0, v0 = state, u_start, v_start
    crop_back = None
    if widen and grid0.Hy < 2 * K + 3:
        model, state, u_start, v_start, crop_back = _widen_folded(
            model, state, u_start, v_start, K)
    grid = model.grid
    Hx, Hy, Nx, Ny = grid.Hx, grid.Hy, grid.Nx, grid.Ny
    nxp, nyp = grid.nxp, grid.nyp

    ntx, nty = -(-nxp // TX), -(-nyp // TY)
    bx, by = TX + 2 * Wx, TY + 2 * Wy

    params, consts, carry_in, P, has_drag = _prepare_tiled_inputs(
        model, state, dt, u_start, v_start, fixed=fixed, interpret=interpret)

    wrap_x = grid.topology[0] == PERIODIC and not _meshed(grid, 0)
    wrap_y = grid.topology[1] == PERIODIC and not _meshed(grid, 1)
    idx_x, gx_rows = _tile_indices(nxp, Nx, Hx, ntx, TX, Wx, wrap_x)
    idx_y, gy_cols = _tile_indices(nyp, Ny, Hy, nty, TY, Wy, wrap_y)
    gx = jnp.broadcast_to(jnp.asarray(gx_rows)[:, None],
                          (gx_rows.size, gy_cols.size))
    gy = jnp.broadcast_to(jnp.asarray(gy_cols)[None, :],
                          (gx_rows.size, gy_cols.size))

    def slab(q):
        return q[idx_x][:, idx_y]

    const_slabs = [slab(q) for q in consts]

    # shard-position gates for the wall fills (1 everywhere on serial grids)
    def gate(dim, low):
        if not _meshed(grid, dim):
            return jnp.float32(1.0)
        name = grid.mesh_axes[dim]
        i = lax.axis_index(name)
        tgt = 0 if low else grid.mesh_shape[dim] - 1
        return (i == tgt).astype(jnp.float32)

    gates = jnp.stack([gate(0, True), gate(0, False),
                       gate(1, True), gate(1, False)])

    edge_offsets = (Wx + Hx,
                    Wx + Hx + Nx - 1 - (ntx - 1) * TX,
                    Wy + Hy,
                    Wy + Hy + Ny - 1 - (nty - 1) * TY)
    make_fillers = _make_fillers(grid, TX, Wx, TY, Wy, edge_offsets)

    blk_in = pl.BlockSpec((bx, by), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    out_rows, out_cols = ntx * TX, nty * TY

    def run_chunk(base_even, carry):
        kernel = functools.partial(_tiled_curv_kernel, K, base_even,
                                   make_fillers, has_drag)
        carry_slabs = [slab(q) for q in carry]
        outs = pl.pallas_call(
            kernel,
            grid=(ntx, nty),
            out_shape=[jax.ShapeDtypeStruct((out_rows, out_cols),
                                            jnp.float32)] * 6,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [blk_in] * (2 + len(const_slabs) + 6),
            out_specs=[blk_out] * 6,
            interpret=interpret,
            **vmem_compiler_params(interpret),
        )(params, gates, gx, gy, *const_slabs, *carry_slabs)
        return tuple(q[:nxp, :nyp] for q in outs)

    def refill(carry):
        """Re-impose fold/wall halos between exchange-free chunks with the
        *local* fills (the communication-avoiding σ/velocity refresh; only
        folded grids evolve halo data the in-kernel fills can't rebuild)."""
        if not grid.north_fold:
            return carry
        u, v, s11, s22, s12, alpha = carry
        return (fill_halos_fc_local(u, grid), fill_halos_cf_local(v, grid),
                fill_halos_cc_local(s11, grid),
                fill_halos_cc_local(s22, grid),
                fill_halos_ff_local(s12, grid), alpha)

    carry = tuple(carry_in)
    if K % 2 == 0:
        def chunk(carry, _):
            return run_chunk(True, refill(carry)), None

        carry, _ = lax.scan(chunk, carry, None, length=n_chunks)
    else:
        def chunk2(carry, _):
            c = run_chunk(True, refill(carry))
            return run_chunk(False, refill(c)), None

        carry, _ = lax.scan(chunk2, carry, None, length=n_chunks // 2)
        if n_chunks % 2:
            carry = run_chunk(True, refill(carry))
    u, v, s11, s22, s12, alpha = carry

    if crop_back is not None:
        gout = grid0
        u = crop_back(u, ("f", "c"))
        v = crop_back(v, ("c", "f"))
        s11 = crop_back(s11, ("c", "c"))
        s22 = crop_back(s22, ("c", "c"))
        s12 = crop_back(s12, ("f", "f"))
        alpha = fill_halos_cc_local(crop_back(alpha, ("c", "c")), grid0)
        if fixed is not None:
            # decomposition-invariant P (pointwise in fold-consistent h, a,
            # so the local cc fill rebuilds exact halos)
            P = fill_halos_cc_local(crop_back(P, ("c", "c")), grid0)
        else:
            # P on the original padding, exactly as the jnp path computes it
            from .rheologies import ice_strength
            P = ice_strength(model.dynamics.rheology, state0.h, state0.a)
    else:
        gout = grid

    u = fill_halos_fc_local(u, gout)
    v = fill_halos_cf_local(v, gout)
    s11 = fill_halos_cc(s11, gout)
    s22 = fill_halos_cc(s22, gout)
    s12 = fill_halos_ff(s12, gout)

    return dict(u=u, v=v, sig11=s11, sig22=s22, sig12=s12, alpha=alpha,
                P=P, un=u0, vn=v0,
                Delta=state0.Delta, zeta_cc=state0.zeta_cc,
                zeta_ff=state0.zeta_ff)
