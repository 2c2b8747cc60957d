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
so folded grids need a y-halo ≥ 2K+5; serial folded grids are widened
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
                         _P_CALPHA, _P_DMIN, _P_MASSMIN, _P_CONCMIN,
                         VMEM_LIMIT_MB, vmem_compiler_params)
from .rheologies import ElastoViscoPlasticRheology

# gate-vector indices (second SMEM params input)
_G_W, _G_E, _G_S, _G_N, _NGATES = range(5)

_VMEM_BUDGET = (VMEM_LIMIT_MB - 6) * 2 ** 20
# Affine Mosaic occupancy per (bx, by) block: the v2 kernel streams a
# 21-plane stacked const block + a 6-plane carry block (double-buffered)
# + one stacked output block + ~40 block-sized residents (derived metric
# forms, in-kernel EVP coefficient block, loop temporaries).
_MULT = 128        # Mosaic occupancy per block-byte, calibrated on a v5e:
_MULT_DRAG = 135   # 240×1024 blocks compile, 240×1032 do not (r4 sweep)


def _meshed(grid, dim):
    from ..fields import _meshed as fm
    return fm(grid, dim)


def _wx(K, periodic_x):
    # Validity shrink is 2 rings/substep (stress update: radius 1; momentum
    # update + staggered interps: radius 1), plus 1 ring for the in-kernel
    # radius-1 coefficient derivation, plus 1 more with ImmersedDrag (the
    # shifted drag weights are radius 2): 2K+2 exact, +2 slack = 2K+4.  The
    # round-4 on-chip plan sweeps measured 2K+4 bit-identical to both 2K+6
    # and the old conservative 3K+3 rule on the flagship tripolar config
    # (plan-independence: same-K plans agree bitwise at the chaotic
    # pole-band argmax), and the CPU interpret-mode equality suite pins it
    # across topologies at non-chaotic substep counts.
    W = 2 * K + 4
    return W + (-W) % 4  # keep bx = TX + 2W a sublane multiple (TX ≡ 0 mod 8)


# This tier's own K cap (the rectilinear tiers keep pallas_evp_tiled.
# CHUNK_SUBSTEPS = 15): the round-5 cropped-flagship sweep measured K=20
# fastest (19.75 M pts/s vs 19.18 at K=12), so the search must see the
# 16..24 range; the fixed-tile bitwise mode still uses pick_chunk (≤ 15).
_CHUNK_CAP = 24


def _chunk_options(nsub):
    """Divisor chunk lengths, largest first (pallas_evp_tiled.pick_chunk
    relaxed to return all options)."""
    return [K for K in range(min(_CHUNK_CAP, nsub), 1, -1)
            if nsub % K == 0]


def _plan_tiles(grid, nsub, mult, widen_fold=False, cs=0):
    """Joint (K, Wy, ntx, nty) search minimizing modeled cost = redundant
    -compute ratio × (1 + 2/K) (the 1/K term prices the per-chunk HBM
    round-trip + boundary refills) under the VMEM budget and the
    single-trigger-tile constraints of the gated wall fills.

    ``CSI_TC_PLAN=K,TX,TY,Wx,Wy`` overrides the search (perf sweeps on real
    hardware without code edits); correctness is plan-independent — every
    plan satisfying the validity-shrink rule computes the same interiors.

    ``widen_fold``: serial folded grids are widened to Hy = max(Hy, 2K+3)
    before tiling — the effective shape depends on K, so the search accounts
    for it per candidate.  Returns (K, TX, TY, Wx, Wy) or None."""
    import os
    override = os.environ.get("CSI_TC_PLAN")
    if override:
        K, TX, TY, Wx, Wy = map(int, override.split(","))
        # Fail loudly on a K that does not divide nsub — n_chunks = nsub//K
        # would silently execute fewer EVP substeps (ADVICE r4).
        if nsub % K:
            raise ValueError(
                f"CSI_TC_PLAN: K={K} does not divide substeps={nsub}")
        return K, TX, TY, Wx, Wy
    Hx, Nx, Ny = grid.Hx, grid.Nx, grid.Ny
    nxp = grid.nxp
    periodic_x = grid.topology[0] == PERIODIC and not _meshed(grid, 0)
    bounded_x = grid.topology[0] == BOUNDED
    bounded_y = grid.topology[1] == BOUNDED
    best = None
    for K in _chunk_options(nsub):
        Wx = _wx(K, periodic_x)
        Hy = max(grid.Hy, 2 * K + 5) if widen_fold else grid.Hy
        nyp = Ny + 2 * Hy
        y_lo = _crop_y_lo(Hy, cs)   # solid-row crop: tiles start here
        ey = nyp - y_lo             # computed y extent
        # Mosaic block-shape rule: tiled lane-dim blocks must be %128 (both
        # the TY outputs and the TY+2Wy inputs ⇒ Wy %64); sublane %8.
        # A single-tile dimension may be any size (block == array dim).
        # nty == 1 with bounded y needs no y-overlap at all: the south/north
        # walls are re-imposed in-kernel every substep and the fold halo
        # (≥ 2K+5 by the widen rule) self-evolves inside the single block.
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
                for nty in range(1, min(64, max(2, ey // 8)) + 1):
                    need = -(-ey // nty)
                    if nty == 1:
                        TY = -(-need // 8) * 8
                        Wy = 0 if bounded_y else 64
                    else:
                        TY = -(-need // 128) * 128
                        Wy = 64
                    if nty > 1 and nty * TY - TY >= ey:
                        continue
                    by = TY + 2 * Wy
                    if bounded_y and nty > 1 and (
                            (y_lo == 0 and TY - Wy <= Hy) or (
                                not grid.north_fold
                                and (nty - 1) * TY + Wy > Hy + Ny - y_lo)):
                        continue
                    # VMEM feasibility on LANE-PADDED block bytes: Mosaic
                    # allocates ceil(by/128)·128 lanes, and the measured
                    # occupancy per padded block byte is ≈ 0.92·mult (the
                    # round-5 boundary: (K=24, bx=400, by=552→640) really
                    # allocates 126.16 M — 123/padded-byte — and fails the
                    # 126 M limit, while (K=20, bx=384) compiles; the
                    # unpadded estimate passed both).
                    by_eff = -(-by // 128) * 128
                    if 0.92 * mult * bx * by_eff * 4 > _VMEM_BUDGET:
                        continue
                    # cost: Mosaic-padded redundant-compute area (lane dim
                    # rounds to 128, sublane to 8) × a per-chunk overhead
                    # term × an odd-K penalty.  Calibrated against the
                    # on-chip plan sweeps at 1152×960: round 4 (uncropped,
                    # by=1024) measured K=12 nty=1 fastest and by=1032
                    # lane-pads to 1152 losing 11 %; round 5 (solid-row
                    # crop, ey≈525) measured K20/TX296 19.75 M > K12/240
                    # 19.18 > K24/240 19.07 > K12/296 18.98 > K15/296 18.81
                    # ≈ K20/240 18.79 > K10 18.1 > K5 17.9 > K8 17.0 M
                    # pts/s.  w=7 with the padded-VMEM exclusion reproduces
                    # both argmaxes; odd K measures ~3 % slow against its
                    # even neighbours (K=15 in both sweeps), hence ×1.04.
                    bx_eff = -(-bx // 8) * 8
                    ratio = (ntx * bx_eff) * (nty * by_eff) / (nxp * nyp)
                    cost = ratio * (1 + 7.0 / K)
                    if K % 2:
                        cost *= 1.04
                    if best is None or cost < best[0]:
                        best = (cost, K, TX, TY, Wx, Wy)
                    break  # larger nty only shrinks TY further
    if best is None:
        return None
    return best[1:]


def _drag_on(model):
    return (model.dynamics.immersed_drag is not None
            and model.grid.solid_cc is not None)


def _first_ocean_rows(model):
    """Per-interior-column index of the first NON-solid row (Ny where a
    column is fully solid) — static data from the immersed mask, known at
    trace time.  None when the crop machinery is ineligible: no immersed
    mask, meshed (per-shard crops ⇒ shape-dependent compilation),
    ``fixed_tiles`` (the bitwise contract pins block geometry), or a traced
    mask."""
    dyn = model.dynamics
    if dyn is not None and getattr(dyn.solver, "fixed_tiles", None) is not None:
        return None
    grid = model.grid
    if grid.mesh_axes is not None:
        return None
    solid = model.masks.solid_full
    if solid is None or isinstance(solid, jax.core.Tracer):
        return None
    s = np.asarray(solid) > 0.5
    inter = s[grid.Hx:grid.Hx + grid.Nx, grid.Hy:grid.Hy + grid.Ny]
    first = np.where(inter.all(axis=1), grid.Ny,
                     np.argmin(inter, axis=1))
    return first.astype(np.int64)


def _solid_crop_rows(model):
    """Count of southernmost interior rows that are FULLY solid (land/wall
    across every x).  The tiled kernel skips those rows outright: on a
    fully-solid row every velocity point is peripheral (act = 0 ⇒
    u = v = 0), every σ point has m_cc = 0 (⇒ γ gate < 0: σ frozen at its
    carry value) and α = a_max, so the kernel's would-be outputs are known
    without running it, and no active cell's stencil ever reads a value
    that differs from those constants (land cells cannot propagate data:
    u/v enter neighbours only via act-masked updates, σ only via msk-masked
    divergences; ``update_state``'s per-substage masking guarantees
    h·ℵ = 0 on solid cells at every kernel entry).  The flagship tripolar
    basin is 83 % land with 468/960 fully-solid southern rows (the 45–58°N
    closure) — cropping them nearly halves the computed y-extent."""
    first = _first_ocean_rows(model)
    if first is None:
        return 0
    cs = int(first.min())
    if cs >= model.grid.Ny:
        return 0  # degenerate all-solid domain: compute as before
    return cs


def _crop_y_lo(Hy, cs):
    """First computed padded row.  Four fully-solid margin rows stay inside
    the tile so every ACTIVE cell's radius-2 substep stencil reads in-block
    clean rows, never the block-edge rows whose own reads roll-wrap."""
    return max(0, Hy + cs - 4) if cs else 0


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
    Hy = max(grid.Hy, 2 * K + 5) if widen_fold else grid.Hy
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
            # Fold split across the x mesh: no local fill can refresh it
            # mid-loop (the mirror columns live on the partner shard), so
            # the fold halo must self-evolve through ALL substeps — exact
            # mirror arithmetic (module docstring) + a y-halo that covers
            # the full 2-cells/substep validity shrink.  The wide-halo
            # stepper builds Hy = 2·substeps+3, which leaves 3 slack rows.
            if grid.Hy < 2 * dyn.solver.substeps + 3:
                return False
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
    elif _plan_tiles(grid, dyn.solver.substeps, mult, widen_fold=widen,
                     cs=_solid_crop_rows(model)) is None:
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
        from .coriolis import LatitudeCoriolis
        if not (isinstance(dyn.coriolis, LatitudeCoriolis)
                and grid.lat_cc is not None):
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
                 per_fc=per_fc, per_cf=per_cf, per_ff=per_ff, imm_ff=imm_ff,
                 solid_full=full)


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
    """Serial folded grid with Hy < 2K+5: widen the y halo in-trace so the
    fold halo survives a K-substep exchange-free chunk.  Returns
    (wmodel, wstate, wu, wv, crop) where ``crop(q, loc)`` maps a widened
    padded array back onto the original grid's padding (zeros in the old
    halos — the caller re-fills)."""
    from ..grids import _METRIC_LOCS
    from ..fields import FILLERS

    grid = model.grid
    Hw = 2 * K + 5
    Hx, Hy = grid.Hx, grid.Hy

    mets = {f: _jnp_repad_metric(grid, getattr(grid, f), Hx, Hw, *loc)
            for f, loc in _METRIC_LOCS.items()}
    idx_y = np.arange(-Hw, grid.Ny + Hw, dtype=float)
    # keep lat_cc (LatitudeCoriolis evaluates f from it on the widened grid;
    # latitude is fold-symmetric, so the plain cc mirror images are exact)
    lat_w = (None if grid.lat_cc is None
             else _jnp_repad_metric(grid, grid.lat_cc, Hx, Hw, False, False))
    gw = grid.evolve(
        Hy=Hw, solid_cc=None,
        yc=jnp.asarray(idx_y + 0.5, grid.np_dtype),
        yf=jnp.asarray(idx_y, grid.np_dtype),
        lon_cc=None, lat_cc=lat_w, **mets)
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

def _make_fillers(grid, TX, Wx, TY, Wy, edge_offsets, south_on=True):
    """Fill closures on a halo-extended tile.  ``edge_offsets``:
    (wx_off, ex_off, sy_off, ny_off) static local offsets of the domain-edge
    row/col inside the (single) triggering tile.  ``make(gxy, gates)`` binds
    the traced coordinate blocks and shard-position gates.  ``south_on``
    False elides the south-wall fill statically — under a solid-row crop no
    tile contains the gy < 0 rows, so the where's predicate is provably
    always false."""
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
            if south_on:
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

# stacked-const plane indices (the single (21, bx, by) input block): 12 raw
# metrics, then the 9 state/forcing planes the in-kernel coefficient
# derivation consumes.  With LatitudeCoriolis one extra plane (f at cc) is
# appended at index _N_CONSTS == _C_FCOR.
(_C_DXCC, _C_DXFC, _C_DXCF, _C_DXFF, _C_DYCC, _C_DYFC, _C_DYCF, _C_DYFF,
 _C_IAZCC, _C_IAZFC, _C_IAZCF, _C_IAZFF,
 _C_H, _C_A, _C_SOLID, _C_UN, _C_VN, _C_TAUU, _C_TAUV, _C_UE, _C_VE,
 _N_CONSTS) = range(22)
_C_FCOR = _N_CONSTS

# extended-params tail (appended to the pallas_evp layout)
_PX_RHO, _PX_PSTAR, _PX_CHARD, _PX_CDRAG = 18, 19, 20, 21


def _tiled_curv_kernel(K, base_even, make_fillers, has_drag, immersed,
                       f_plane, repl_on, geom,
                       params_ref, gates_ref, xs_ref, c_ref, k_ref, o_ref):
    """One K-substep chunk on one halo-extended tile (v2).

    Inputs are two stacked blocks — consts (21, bx, by) and carry (6, bx, by)
    — one DMA each instead of ~44 per tile.  The EVP coefficient block
    (P, Pff, masses, γ, drag, activity, peripherality) is derived here once
    per chunk from (h, ℵ, solid) instead of being streamed: a slab diet for
    HBM, and automatically decomposition-invariant under ``fixed_tiles``
    (block shapes are pinned, so Mosaic emits identical per-point arithmetic
    on every shard — subsuming the old fixed-tile prepare pass).  Tile
    coordinates come from `program_id` + iota, not streamed slabs.  Substep
    body math is `pallas_evp_curvilinear._curvilinear_kernel` verbatim; no
    fold branch — the fold halo self-evolves (module docstring)."""
    (TX, TY, Wx, Wy, Hx, Hy, Nxl, Nyl, bounded_x, bounded_y, fold,
     y_lo, south_on, oy, ty_out) = geom
    p = params_ref
    dt = p[_P_DT]
    f_cor = p[_P_F]
    rC = p[_P_RC]
    e_inv2 = p[_P_EINV2]
    a_min = p[_P_AMIN]
    a_max = p[_P_AMAX]
    d_min = p[_P_DMIN]
    cadt = p[_P_CALPHA] * dt
    mass_min = p[_P_MASSMIN]
    conc_min = p[_P_CONCMIN]
    rho = p[_PX_RHO]
    Pstar = p[_PX_PSTAR]
    Chard = p[_PX_CHARD]

    bx, by = c_ref.shape[1], c_ref.shape[2]
    # per-tile x output-window starts from SMEM (i*TX for the regular
    # tiling; arbitrary under the x-segmented crop)
    gx = ((xs_ref[pl.program_id(0)] - (Wx + Hx))
          + lax.broadcasted_iota(jnp.int32, (bx, by), 0)).astype(jnp.float32)
    gy = ((pl.program_id(1) * TY + y_lo - (Wy + Hy))
          + lax.broadcasted_iota(jnp.int32, (bx, by), 1)).astype(jnp.float32)
    fill_fc, fill_cf = make_fillers((gx, gy), gates_ref)

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

    # fused double interpolations: one 0.25 scale instead of two 0.5s.
    # Bitwise-identical to ixf_(iyf_(q)) etc. — power-of-two scalings are
    # exact, so both forms are round(a+b) rescaled (r5 op diet; every
    # transform in this kernel body relative to the v2 form is an FP
    # identity, keeping all fused-vs-jnp and cross-tier comparisons intact).
    def ixyf_(q):
        t = q + sp(q, 1)
        return 0.25 * (t + sp(t, 0))

    def ixyc_(q):
        t = q + sm(q, 1)
        return 0.25 * (t + sm(t, 0))

    def ixf_yc_(q):
        t = q + sm(q, 1)
        return 0.25 * (t + sp(t, 0))

    def ixc_yf_(q):
        t = q + sp(q, 1)
        return 0.25 * (t + sm(t, 0))

    # raw metrics → the 14 loop-invariant derived forms (in VMEM, per chunk)
    dy_fc = c_ref[_C_DYFC]
    dx_cf = c_ref[_C_DXCF]
    inv_az_cc = c_ref[_C_IAZCC]
    inv_az_fc = c_ref[_C_IAZFC]
    inv_az_cf = c_ref[_C_IAZCF]
    inv_az_ff = c_ref[_C_IAZFF]
    dy_cc2 = c_ref[_C_DYCC] ** 2
    dx_cc2 = c_ref[_C_DXCC] ** 2
    dx_ff = c_ref[_C_DXFF]
    dy_ff = c_ref[_C_DYFF]
    dx_ff2 = dx_ff * dx_ff
    dy_ff2 = dy_ff * dy_ff
    inv_dy_fc = 1.0 / dy_fc
    inv_dx_cf = 1.0 / dx_cf
    inv_dx_fc = 1.0 / c_ref[_C_DXFC]
    inv_dy_cf = 1.0 / c_ref[_C_DYCF]

    # in-kernel EVP coefficient block (ops and order mirror
    # pallas_evp_curvilinear._prepare_curvilinear_inputs exactly; radius-1
    # stencils — the outermost block ring is priced into _wx)
    h = c_ref[_C_H]
    a = c_ref[_C_A]
    solid = c_ref[_C_SOLID]
    m_cc = h * a * rho
    P = Pstar * h * jnp.exp(-Chard * (1.0 - a))
    Pff = ixyf_(P)
    m_ff = ixyf_(m_cc)
    m_fc = ixf_(m_cc)
    a_fc = ixf_(a)
    m_cf = iyf_(m_cc)
    a_cf = iyf_(a)
    gcc = jnp.where(m_cc > 0,
                    cadt * inv_az_cc / jnp.where(m_cc > 0, m_cc, 1.0), -1.0)
    gff = jnp.where(m_ff > 0,
                    cadt * inv_az_ff / jnp.where(m_ff > 0, m_ff, 1.0), -1.0)
    ok_u = m_fc > 0
    invm_u = jnp.where(ok_u, 1.0 / jnp.where(ok_u, m_fc, 1.0), 0.0)
    ok_v = m_cf > 0
    invm_v = jnp.where(ok_v, 1.0 / jnp.where(ok_v, m_cf, 1.0), 0.0)
    drag_u = invm_u * a_fc
    drag_v = invm_v * a_cf
    per_fc = jnp.maximum(solid, sp(solid, 0))     # fields.peripheral_masks
    per_cf = jnp.maximum(solid, sp(solid, 1))
    per_ff = jnp.maximum(per_fc, sp(per_fc, 1))
    act_u = jnp.where((m_fc >= mass_min) & (a_fc >= conc_min)
                      & (per_fc < 0.5), 1.0, 0.0)
    act_v = jnp.where((m_cf >= mass_min) & (a_cf >= conc_min)
                      & (per_cf < 0.5), 1.0, 0.0)
    msk_cc = (1.0 - solid) if immersed else jnp.ones_like(solid)
    msk_ff = 1.0 - per_ff
    if has_drag:
        # immersed_peripheral (f,f) nodes: peripheral ∧ ¬wall-peripheral,
        # with the wall written in tile coordinates (fields.immersed_only_ff)
        wall_ff = jnp.zeros(gx.shape, bool)
        if bounded_x:
            wall_ff = (wall_ff | ((gx <= 0) & (gates_ref[_G_W] > 0))
                       | ((gx >= Nxl) & (gates_ref[_G_E] > 0)))
        if bounded_y:
            if south_on:
                wall_ff = wall_ff | ((gy <= 0) & (gates_ref[_G_S] > 0))
            if not fold:
                wall_ff = wall_ff | ((gy >= Nyl) & (gates_ref[_G_N] > 0))
        imm_ff = (per_ff > 0.5) & ~wall_ff
        Cd = p[_PX_CDRAG]
        wxd = jnp.where(imm_ff, Cd * dx_ff, 0.0) * inv_az_fc
        wyd = jnp.where(imm_ff, Cd * dy_ff, 0.0) * inv_az_cf
        imms_u = wxd
        immn_u = sm(wxd, 1)
        immw_v = wyd
        imme_v = sm(wyd, 0)
    un = c_ref[_C_UN]
    vn = c_ref[_C_VN]
    tau_u_top = c_ref[_C_TAUU]
    tau_v_top = c_ref[_C_TAUV]
    ue = c_ref[_C_UE]
    ve = c_ref[_C_VE]

    if f_plane:
        # f(φ) plane → velocity points, hoisted out of the substep loop
        # (the ℑx/ℑy forms of coriolis.x_f_cross_U/y_f_cross_U)
        f_cc_pl = c_ref[_C_FCOR]
        f_fc = ixf_(f_cc_pl)
        f_cf = iyf_(f_cc_pl)
    else:
        f_fc = f_cor
        f_cf = f_cor

    # loop-invariant external-velocity interpolations (hoisted)
    ve_fc = ixf_yc_(ve)
    ue_cf = ixc_yf_(ue)

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
        # algebra, validation/perf_kernel_surgery.py for the measurement).
        # r5 op diet, all FP identities: eS carried instead of e12 = eS/2
        # (4·(eS/2)² ≡ eS² and 2η·(eS/2) ≡ η·eS — power-of-two scalings are
        # exact); double interpolations fused; the replacement-pressure
        # select resolved statically (pressure_formulation is config, not
        # data).
        d_ff = ixyf_(eD)
        t_ff = ixyf_(eT)
        eSc = ixyc_(eS)
        dd_cc = eD * eD + (eT * eT + eSc * eSc) * e_inv2
        dd_ff = d_ff * d_ff + (t_ff * t_ff + eS * eS) * e_inv2
        rD_cc = jnp.minimum(rsqrt(dd_cc), inv_dmin)
        rD_ff = jnp.minimum(rsqrt(dd_ff), inv_dmin)
        zcc = 0.5 * P * rD_cc
        zff = 0.5 * Pff * rD_ff
        if repl_on:
            Dcc = jnp.maximum(dd_cc * rD_cc, d_min)
            Pr = P * Dcc / (Dcc + d_min)
        else:
            Pr = P
        eta_cc = zcc * e_inv2
        eta_ff = zff * e_inv2
        iso = (zcc - eta_cc) * eD - Pr * 0.5
        s11_t = eta_cc * (eD + eT) + iso
        s22_t = eta_cc * (eD - eT) + iso
        s12_t = eta_ff * eS
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
        # 0.5·a + 0.5·b grouped as 0.5·(a + b): one scale instead of two
        # (exact — the halvings commute with the sum's rounding)
        div_x = (0.5 * (dy_fc * (sD - sp(sD, 0))
                        + (yT - sp(yT, 0)) * inv_dy_fc)
                 + (sm(xS, 1) - xS) * inv_dx_fc) * inv_az_fc
        xT = dx_cc2 * sT
        yS = dy_ff2 * s12m
        div_y = (0.5 * (dx_cf * (sD - sp(sD, 1))
                        - (xT - sp(xT, 1)) * inv_dx_cf)
                 + (sm(yS, 0) - yS) * inv_dy_cf) * inv_az_cf
        return div_x, div_y

    def u_update(u, v, div_x, alpha):
        v_fc = ixf_yc_(v)
        du = ue - u
        dv = ve_fc - v_fc
        speed = jnp.sqrt(du * du + dv * dv)
        imm = (imms_u * u + immn_u * sm(u, 1)) * invm_u if has_drag else 0.0
        Gu = (f_fc * v_fc - tau_u_top * drag_u + rC * speed * ue * drag_u
              + div_x * invm_u - imm
              + (un - u) * inv_dt)
        Gu = jnp.where(invm_u > 0, Gu, 0.0)
        idtau = ixf_(alpha) * inv_dt
        u_new = (u * idtau + Gu) / (idtau + rC * speed * drag_u) * act_u
        return fill_fc(u_new)

    def v_update(u, v, div_y, alpha):
        u_cf = ixc_yf_(u)
        dv = ve - v
        du = ue_cf - u_cf
        speed = jnp.sqrt(du * du + dv * dv)
        imm = (immw_v * v + imme_v * sm(v, 0)) * invm_v if has_drag else 0.0
        Gv = (-f_cf * u_cf - tau_v_top * drag_v + rC * speed * ve * drag_v
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

    init = (fill_fc(k_ref[0]), fill_cf(k_ref[1]),
            k_ref[2], k_ref[3], k_ref[4], k_ref[5])
    carry = lax.fori_loop(0, K // 2, pair, init)
    if K % 2:
        carry = one(carry, first_even)
    u, v, s11, s22, s12, alpha = carry

    sx = slice(Wx, Wx + TX)
    sy = slice(oy, oy + ty_out)
    o_ref[0] = u[sx, sy]
    o_ref[1] = v[sx, sy]
    o_ref[2] = s11[sx, sy]
    o_ref[3] = s22[sx, sy]
    o_ref[4] = s12[sx, sy]
    o_ref[5] = alpha[sx, sy]


# --- input preparation ----------------------------------------------------------

def _prepare_tiled_inputs(model, state, dt, u_start, v_start):
    """Lean v2 prepare: the extended params vector and the 21 const planes
    [12 raw metrics | h, ℵ, solid, uⁿ, vⁿ, τu, τv, uₑ, vₑ].

    Reuses `_prepare_curvilinear_inputs` for the params vector, the raw
    metric block and the fold-sign-filled external stresses (whose τ/uₑ/vₑ
    arrays already carry the Zipper sign flip on folded grids — required for
    exact fold-halo self-evolution); every coefficient const it also builds
    is dead code under jit — the kernel derives them in VMEM."""
    from .pallas_evp_curvilinear import _prepare_curvilinear_inputs

    dyn = model.dynamics
    rheo = dyn.rheology
    params, consts, carry_in, _, has_drag = _prepare_curvilinear_inputs(
        model, state, dt, u_start, v_start)
    mets = consts[:12]
    tau_u, tau_v, ue, ve = consts[-4:]
    solid = model.masks.solid_full
    solid = (jnp.zeros(model.grid.shape, jnp.float32) if solid is None
             else jnp.asarray(solid).astype(jnp.float32))
    Cd = dyn.immersed_drag.coefficient if has_drag else 0.0
    params = jnp.concatenate([params, jnp.stack([
        jnp.asarray(model.sea_ice_density, jnp.float32),
        jnp.asarray(rheo.ice_compressive_strength, jnp.float32),
        jnp.asarray(rheo.ice_compaction_hardening, jnp.float32),
        jnp.asarray(Cd, jnp.float32)])])
    planes = mets + [jnp.asarray(state.h, jnp.float32),
                     jnp.asarray(state.a, jnp.float32), solid,
                     u_start, v_start, tau_u, tau_v, ue, ve]
    from .coriolis import LatitudeCoriolis, coriolis_f_cc
    f_plane = isinstance(dyn.coriolis, LatitudeCoriolis)
    if f_plane:
        # f(φ) as one more const plane; fold/halo images are pointwise in
        # the grid's lat_cc images, so halos are automatically exact — the
        # kernel interpolates to (f,c)/(c,f) with the same ℑx/ℑy forms as
        # coriolis.x_f_cross_U/y_f_cross_U
        planes.append(jnp.asarray(
            coriolis_f_cc(dyn.coriolis, model.grid), jnp.float32))
    return params, planes, carry_in, has_drag, f_plane


def _p_kernel(params_ref, h_ref, a_ref, o_ref):
    o_ref[:] = (params_ref[0] * h_ref[:]
                * jnp.exp(-params_ref[1] * (1.0 - a_ref[:])))


def _fixed_tile_P(model, h, a, fixed, interpret):
    """Ice strength on pinned (TX, TY) Pallas tiles: the per-point exp/mul
    sequence is compiled once per tile shape, so the returned P (a state
    field the caller hands back to the update dict) is bitwise
    decomposition-invariant — the surviving sliver of the old fixed-tile
    prepare pass (everything else moved into the main kernel)."""
    grid = model.grid
    rheo = model.dynamics.rheology
    TX, TY = fixed
    nxp, nyp = grid.nxp, grid.nyp
    ntx, nty = -(-nxp // TX), -(-nyp // TY)
    params = jnp.stack([
        jnp.asarray(rheo.ice_compressive_strength, jnp.float32),
        jnp.asarray(rheo.ice_compaction_hardening, jnp.float32)])
    pad = ((0, ntx * TX - nxp), (0, nty * TY - nyp))
    hp = jnp.pad(jnp.asarray(h, jnp.float32), pad, mode="edge")
    ap = jnp.pad(jnp.asarray(a, jnp.float32), pad, mode="edge")
    blk = pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _p_kernel,
        grid=(ntx, nty),
        out_shape=jax.ShapeDtypeStruct((ntx * TX, nty * TY), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk] * 2,
        out_specs=blk,
        interpret=interpret,
        **vmem_compiler_params(interpret),
    )(params, hp, ap)
    return out[:nxp, :nyp]


def _tile_indices(ext, n_int, H, n_tiles, T, W, wrap, offset=0):
    """Carried-array gather indices + interior coordinates for all tiles
    along one dimension.  ``wrap``: periodic-unmeshed dims wrap into the
    interior; others clamp at the carried-array edge.  ``offset``: first
    covered index (the solid-row crop's y_lo; 0 = cover from the edge)."""
    idx, coords = [], []
    for i in range(n_tiles):
        r = np.arange(offset + i * T - W, offset + i * T + T + W)
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
    cs = _solid_crop_rows(model)
    if fixed is not None:
        plan = _fixed_plan(grid0, nsub, fixed, mult, widen_fold=widen)
    else:
        plan = _plan_tiles(grid0, nsub, mult, widen_fold=widen, cs=cs)
    if plan is None:
        raise ValueError("tiled curvilinear EVP: no tile plan fits VMEM")
    K, TX, TY, Wx, Wy = plan
    n_chunks = nsub // K

    state0, u0, v0 = state, u_start, v_start
    crop_back = None
    if widen and grid0.Hy < 2 * K + 5:
        model, state, u_start, v_start, crop_back = _widen_folded(
            model, state, u_start, v_start, K)
    grid = model.grid
    Hx, Hy, Nx, Ny = grid.Hx, grid.Hy, grid.Nx, grid.Ny
    nxp, nyp = grid.nxp, grid.nyp
    y_lo = _crop_y_lo(Hy, cs)

    ntx, nty = -(-nxp // TX), -(-(nyp - y_lo) // TY)
    bx, by = TX + 2 * Wx, TY + 2 * Wy

    params, planes, carry_in, has_drag, f_plane = _prepare_tiled_inputs(
        model, state, dt, u_start, v_start)
    immersed = model.masks.solid_cc is not None
    n_planes = len(planes)

    wrap_x = grid.topology[0] == PERIODIC and not _meshed(grid, 0)
    wrap_y = grid.topology[1] == PERIODIC and not _meshed(grid, 1)
    idx_x, _ = _tile_indices(nxp, Nx, Hx, ntx, TX, Wx, wrap_x)
    idx_y, _ = _tile_indices(nyp, Ny, Hy, nty, TY, Wy, wrap_y, offset=y_lo)

    def slab3(q):
        # The overlapped-tile gather as slices+concats (see
        # pallas_evp_tiled.gather_as_slices): a general take() at this size
        # compiled to a gather costing ~1.3 ms/chunk — the dominant
        # per-chunk fixed cost (why K=8's lower redundancy lost to K=12).
        from .pallas_evp_tiled import gather_as_slices
        q = gather_as_slices(q, idx_x, 1)
        return gather_as_slices(q, idx_y, 2)

    consts3 = slab3(jnp.stack(planes))

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

    south_on = (y_lo - Wy - Hy) < 1   # some tile still sees a gy <= 0 row
    edge_offsets = (Wx + Hx,
                    Wx + Hx + Nx - 1 - (ntx - 1) * TX,
                    Wy + Hy - y_lo,
                    Wy + Hy + Ny - 1 - (nty - 1) * TY - y_lo)
    make_fillers = _make_fillers(grid, TX, Wx, TY, Wy, edge_offsets,
                                 south_on=south_on)
    geom = (TX, TY, Wx, Wy, Hx, Hy, Nx, Ny,
            grid.topology[0] == BOUNDED, grid.topology[1] == BOUNDED,
            grid.north_fold, y_lo, south_on, Wy, TY)
    xs = jnp.asarray(np.arange(ntx) * TX, jnp.int32)

    blk_c = pl.BlockSpec((n_planes, bx, by), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
    blk_k = pl.BlockSpec((6, bx, by), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
    blk_o = pl.BlockSpec((6, TX, TY), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
    out_rows, out_cols = ntx * TX, nty * TY

    repl_on = model.dynamics.rheology.pressure_formulation == "replacement"

    if y_lo:
        # The cropped rows' kernel outputs are known constants (see
        # _solid_crop_rows): u = v = 0, σ = its carry value (frozen on
        # solid rows in every chunk, so = the step's incoming σ), α = a_max.
        zs = jnp.zeros((nxp, y_lo), jnp.float32)
        south = (zs, zs,
                 jnp.asarray(carry_in[2])[:, :y_lo],
                 jnp.asarray(carry_in[3])[:, :y_lo],
                 jnp.asarray(carry_in[4])[:, :y_lo],
                 jnp.full((nxp, y_lo), params[_P_AMAX], jnp.float32))

    def run_chunk(base_even, carry):
        kernel = functools.partial(_tiled_curv_kernel, K, base_even,
                                   make_fillers, has_drag, immersed,
                                   f_plane, repl_on, geom)
        carry3 = slab3(jnp.stack(carry))
        out = pl.pallas_call(
            kernel,
            grid=(ntx, nty),
            out_shape=jax.ShapeDtypeStruct((6, out_rows, out_cols),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [blk_c, blk_k],
            out_specs=blk_o,
            interpret=interpret,
            **vmem_compiler_params(interpret),
        )(params, gates, xs, consts3, carry3)
        if not y_lo:
            return tuple(out[k, :nxp, :nyp] for k in range(6))
        return tuple(
            jnp.concatenate([south[k], out[k, :nxp, :nyp - y_lo]], 1)
            for k in range(6))

    def refill(carry):
        """Re-impose fold/wall halos between exchange-free chunks with the
        *local* fills (the communication-avoiding σ/velocity refresh; only
        folded grids evolve halo data the in-kernel fills can't rebuild).
        An x-meshed fold cannot be refreshed locally at all — there the wide
        y-halo (≥ 2·substeps+3, availability-gated) lets the fold halo
        self-evolve across every chunk with no refresh."""
        if not grid.north_fold or _meshed(grid, 0):
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

    if fixed is not None:
        # decomposition-invariant P (pointwise in fold-consistent h, ℵ, on
        # pinned tiles — Mosaic-compiled identically for every shard shape)
        P = _fixed_tile_P(model, state.h, state.a, fixed, interpret)
    else:
        # exactly as the jnp path computes it, on the original padding
        from .rheologies import ice_strength
        P = ice_strength(model.dynamics.rheology, state0.h, state0.a)

    if crop_back is not None:
        gout = grid0
        u = crop_back(u, ("f", "c"))
        v = crop_back(v, ("c", "f"))
        s11 = crop_back(s11, ("c", "c"))
        s22 = crop_back(s22, ("c", "c"))
        s12 = crop_back(s12, ("f", "f"))
        alpha = fill_halos_cc_local(crop_back(alpha, ("c", "c")), grid0)
        if fixed is not None:
            # pointwise in fold-consistent h, ℵ: the local cc fill rebuilds
            # exact halos on the original padding
            P = fill_halos_cc_local(crop_back(P, ("c", "c")), grid0)
    else:
        gout = grid

    if gout.north_fold and _meshed(gout, 0):
        # post-loop u/v fold refresh needs the cross-shard gather (the local
        # fill would raise); one exchange after the loop keeps the
        # communication-avoiding contract for the substeps themselves
        from ..fields import fill_halos_uv
        u, v = fill_halos_uv(u, v, gout)
    else:
        u = fill_halos_fc_local(u, gout)
        v = fill_halos_cf_local(v, gout)
    s11 = fill_halos_cc(s11, gout)
    s22 = fill_halos_cc(s22, gout)
    s12 = fill_halos_ff(s12, gout)

    return dict(u=u, v=v, sig11=s11, sig22=s22, sig12=s12, alpha=alpha,
                P=P, un=u0, vn=v0,
                Delta=state0.Delta, zeta_cc=state0.zeta_cc,
                zeta_ff=state0.zeta_ff)
