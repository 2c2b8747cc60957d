"""Tiled, substep-chunked padded Pallas EVP kernel: bounded/immersed grids
too large for the whole-array padded kernel (pallas_evp_padded.py).

The slab chunking of pallas_evp_tiled.py applied to the padded-array
kernel: carries are stripped to the interior, each chunk gathers
halo-extended tiles (wrap for periodic dims, clamp for bounded), runs K
substeps in VMEM, and stores the interior rows.  Narrow grids use 1-D
x-slabs spanning the full padded y; wide grids (e.g. 1024² bounded, where a
slab row-set exceeds VMEM) use 2-D tiles with conditional boundary fills in
both dimensions.  Measured at 1024² bounded+immersed on one v5e chip:
9.3M points/s vs 5.5M for the jnp path (redundant-compute ratio ~2.4).  Boundary conditions
are re-imposed *inside* the kernel every substep exactly like the
whole-array kernel, but with `pl.program_id`-gated `where` fills instead of
concatenation (a concat can't be conditional per tile):

* face fields in bounded x: rows outside [Hx, Hx+Nx) are zeroed — the wall
  faces themselves carry u = 0 through the peripheral activity masks, so
  dropping the east-wall face row from the carry is value-preserving;
* center fields in bounded x: halo rows replicate the domain-edge row
  (clamped gathers already produce this at chunk entry; the in-kernel fill
  keeps it true through the K substeps);
* y fills: each slab spans the full padded y extent, so the whole-array
  kernel's concatenation fills apply unchanged.

σ12's bounded-x halo differs from the jnp path (clamp-duplicate vs zero) but
every σ12 read is masked by msk_ff, which is zero on peripheral/halo nodes.
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
from .pallas_evp import (_P_DT, _P_DX, _P_DY, _P_F, _P_RC, _P_EINV2,
                         _P_AMIN, _P_AMAX, _P_DMIN, _P_REPL)
from .pallas_evp import VMEM_LIMIT_MB, vmem_compiler_params
from .pallas_evp_tiled import CHUNK_SUBSTEPS, pick_chunk
from .pallas_evp_padded import _prepare_inputs, padded_fused_available

# Budget against the raised Mosaic scoped-VMEM limit
# (pallas_evp.VMEM_LIMIT_MB; the v5e has 128 MB of VMEM).
_VMEM_BUDGET = (VMEM_LIMIT_MB - 6) * 2 ** 20
# Affine Mosaic occupancy model for one (bx, TYb) block: double-buffered
# 26 input blocks + 6 output blocks + ~25 block-sized temporaries
# (anchor: (56, 1034) slab measured 17.49 MB scoped).  The ImmersedDrag
# variant carries 4 more const blocks + per-face shift temporaries.
# bx coefficients of the affine occupancy model, calibrated on-device from
# Mosaic's own "Used X of 128M vmem" reports (bounded walls-only 1024²,
# K=15): drag-free TX=256 needs 149.5M (≈98·bx) — the old coefficient 77
# admitted it and OOMed at compile.  95 rejects TX=256 and admits TX=192,
# which fits even for the larger drag kernel (measured in the perf sweep).
_ARRAY_MULT = 95       # bx coefficient, drag-free
_ARRAY_MULT_DRAG = 94  # bx coefficient with ImmersedDrag (validated in runs)
WY = 64           # y-overlap for 2-D tiles (lane-aligned, ≥ 2K+3)


def _slab_vmem(bx, TX, TYb, mult):
    return (mult * bx + 12 * TX) * TYb * 4


def _drag_on(model):
    """Static: the kernel will carry the ImmersedDrag consts + temporaries."""
    return (model.dynamics.immersed_drag is not None
            and model.grid.solid_cc is not None)


def _pick_tile_rows(Nx, nyp, K, periodic_x=False, mult=_ARRAY_MULT,
                    require_divide=True):
    """1-D x-slab tiling (slab spans full padded y).  ``require_divide=False``
    (meshed dims) allows ceil-tiling with clamp-gathered overhang."""
    W = 3 * K + 3 if periodic_x else 2 * K + 3
    for TX in (1024, 768, 512, 384, 256, 192, 128, 96, 64, 32, 16, 8):
        if require_divide and Nx % TX:
            continue
        bx = TX + 2 * W
        bx += (-bx) % 8
        if _slab_vmem(bx + 8, TX, nyp, mult) <= _VMEM_BUDGET:
            return TX
    return None


def _pick_tiles_2d(Nx, Ny, K, periodic_x=False, mult=_ARRAY_MULT,
                   require_divide=True):
    """2-D tiling for wide grids: minimize redundant compute over aligned
    divisors under the VMEM budget."""
    Wx = 3 * K + 3 if periodic_x else 2 * K + 3
    best = None
    for TY in (2048, 1536, 1024, 512, 256, 128):
        if Ny % TY or (TY + 2 * WY) % 128:
            continue
        for TX in (1024, 768, 512, 384, 256, 192, 128, 96, 64, 32, 16, 8):
            if require_divide and Nx % TX:
                continue
            bx = TX + 2 * Wx
            bx += (-bx) % 8
            if _slab_vmem(bx + 8, TX, TY + 2 * WY, mult) > _VMEM_BUDGET:
                continue
            ratio = (bx / TX) * ((TY + 2 * WY) / TY)
            if best is None or ratio < best[0]:
                best = (ratio, TX, TY)
            break
    if best is None:
        return None
    return best[1], best[2]


def tiled_padded_available(model):
    """Eligibility: everything `padded_fused_available` requires except the
    whole-array VMEM bound, plus chunkable substeps and a tileable Nx."""
    from .momentum import SplitExplicitSolver, ImmersedDrag
    from .coriolis import FPlane
    from .rheologies import ElastoViscoPlasticRheology
    from .stresses import SemiImplicitStress, StressFunction

    grid = model.grid
    dyn = model.dynamics
    if dyn is None or not isinstance(dyn.rheology, ElastoViscoPlasticRheology):
        return False
    if not isinstance(dyn.solver, SplitExplicitSolver):
        return False
    K = pick_chunk(dyn.solver.substeps)
    if K is None:
        return False
    if grid.kind != "rectilinear" or grid.north_fold:
        return False
    if any(t not in (PERIODIC, BOUNDED) for t in grid.topology):
        return False
    if grid.mesh_axes is not None:
        if dyn.solver.halo_exchange != "wide":
            return False
        from ..fields import _meshed
        if any(_meshed(grid, d) and grid.topology[d] == BOUNDED for d in (0, 1)):
            return False
    if grid.np_dtype != np.dtype("float32"):
        return False
    if dyn.immersed_drag is not None and not isinstance(dyn.immersed_drag,
                                                        ImmersedDrag):
        return False  # general ImmersedStressBC callables: jnp path only
    # HBM bound: gathered const slabs (22 arrays x overlap redundancy)
    # persist across chunks; the 16 GB HBM caps this near 8192^2
    if grid.Nx * grid.Ny > 67_108_864:
        return False
    from ..fields import _meshed
    mx = _meshed(grid, 0)
    px = grid.topology[0] == PERIODIC and not mx
    mult = _ARRAY_MULT_DRAG if _drag_on(model) else _ARRAY_MULT
    fixed = getattr(dyn.solver, "fixed_tiles", None)
    if fixed is not None:
        TXf, TYf = fixed
        Wf = 3 * K + 3          # fixed mode always uses the wide overlap
        bxf = TXf + 2 * Wf
        bxf += (-bxf) % 8
        if not mx and grid.Nx % TXf:
            return False
        if TYf is None:
            if _slab_vmem(bxf + 8, TXf, grid.nyp, mult) > _VMEM_BUDGET:
                return False
        else:
            if not _meshed(grid, 1) and grid.Ny % TYf:
                return False
            if (TYf + 2 * WY) % 128:
                return False
            if _slab_vmem(bxf + 8, TXf, TYf + 2 * WY, mult) > _VMEM_BUDGET:
                return False
    elif (_pick_tile_rows(grid.Nx, grid.nyp, K, px, mult,
                          require_divide=not mx) is None
            and _pick_tiles_2d(grid.Nx, grid.Ny, K, px, mult,
                               require_divide=not mx) is None):
        return False

    def ok_val(x):
        if isinstance(x, StressFunction):
            return True  # evaluated once per momentum step (see padded kernel)
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


def _make_slab_fillers(grid, TX, W, TY, Wy, grow):
    """In-kernel fill closures operating on a halo-extended tile.
    ``grow`` is a callable returning traced (gx, gy) tile-shaped arrays of
    *unclamped* interior coordinates (negative / ≥N in the halo rows/cols of
    edge tiles) — carried as const inputs because `pl.program_id` has no
    CPU-interpret lowering.  ``Wy = 0`` means the tile spans the full padded
    y extent and the whole-array concatenation y-fills apply."""
    from ..fields import _meshed
    Hx, Nx = grid.Hx, grid.Nx
    Hy, Ny = grid.Hy, grid.Ny
    TXx, TYy = grid.topology
    skip_x = _meshed(grid, 0) or TXx == PERIODIC  # wrap gather is exact
    skip_y = _meshed(grid, 1) or (Wy and TYy == PERIODIC)

    def fill_x(q, face):
        if Hx == 0 or skip_x:
            return q
        g = grow()[0]
        if face:
            q = jnp.where((g < 0) | (g >= Nx), 0.0, q)
        else:
            # the wheres trigger only on the first/last tiles, where the
            # domain-edge rows sit at these static local offsets
            q = jnp.where(g < 0, q[W:W + 1], q)
            q = jnp.where(g >= Nx, q[W + TX - 1:W + TX], q)
        return q

    def fill_y(q, face):
        if Hy == 0 or skip_y:
            return q
        if Wy:  # 2-D tile: conditional fills in the y-interior coordinate
            g = grow()[1]
            if face:
                return jnp.where((g < 0) | (g >= Ny), 0.0, q)
            q = jnp.where(g < 0, q[:, Wy:Wy + 1], q)
            q = jnp.where(g >= Ny, q[:, Wy + TY - 1:Wy + TY], q)
            return q
        if TYy == PERIODIC:
            return jnp.concatenate([q[:, Ny:Ny + Hy], q[:, Hy:Hy + Ny],
                                    q[:, Hy:2 * Hy]], 1)
        if face:
            zeros_l = jnp.zeros_like(q[:, :Hy])
            zeros_r = jnp.zeros_like(q[:, Hy + Ny + 1:])
            return jnp.concatenate([zeros_l, q[:, Hy:Hy + Ny + 1], zeros_r], 1)
        left = jnp.broadcast_to(q[:, Hy:Hy + 1], (q.shape[0], Hy))
        right = jnp.broadcast_to(q[:, Hy + Ny - 1:Hy + Ny], (q.shape[0], Hy))
        return jnp.concatenate([left, q[:, Hy:Hy + Ny], right], 1)

    def fill_fc(q):
        return fill_y(fill_x(q, True), False)

    def fill_cf(q):
        return fill_y(fill_x(q, False), True)

    return fill_fc, fill_cf


def _tiled_padded_kernel(K, TX, W, TY, Wy, make_fillers, has_drag, repl_on,
                         base_even,
                         params_ref, gx_ref, gy_ref, *refs):
    """One K-substep chunk on one halo-extended x-slab — the body mirrors
    `pallas_evp_padded._padded_kernel` with the chunk-base parity baked in
    statically (and the same drag-const elision when ``has_drag`` is
    False)."""
    (P_ref, Pff_ref, gcc_ref, gff_ref,
     drag_u_ref, invm_u_ref, act_u_ref, un_ref,
     drag_v_ref, invm_v_ref, act_v_ref, vn_ref,
     mcc_ref, mff_ref) = refs[:14]
    if has_drag:
        immsu_ref, immnu_ref, immwv_ref, immev_ref = refs[14:18]
        rest = refs[18:]
    else:
        rest = refs[14:]
    (tauu_ref, tauv_ref, ue_ref, ve_ref,
     u_ref, v_ref, s11_ref, s22_ref, s12_ref, al_ref,
     o_u_ref, o_v_ref, o_s11_ref, o_s22_ref,
     o_s12_ref, o_al_ref) = rest
    p = params_ref
    dt = p[_P_DT]
    inv_dx = 1.0 / p[_P_DX]
    inv_dy = 1.0 / p[_P_DY]
    f_cor = p[_P_F]
    rC = p[_P_RC]
    e_inv2 = p[_P_EINV2]
    a_min = p[_P_AMIN]
    a_max = p[_P_AMAX]
    d_min = p[_P_DMIN]

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
    fill_fc, fill_cf = make_fillers(lambda: (gx_ref[:], gy_ref[:]))

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

    # Transcendental-lean substep algebra (see pallas_evp._evp_kernel and
    # validation/perf_kernel_surgery.py: ~1.3x, agreement to ulps/substep)
    inv_dt = 1.0 / dt
    inv_dmin = 1.0 / d_min
    amin2 = a_min * a_min
    amax2 = a_max * a_max
    rsqrt = lax.rsqrt
    Ph = 0.5 * P
    Pffh = 0.5 * Pff
    vefc_ = ixf_yc_(ve)
    uecf_ = ixc_yf_(ue)

    def stresses(u, v, s11, s22, s12):
        e11 = (sm(u, 0) - u) * inv_dx
        e22 = (sm(v, 1) - v) * inv_dy
        # r5 op diet (FP identities of the r3 forms): eS = 2*e12 carried
        # (4*(eS/2)^2 == eS^2, 2*eta*(eS/2) == eta*eS), fused double
        # interpolations, hoisted halved strengths, static repl branch.
        eS = (u - sp(u, 1)) * inv_dy + (v - sp(v, 0)) * inv_dx
        d_cc = e11 + e22
        t_cc = e11 - e22
        d_ff = ixyf_(d_cc)
        t_ff = ixyf_(t_cc)
        eSc = ixyc_(eS)
        dd_cc = d_cc * d_cc + (t_cc * t_cc + eSc * eSc) * e_inv2
        dd_ff = d_ff * d_ff + (t_ff * t_ff + eS * eS) * e_inv2
        rD_cc = jnp.minimum(rsqrt(dd_cc), inv_dmin)
        rD_ff = jnp.minimum(rsqrt(dd_ff), inv_dmin)
        zcc = Ph * rD_cc
        zff = Pffh * rD_ff
        if repl_on:
            Dcc = jnp.maximum(dd_cc * rD_cc, d_min)
            Prh = Ph * Dcc / (Dcc + d_min)
        else:
            Prh = Ph
        eta_cc = zcc * e_inv2
        eta_ff = zff * e_inv2
        iso = (zcc - eta_cc) * d_cc - Prh
        s11_t = 2 * eta_cc * e11 + iso
        s22_t = 2 * eta_cc * e22 + iso
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

    def u_update(u, v, s11, s12, alpha):
        s11m = s11 * msk_cc
        s12m = s12 * msk_ff
        div_x = (s11m - sp(s11m, 0)) * inv_dx + (sm(s12m, 1) - s12m) * inv_dy
        v_fc = ixf_yc_(v)
        du = ue - u
        dv = vefc_ - v_fc
        speed = jnp.sqrt(du * du + dv * dv)
        imm = (imms_u * u + immn_u * sm(u, 1)) * invm_u if has_drag else 0.0
        Gu = (f_cor * v_fc - tau_u_top * drag_u + rC * speed * ue * drag_u
              + div_x * invm_u - imm
              + (un - u) * inv_dt)
        Gu = jnp.where(invm_u > 0, Gu, 0.0)
        idtau = ixf_(alpha) * inv_dt
        u_new = (u * idtau + Gu) / (idtau + rC * speed * drag_u) * act_u
        return fill_fc(u_new)

    def v_update(u, v, s22, s12, alpha):
        s22m = s22 * msk_cc
        s12m = s12 * msk_ff
        div_y = (s22m - sp(s22m, 1)) * inv_dy + (sm(s12m, 0) - s12m) * inv_dx
        u_cf = ixc_yf_(u)
        dv = ve - v
        du = uecf_ - u_cf
        speed = jnp.sqrt(du * du + dv * dv)
        imm = (immw_v * v + imme_v * sm(v, 0)) * invm_v if has_drag else 0.0
        Gv = (-f_cor * u_cf - tau_v_top * drag_v + rC * speed * ve * drag_v
              + div_y * invm_v - imm
              + (vn - v) * inv_dt)
        Gv = jnp.where(invm_v > 0, Gv, 0.0)
        idtau = iyf_(alpha) * inv_dt
        v_new = (v * idtau + Gv) / (idtau + rC * speed * drag_v) * act_v
        return fill_cf(v_new)

    def substep_(carry, even):
        u, v, s11, s22, s12, alpha = carry
        s11, s22, s12, alpha = stresses(u, v, s11, s22, s12)
        if even:
            u = u_update(u, v, s11, s12, alpha)
            v = v_update(u, v, s22, s12, alpha)
        else:
            v = v_update(u, v, s22, s12, alpha)
            u = u_update(u, v, s11, s12, alpha)
        return (u, v, s11, s22, s12, alpha)

    # The kernel is compiled per static chunk-base parity (``base_even``), so
    # every substep's Oceananigans-alternating update order (odd substep:
    # v then u; even: u then v) is statically known — run odd/even pairs with
    # the order unrolled, branch-free (bit-identical to the per-substep
    # `lax.cond` dispatch it replaces; measured ~16 % of kernel time).
    # Substep numbers in this chunk are base+1 … base+K, so the first (and,
    # for odd K, the trailing) substep is even iff the base is odd.
    first_even = not base_even

    def pair(j, carry):
        return substep_(substep_(carry, first_even), not first_even)

    init = (fill_fc(u_ref[:]), fill_cf(v_ref[:]),
            s11_ref[:], s22_ref[:], s12_ref[:], al_ref[:])
    carry = lax.fori_loop(0, K // 2, pair, init)
    if K % 2:  # trailing substep of an odd-length chunk
        carry = substep_(carry, first_even)
    u, v, s11, s22, s12, alpha = carry

    sl = slice(W, W + TX)
    sy = slice(Wy, Wy + TY) if Wy else slice(None)
    o_u_ref[:] = u[sl, sy]
    o_v_ref[:] = v[sl, sy]
    o_s11_ref[:] = s11[sl, sy]
    o_s22_ref[:] = s22[sl, sy]
    o_s12_ref[:] = s12[sl, sy]
    o_al_ref[:] = alpha[sl, sy]


def _slab_index(Nx, n_tiles, TX, W, periodic, Hx=0, nxp=None):
    """Slab gather indices.  With ``Hx``/``nxp`` set, indices address the
    *padded* array so halo rows pick up true halo values — essential for the
    masks, whose x-halos are zero, not edge-replicates."""
    rows = []
    for i in range(n_tiles):
        r = np.arange(i * TX - W, i * TX + TX + W)
        if periodic:
            rows.append(Hx + r % Nx)
        elif nxp is None:
            rows.append(np.clip(r, 0, Nx - 1))
        else:
            rows.append(np.clip(r + Hx, 0, nxp - 1))
    return np.concatenate(rows)


def tiled_padded_momentum_step(model, state, dt, u_start, v_start,
                               interpret=False):
    """Substep-chunked padded fused step for large bounded/immersed grids.

    Dispatches between 1-D x-slabs (tile spans full padded y; cheapest when
    ``nyp`` fits) and 2-D tiles with conditional boundary fills in both
    dimensions (wide grids, e.g. 1024²+).

    On mesh-connected dimensions (distributed wide-halo shards) the carried
    extent is the full *padded* extent: the wide halos hold neighbor data
    whose in-loop evolution (validity shrinking ~2 cells/substep, covered by
    Hw = 2·substeps+3) must be computed, not clamp-replicated.  Tiles then
    cover ceil(ext/TX)·TX rows and the overhang is clamp-gathered and
    discarded — the same validity argument as the jnp wide path's local-only
    fills."""
    from ..fields import (fill_halos_cc, fill_halos_fc, fill_halos_cf,
                          fill_halos_ff, _meshed)

    grid = model.grid
    Hx, Nx, Hy, Ny, nyp = grid.Hx, grid.Nx, grid.Hy, grid.Ny, grid.nyp
    nsub = model.dynamics.solver.substeps
    periodic_x = grid.topology[0] == PERIODIC and not _meshed(grid, 0)
    periodic_y = grid.topology[1] == PERIODIC and not _meshed(grid, 1)
    mx, my = _meshed(grid, 0), _meshed(grid, 1)
    x_ext = grid.nxp if mx else Nx       # carried x extent
    mult = _ARRAY_MULT_DRAG if _drag_on(model) else _ARRAY_MULT
    fixed = getattr(model.dynamics.solver, "fixed_tiles", None)
    if fixed is not None:
        K = pick_chunk(nsub)
        TX, TY = fixed
        if TY is None:
            TY, Wy, nty = nyp, 0, 1
        else:
            Wy = WY
            y_ext = nyp if my else Ny
            nty = -(-y_ext // TY) if my else Ny // TY
    else:
        # K, slab, and 2-D layouts all compete on modeled cost =
        # Mosaic-padded redundant-compute ratio × (1 + 4/K) per-chunk
        # overhead — the same calibrated model as
        # pallas_evp_tiled_curvilinear._plan_tiles (round-4 on-chip sweeps:
        # K=12's smaller overlap beats K=15's fewer chunks at production
        # sizes; a full-y slab that only fits at a tiny TX loses to a 2-D
        # tiling with moderate y overlap).
        # ``CSI_TP_PLAN=K,TX,TY`` (TY=0 → full-y slab) overrides the search
        # for on-chip sweeps; correctness is plan-independent.
        import os
        override = os.environ.get("CSI_TP_PLAN")
        if override:
            # Return the override immediately (no search) and validate it
            # against the same divisibility/Mosaic constraints the planner
            # enforces, so a bad override fails loudly instead of silently
            # changing the physics (ADVICE r4).
            K, TX, TY = map(int, override.split(","))
            TY = TY or None
            if nsub % K:
                raise ValueError(
                    f"CSI_TP_PLAN: K={K} does not divide substeps={nsub}")
            if not mx and Nx % TX:
                raise ValueError(
                    f"CSI_TP_PLAN: TX={TX} does not divide Nx={Nx}")
            if TY is not None:
                if not my and Ny % TY:
                    raise ValueError(
                        f"CSI_TP_PLAN: TY={TY} does not divide Ny={Ny}")
                if (TY + 2 * WY) % 128:
                    raise ValueError(
                        f"CSI_TP_PLAN: block TY+2*WY={TY + 2 * WY} violates "
                        "the Mosaic %128 lane rule")
            options = None
        else:
            options = []
        for Kc in ([] if options is None else
                   range(min(CHUNK_SUBSTEPS, nsub), 1, -1)):
            if nsub % Kc:
                continue
            over = 1 + 4.0 / Kc
            Wb = 3 * Kc + 3 if periodic_x else 2 * Kc + 3
            TXs = _pick_tile_rows(Nx, nyp, Kc, periodic_x, mult,
                                  require_divide=not mx)
            if TXs is not None:
                bxs = TXs + 2 * Wb
                bxs += (-bxs) % 8
                # Mosaic pads the lane (y) dimension of each block to a
                # multiple of 128: a full-y slab carries ceil(nyp/128)*128
                # lanes, not nyp (e.g. 1034 -> 1152, +11% hidden work).
                ny_eff = -(-nyp // 128) * 128
                options.append((over * (bxs / TXs) * (ny_eff / Ny),
                                Kc, TXs, None))
            t2 = _pick_tiles_2d(Nx, Ny, Kc, periodic_x, mult,
                                require_divide=not mx)
            if t2 is not None:
                TX2, TY2 = t2
                bx2 = TX2 + 2 * Wb
                bx2 += (-bx2) % 8
                options.append(
                    (over * (bx2 / TX2) * ((TY2 + 2 * WY) / TY2),
                     Kc, TX2, TY2))
        # key on the cost alone: tied costs would otherwise tie-break by
        # comparing TY values, where a slab layout carries TY=None
        if options is not None:
            _, K, TX, TY = min(options, key=lambda o: o[0])
        if TY is None:
            TY, Wy, nty = nyp, 0, 1
        else:
            Wy = WY
            y_ext = nyp if my else Ny
            nty = -(-y_ext // TY) if my else Ny // TY
    n_tiles = -(-x_ext // TX) if mx else Nx // TX
    # fixed-tile mode pins W too: the block shape (hence the Mosaic
    # compilation) must not depend on the local topology flags
    W = 3 * K + 3 if (periodic_x or fixed is not None) else 2 * K + 3
    while (TX + 2 * W) % 8:
        W += 1
    n_chunks = nsub // K

    params, consts, carry_in, P, has_drag = _prepare_inputs(model, state, dt,
                                                            u_start, v_start)

    if mx:
        # carried layout is the padded array itself; gathers clamp at its edge
        idx = idx_pad = _slab_index(x_ext, n_tiles, TX, W, False)
        gx_rows = np.concatenate([np.arange(i * TX - W, i * TX + TX + W)
                                  for i in range(n_tiles)]).astype(np.float32) - Hx
    else:
        idx = _slab_index(Nx, n_tiles, TX, W, periodic_x)
        idx_pad = _slab_index(Nx, n_tiles, TX, W, periodic_x, Hx=Hx,
                              nxp=grid.nxp)
        gx_rows = np.concatenate([np.arange(i * TX - W, i * TX + TX + W)
                                  for i in range(n_tiles)]).astype(np.float32)
    if Wy:
        if my:
            idy = idy_pad = _slab_index(nyp, nty, TY, Wy, False)
            gy_cols = np.concatenate([np.arange(j * TY - Wy, j * TY + TY + Wy)
                                      for j in range(nty)]).astype(np.float32) - Hy
        else:
            idy = _slab_index(Ny, nty, TY, Wy, periodic_y)
            idy_pad = _slab_index(Ny, nty, TY, Wy, periodic_y, Hx=Hy, nxp=nyp)
            gy_cols = np.concatenate([np.arange(j * TY - Wy, j * TY + TY + Wy)
                                      for j in range(nty)]).astype(np.float32)
        ncols = gy_cols.size
    else:
        idy = idy_pad = None
        gy_cols = np.zeros(nyp, np.float32)
        ncols = nyp
    gx = jnp.broadcast_to(jnp.asarray(gx_rows)[:, None], (gx_rows.size, ncols))
    gy = jnp.broadcast_to(jnp.asarray(gy_cols)[None, :], (gx_rows.size, ncols))

    from .pallas_evp_tiled import gather_as_slices

    def slab_int(q):       # carry (carried layout) → tiles
        q = gather_as_slices(q, idx, 0)
        return q if idy is None else gather_as_slices(q, idy, 1)

    def slab_pad(q):       # padded consts → tiles with true halo values
        q = gather_as_slices(q, idx_pad, 0)
        return q if idy_pad is None else gather_as_slices(q, idy_pad, 1)

    def strip(q):          # padded → carried layout
        if not mx:
            q = q[Hx:Hx + Nx]
        if Wy and not my:
            q = q[:, Hy:Hy + Ny]
        return q

    const_slabs = [slab_pad(q) for q in consts]
    carry = tuple(strip(q) for q in carry_in)

    def to_alloc(q):       # overhang-pad so the scan carry is shape-stable
        dx_, dy_ = n_tiles * TX - q.shape[0], (nty * TY if Wy else nyp) - q.shape[1]
        return jnp.pad(q, ((0, dx_), (0, dy_))) if (dx_ or dy_) else q

    carry = tuple(to_alloc(q) for q in carry)

    repl_on = (model.dynamics.rheology.pressure_formulation
               == "replacement")
    make_fillers = functools.partial(_make_slab_fillers, grid, TX, W, TY, Wy)
    bx, by = TX + 2 * W, TY + 2 * Wy
    oy = TY if Wy else nyp
    blk_in = pl.BlockSpec((bx, by), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((TX, oy), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    # allocation may overhang the carried extent on meshed dims (ceil tiles);
    # overhang rows/cols are never gathered and are sliced off at the end
    out_rows, out_cols = n_tiles * TX, (nty * TY if Wy else nyp)
    crop_rows = x_ext
    crop_cols = (nyp if my else Ny) if Wy else nyp

    def run_chunk(base_even, carry):
        kernel = functools.partial(_tiled_padded_kernel, K, TX, W, TY, Wy,
                                   make_fillers, has_drag, repl_on, base_even)
        carry_slabs = [slab_int(q) for q in carry]
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles, nty),
            out_shape=[jax.ShapeDtypeStruct((out_rows, out_cols), jnp.float32)] * 6,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [blk_in] * (2 + len(const_slabs) + len(carry_slabs)),
            out_specs=[blk_out] * 6,
            interpret=interpret,
            **vmem_compiler_params(interpret),
        )(params, gx, gy, *const_slabs, *carry_slabs)
        return tuple(outs)

    # Chunk k covers substeps k·K+1 … (k+1)·K; the kernel bakes the base
    # parity in statically (branch-free substep order).  Even K: every base
    # is even — one kernel, scanned.  Odd K: base parity alternates per
    # chunk — scan even/odd chunk *pairs* (two compiled variants), plus a
    # trailing even-base chunk when the chunk count is odd.
    if K % 2 == 0:
        def chunk(carry, _):
            return run_chunk(True, carry), None

        carry, _ = lax.scan(chunk, carry, None, length=n_chunks)
    else:
        def chunk2(carry, _):
            return run_chunk(False, run_chunk(True, carry)), None

        carry, _ = lax.scan(chunk2, carry, None, length=n_chunks // 2)
        if n_chunks % 2:
            carry = run_chunk(True, carry)
    u, v, s11, s22, s12, alpha = (q[:crop_rows, :crop_cols] for q in carry)

    def repad(q):          # carried layout → padded, halos rebuilt by fills
        if not mx:
            zx = jnp.zeros((Hx, q.shape[1]), jnp.float32)
            q = jnp.concatenate([zx, q, zx], 0)
        if Wy and not my:
            zy = jnp.zeros((q.shape[0], Hy), jnp.float32)
            q = jnp.concatenate([zy, q, zy], 1)
        return q

    u = fill_halos_fc(repad(u), grid)
    v = fill_halos_cf(repad(v), grid)
    s11 = fill_halos_cc(repad(s11), grid)
    s22 = fill_halos_cc(repad(s22), grid)
    s12 = fill_halos_ff(repad(s12), grid)
    alpha = fill_halos_cc(repad(alpha), grid)

    return dict(u=u, v=v, sig11=s11, sig22=s22, sig12=s12, alpha=alpha,
                P=P, un=u_start, vn=v_start,
                Delta=state.Delta, zeta_cc=state.zeta_cc,
                zeta_ff=state.zeta_ff)
