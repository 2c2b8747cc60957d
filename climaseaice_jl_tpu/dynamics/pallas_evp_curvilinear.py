"""Curvilinear fused Pallas EVP kernel: whole substep loop VMEM-resident on
grids with spatially varying metrics (LatitudeLongitude, Curvilinear,
Tripolar incl. the Zipper north fold).

The padded-array kernel (pallas_evp_padded.py) assumes uniform rectilinear
metrics, reducing the strain rates and the stress divergence to plain
differences scaled by two scalars.  On the grids the flagship arctic-basin
workload actually runs on (SURVEY §2.3; reference `TripolarGrid`), those
reductions do not hold: this kernel carries the 8 staggered metric arrays
(+4 inverse areas) as VMEM constants and evaluates the *full* SBP
divergence/tension/shear invariant forms of `rheologies.py:36-47,202-231`
(reference `elasto_visco_plastic_rheology.jl:360-375`,
`ice_stress_divergence.jl:36-51`) inside the substep loop.

The tripolar Zipper fold (`_fill_y_fold`, fields.py:157-187) is re-imposed
on u and v inside the kernel after every half-update — the x-reversal is a
`lax.rev` on the sublane axis (supported by Mosaic), followed by the
periodic-x re-pad and a lane-axis reversal of the source columns.  σ fields
are not fold-filled during the loop, exactly like the jnp path (their halo
rows are *computed* from fold-filled velocities).

Eligibility requires periodic x (every global lat-lon/tripolar grid) and a
single device; distributed curvilinear runs stay on the jnp path.
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
from .rheologies import ElastoViscoPlasticRheology, ice_strength
from .stresses import SemiImplicitStress, StressFunction

_VMEM_BUDGET = (VMEM_LIMIT_MB - 6) * 2 ** 20
# Affine Mosaic occupancy: the padded kernel's 34 (46 with drag) plus the 12
# metric const blocks (double-buffered) and the strain/divergence temporaries
# the uniform-metric kernel didn't need.
_MULT = 110
_MULT_DRAG = 130   # measured 120·array at (586, 490) with ImmersedDrag
                   # (142.03M scoped incl. 85.95M register spill), r3


def curvilinear_fused_available(model):
    """Eligibility: array-metric grids (latlon/curvilinear/tripolar, or a
    rectilinear grid with a north fold), periodic x, f32, serial, and the
    same stress/coriolis envelope as the padded kernel."""
    from .momentum import SplitExplicitSolver, ImmersedDrag
    from .coriolis import FPlane

    grid = model.grid
    dyn = model.dynamics
    if dyn is None or not isinstance(dyn.rheology, ElastoViscoPlasticRheology):
        return False
    if not isinstance(dyn.solver, SplitExplicitSolver):
        return False
    if grid.kind == "rectilinear" and not grid.north_fold:
        return False  # the rectilinear tiers are cheaper
    if grid.mesh_axes is not None:
        return False  # distributed curvilinear: jnp path
    if getattr(dyn.solver, "fixed_tiles", None) is not None:
        return False  # bitwise mode: the whole-array block shape is the
        # padded shape, which differs serial vs shard — the tiled tier
        # pins the Mosaic compilation instead
    if grid.topology[0] != PERIODIC or grid.topology[1] not in (PERIODIC, BOUNDED):
        return False
    if grid.north_fold and grid.topology[1] != BOUNDED:
        return False
    if grid.Hx == 0 or grid.Hy == 0:
        return False
    if grid.np_dtype != np.dtype("float32"):
        return False
    if dyn.immersed_drag is not None and not isinstance(dyn.immersed_drag,
                                                        ImmersedDrag):
        return False
    drag_on = dyn.immersed_drag is not None and grid.solid_cc is not None
    mult = _MULT_DRAG if drag_on else _MULT
    fold_bytes = 4 * 2 * grid.nxp * grid.nxp * 4 if grid.north_fold else 0
    if mult * grid.nxp * grid.nyp * 4 + fold_bytes > _VMEM_BUDGET:
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


def _fold_permutations(grid):
    """One-hot (nxp, nxp) f32 matrices implementing ``q[fold_src, :]``
    (fields._x_fold_indices) as an MXU matmul — Mosaic has no `rev`/gather
    lowering, but a permutation matmul at HIGHEST precision is *exact* in
    f32 (each output row is 1·x plus true zeros)."""
    from ..fields import _x_fold_indices
    nxp = grid.nxp
    Pf = np.zeros((nxp, nxp), np.float32)
    Pc = np.zeros((nxp, nxp), np.float32)
    Pf[np.arange(nxp), _x_fold_indices(grid, True)] = 1.0
    Pc[np.arange(nxp), _x_fold_indices(grid, False)] = 1.0
    return Pf, Pc


def _make_fillers_folded(grid):
    """In-kernel halo fill closure factory for (f,c)/(c,f) fields with
    periodic x and bounded-or-periodic y, plus the Zipper fold on the north
    edge (mirrors fields._fill_x/_fill_y/_maybe_fold on values).

    Returns ``make(Pface, Pcenter) -> (fill_fc, fill_cf)`` so the fold
    permutation matrices can be bound to kernel refs (``None`` off-fold)."""
    Hx, Nx = grid.Hx, grid.Nx
    Hy, Ny = grid.Hy, grid.Ny
    TY = grid.topology[1]
    fold = grid.north_fold

    def fill_x(q):
        return jnp.concatenate([q[Nx:Nx + Hx], q[Hx:Hx + Nx], q[Hx:2 * Hx]], 0)

    def rev_cols(r, cols):
        """Columns ``cols`` of r in the given (descending) static order —
        per-column concat, since Mosaic has no lane-reversal primitive
        (Hy ≤ a few, so this is a handful of slices)."""
        return jnp.concatenate([r[:, c:c + 1] for c in cols], 1)

    def make(Pface, Pcenter):
        def fold_rows(q, xface, sign):
            P = Pface if xface else Pcenter
            return sign * jax.lax.dot(P, q,
                                      precision=lax.Precision.HIGHEST)

        def fill_y_center(q, sign):
            """y fill for y-center fields (u at (f,c)): south per topology,
            north fold (halo col Hy+Ny+k ← mirrored col Hy+Ny−1−k)."""
            if TY == PERIODIC:
                return jnp.concatenate([q[:, Ny:Ny + Hy], q[:, Hy:Hy + Ny],
                                        q[:, Hy:2 * Hy]], 1)
            south = jnp.broadcast_to(q[:, Hy:Hy + 1], (q.shape[0], Hy))
            if not fold:
                north = jnp.broadcast_to(q[:, Hy + Ny - 1:Hy + Ny],
                                         (q.shape[0], Hy))
                return jnp.concatenate([south, q[:, Hy:Hy + Ny], north], 1)
            r = fold_rows(q, xface=True, sign=sign)
            north = rev_cols(r, [Hy + Ny - 1 - k for k in range(Hy)])
            return jnp.concatenate([south, q[:, Hy:Hy + Ny], north], 1)

        def fill_y_face(q, sign):
            """y fill for y-face fields (v at (c,f)): the fold projects the
            seam row Hy+Ny onto its own mirror and mirrors the rows beyond."""
            if TY == PERIODIC:
                return jnp.concatenate([q[:, Ny:Ny + Hy], q[:, Hy:Hy + Ny],
                                        q[:, Hy:2 * Hy]], 1)
            zeros_s = jnp.zeros_like(q[:, :Hy])
            if not fold:
                zeros_n = jnp.zeros_like(q[:, Hy + Ny + 1:])
                return jnp.concatenate([zeros_s, q[:, Hy:Hy + Ny + 1],
                                        zeros_n], 1)
            r = fold_rows(q, xface=False, sign=sign)
            seam = 0.5 * (q[:, Hy + Ny:Hy + Ny + 1] + r[:, Hy + Ny:Hy + Ny + 1])
            parts = [zeros_s, q[:, Hy:Hy + Ny], seam]
            if Hy > 1:
                parts.append(rev_cols(r, [Hy + Ny - k for k in range(1, Hy)]))
            return jnp.concatenate(parts, 1)

        def fill_fc(q):
            return fill_y_center(fill_x(q), sign=-1.0)

        def fill_cf(q):
            return fill_y_face(fill_x(q), sign=-1.0)

        return fill_fc, fill_cf

    return make


def _curvilinear_kernel(nsub, make_fillers, has_fold, has_drag, repl_on,
                        params_ref,
                        *refs):
    if has_fold:
        pface_ref, pcenter_ref = refs[:2]
        fill_fc, fill_cf = make_fillers(pface_ref[:], pcenter_ref[:])
        refs = refs[2:]
    else:
        fill_fc, fill_cf = make_fillers(None, None)
    (dxcc_ref, dxfc_ref, dxcf_ref, dxff_ref,
     dycc_ref, dyfc_ref, dycf_ref, dyff_ref,
     iazcc_ref, iazfc_ref, iazcf_ref, iazff_ref) = refs[:12]
    (P_ref, Pff_ref, gcc_ref, gff_ref,
     drag_u_ref, invm_u_ref, act_u_ref, un_ref,
     drag_v_ref, invm_v_ref, act_v_ref, vn_ref,
     mcc_ref, mff_ref) = refs[12:26]
    if has_drag:
        immsu_ref, immnu_ref, immwv_ref, immev_ref = refs[26:30]
        rest = refs[30:]
    else:
        rest = refs[26:]
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

    # metric constants + their loop-invariant derived forms (computed once,
    # live in VMEM across all substeps)
    dx_cf = dxcf_ref[:]
    dy_fc = dyfc_ref[:]
    inv_az_cc = iazcc_ref[:]
    inv_az_fc = iazfc_ref[:]
    inv_az_cf = iazcf_ref[:]
    inv_az_ff = iazff_ref[:]
    dy_cc2 = dycc_ref[:] ** 2
    dx_cc2 = dxcc_ref[:] ** 2
    dx_ff2 = dxff_ref[:] ** 2
    dy_ff2 = dyff_ref[:] ** 2
    inv_dy_fc = 1.0 / dy_fc
    inv_dx_cf = 1.0 / dx_cf
    inv_dx_fc = 1.0 / dxfc_ref[:]
    inv_dy_cf = 1.0 / dycf_ref[:]

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

    # transcendental-lean scalar forms (see pallas_evp._evp_kernel)
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
        # SBP strain rates (`rheologies.py:36-47`):
        #   ϵ̇D = [δx(Δy_fc·u) + δy(Δx_cf·v)] / Az_cc
        #   ϵ̇T = [Δy_cc² δx(u/Δy_fc) − Δx_cc² δy(v/Δx_cf)] / Az_cc
        #   ϵ̇S = [Δx_ff² δy(u/Δx_fc) + Δy_ff² δx(v/Δy_cf)] / Az_ff
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
        # r5 op diet (FP identities, see pallas_evp._evp_kernel)
        d_ff = ixyf_(eD)
        t_ff = ixyf_(eT)
        eSc = ixyc_(eS)
        dd_cc = eD * eD + (eT * eT + eSc * eSc) * e_inv2
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
        iso = (zcc - eta_cc) * eD - Prh
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
        # SBP stress divergence (`rheologies.py:202-231`,
        # `ice_stress_divergence.jl:36-51`), hoisted across the u/v
        # half-updates of one substep like the jnp path
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

    def v_update(u, v, div_y, alpha):
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

    # Substeps run in odd/even pairs with the Oceananigans-alternating update
    # order (odd substep: v then u; even: u then v) statically unrolled —
    # bit-identical to the per-substep `lax.cond` dispatch it replaces, but
    # branch-free inside the hot loop (see pallas_evp.py).
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

    def pair(j, carry):
        return one(one(carry, False), True)

    init = (fill_fc(u_ref[:]), fill_cf(v_ref[:]),
            s11_ref[:], s22_ref[:], s12_ref[:], al_ref[:])
    carry = lax.fori_loop(0, nsub // 2, pair, init)
    if nsub % 2:  # trailing odd substep
        carry = one(carry, False)
    u, v, s11, s22, s12, alpha = carry

    o_u_ref[:] = u
    o_v_ref[:] = v
    o_s11_ref[:] = s11
    o_s22_ref[:] = s22
    o_s12_ref[:] = s12
    o_al_ref[:] = alpha


def _prepare_curvilinear_inputs(model, state, dt, u_start, v_start):
    """Params + const arrays: the padded kernel's set, with array-valued
    Az in γ and the 12 metric blocks prepended."""
    from ..ops import ixf, iyf, ixy_ff, shift_m

    grid = model.grid
    dyn = model.dynamics
    rheo = dyn.rheology
    dt = jnp.asarray(dt, jnp.float32)
    masks = model.masks

    h, a = state.h, state.a
    rho = jnp.asarray(model.sea_ice_density, jnp.float32)

    def met(name):
        return jnp.broadcast_to(
            jnp.asarray(getattr(grid, name), jnp.float32), grid.shape)

    az_cc, az_fc, az_cf, az_ff = met("az_cc"), met("az_fc"), met("az_cf"), met("az_ff")
    metric_consts = [met("dx_cc"), met("dx_fc"), met("dx_cf"), met("dx_ff"),
                     met("dy_cc"), met("dy_fc"), met("dy_cf"), met("dy_ff"),
                     1.0 / az_cc, 1.0 / az_fc, 1.0 / az_cf, 1.0 / az_ff]

    P = ice_strength(rheo, h, a)
    Pff = ixy_ff(P)
    m_cc = h * a * rho
    m_ff = ixy_ff(m_cc)
    m_fc = ixf(m_cc)
    a_fc = ixf(a)
    m_cf = iyf(m_cc)
    a_cf = iyf(a)

    def inv0(x):
        ok = x > 0
        return jnp.where(ok, 1.0 / jnp.where(ok, x, 1.0), 0.0)

    gcc = jnp.where(m_cc > 0,
                    rheo.relaxation_strength * dt
                    / (jnp.where(m_cc > 0, m_cc, 1.0) * az_cc), -1.0)
    gff = jnp.where(m_ff > 0,
                    rheo.relaxation_strength * dt
                    / (jnp.where(m_ff > 0, m_ff, 1.0) * az_ff), -1.0)

    invm_u = inv0(m_fc)
    drag_u = invm_u * a_fc
    invm_v = inv0(m_cf)
    drag_v = invm_v * a_cf

    act_u = ((m_fc >= dyn.minimum_mass) & (a_fc >= dyn.minimum_concentration)
             ).astype(jnp.float32)
    act_v = ((m_cf >= dyn.minimum_mass) & (a_cf >= dyn.minimum_concentration)
             ).astype(jnp.float32)
    if masks.per_fc is not None:
        act_u = act_u * (~masks.per_fc).astype(jnp.float32)
    if masks.per_cf is not None:
        act_v = act_v * (~masks.per_cf).astype(jnp.float32)

    msk_cc = (jnp.ones(grid.shape, jnp.float32) if masks.solid_cc is None
              else (~masks.solid_cc).astype(jnp.float32))
    msk_ff = (jnp.ones(grid.shape, jnp.float32) if masks.per_ff is None
              else (~masks.per_ff).astype(jnp.float32))

    has_drag = dyn.immersed_drag is not None and masks.imm_ff is not None
    if has_drag:
        C = jnp.asarray(dyn.immersed_drag.coefficient, jnp.float32)
        wx = jnp.where(masks.imm_ff, C * met("dx_ff"), 0.0) / az_fc
        wy = jnp.where(masks.imm_ff, C * met("dy_ff"), 0.0) / az_cf
        imm_consts = [wx, shift_m(wx, 1), wy, shift_m(wy, 0)]
    else:
        imm_consts = []

    from .stresses import _value
    from ..model import make_fields
    fields = make_fields(model, state)

    def _f32(x):
        if isinstance(x, StressFunction):
            x = _value(x, grid, state.clock, fields)
        return jnp.asarray(0.0 if x is None else x, jnp.float32)

    def _arr(x):
        return jnp.broadcast_to(_f32(x), grid.shape)

    def _fold_vec(q, comp):
        # Zipper sign flip on external vector components (see
        # stresses._vec_value; keeps kernel and jnp paths consistent at the
        # seam-adjacent rows whose interps read the first fold-halo row)
        if not (grid.north_fold and grid.Hy > 0):
            return q
        from ..fields import _maybe_fold
        return _maybe_fold(q, grid, comp == "u", comp != "u", -1.0)

    top = dyn.top_momentum_stress
    if isinstance(top, dict):
        tau_u_top, tau_v_top = _arr(top.get("u")), _arr(top.get("v"))
    else:
        tau_u_top = _arr(top)
        tau_v_top = tau_u_top
    tau_u_top = _fold_vec(tau_u_top, "u")
    tau_v_top = _fold_vec(tau_v_top, "v")
    bottom = dyn.bottom_momentum_stress
    if isinstance(bottom, SemiImplicitStress):
        rC = jnp.asarray(bottom.rho_e * bottom.Cd, jnp.float32)
        ue, ve = _fold_vec(_arr(bottom.ue), "u"), _fold_vec(_arr(bottom.ve), "v")
    else:
        rC = jnp.zeros((), jnp.float32)
        ue = ve = jnp.zeros(grid.shape, jnp.float32)
    # scalar f only for FPlane; LatitudeCoriolis (tiled tier) streams an
    # f(φ) const plane instead and ignores this params slot
    from .coriolis import FPlane
    f_cor = _f32(dyn.coriolis.f if isinstance(dyn.coriolis, FPlane) else 0.0)

    one = jnp.ones((), jnp.float32)
    params = jnp.stack([
        dt, one, one, f_cor, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        rC, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        jnp.asarray(rheo.yield_curve_eccentricity, jnp.float32) ** -2.0,
        _f32(rheo.min_relaxation_parameter), _f32(rheo.max_relaxation_parameter),
        _f32(rheo.relaxation_strength), _f32(rheo.minimum_plastic_stress),
        _f32(dyn.minimum_mass), _f32(dyn.minimum_concentration),
        one if rheo.pressure_formulation == "replacement"
        else jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
    ])

    consts = (metric_consts
              + [P, Pff, gcc, gff, drag_u, invm_u, act_u, u_start,
                 drag_v, invm_v, act_v, v_start,
                 msk_cc, msk_ff] + imm_consts
              + [tau_u_top, tau_v_top, ue, ve])
    carry_in = [u_start, v_start, state.sig11, state.sig22, state.sig12,
                state.alpha]
    return params, consts, carry_in, P, has_drag


def curvilinear_fused_momentum_step(model, state, dt, u_start, v_start,
                                    interpret=False):
    """Whole-loop curvilinear fused step; returns the jnp path's update dict."""
    from ..fields import fill_halos_cc, fill_halos_ff

    grid = model.grid
    nsub = model.dynamics.solver.substeps
    params, consts, carry_in, P, has_drag = _prepare_curvilinear_inputs(
        model, state, dt, u_start, v_start)
    if grid.north_fold:
        Pf, Pc = _fold_permutations(grid)
        consts = [jnp.asarray(Pf), jnp.asarray(Pc)] + consts
    kernel = functools.partial(_curvilinear_kernel, nsub,
                               _make_fillers_folded(grid), grid.north_fold,
                               has_drag,
                               model.dynamics.rheology.pressure_formulation
                               == "replacement")

    out_shape = [jax.ShapeDtypeStruct(grid.shape, jnp.float32)] * 6
    n_in = 1 + len(consts) + len(carry_in)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(consts) + len(carry_in)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        input_output_aliases={n_in - 6 + k: k for k in range(6)},
        interpret=interpret,
        **vmem_compiler_params(interpret),
    )(params, *consts, *carry_in)

    u, v, s11, s22, s12, alpha = outs
    s11 = fill_halos_cc(s11, grid)
    s22 = fill_halos_cc(s22, grid)
    s12 = fill_halos_ff(s12, grid)

    return dict(u=u, v=v, sig11=s11, sig22=s22, sig12=s12, alpha=alpha,
                P=P, un=u_start, vn=v_start,
                Delta=state.Delta, zeta_cc=state.zeta_cc, zeta_ff=state.zeta_ff)
