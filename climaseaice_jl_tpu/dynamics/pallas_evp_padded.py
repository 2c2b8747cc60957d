"""Padded-array fused Pallas EVP kernel: bounded topologies + immersed
boundaries, whole substep loop VMEM-resident.

Unlike the interior-only kernel (pallas_evp.py, doubly-periodic via circular
rolls), this variant carries halo-inclusive padded arrays and performs the
halo fills *inside* the kernel after each velocity update — a 1:1 mirror of
the jnp path's `fill_halos_fc/cf` (concatenate fills compile cleanly under
Mosaic).  That unlocks the `ice_advected_by_anticyclone` /
`ice_advected_on_coastline` class of workloads: bounded walls, immersed land
masks, and the linear immersed drag, all fused.

Immersed handling matches the jnp path:
* σ read by the divergence is zeroed at solid cc nodes / peripheral ff nodes
  (conditional-flux analog) via constant masks;
* velocities are killed on peripheral nodes via the activity masks;
* `ImmersedDrag` enters as precomputed geometric coefficients per face:
  the in-kernel term is −(gˢ·u(i,j) + gᴺ·u(i,j+1))·invm_u with
  g = C·1_imm·Δx_ff/Az sampled at each face's own ff index — exactly the jnp
  path / reference discretization (`ice_stress_divergence.jl:65-101`).
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
from .pallas_evp import (_P_DT, _P_DX, _P_DY, _P_F, _P_TAUU, _P_TAUV, _P_RC,
                         _P_UE, _P_VE, _P_EINV2, _P_AMIN, _P_AMAX, _P_CALPHA,
                         _P_DMIN, _P_MASSMIN, _P_CONCMIN, _P_REPL,
                         VMEM_LIMIT_MB, vmem_compiler_params)
from .rheologies import ElastoViscoPlasticRheology, ice_strength
from .stresses import SemiImplicitStress, StressFunction

# Whole-array budget against the raised Mosaic scoped-VMEM limit
# (pallas_evp.VMEM_LIMIT_MB; the v5e has 128 MB of VMEM).
_VMEM_BUDGET = (VMEM_LIMIT_MB - 6) * 2 ** 20


def padded_fused_available(model):
    """Eligibility for the padded fused kernel (complements pallas_evp's
    periodic-only check): uniform rectilinear f32, periodic/bounded sides,
    scalar stresses, FPlane/no coriolis, immersed masks allowed, ImmersedDrag
    allowed, no fold, single device."""
    from .momentum import SplitExplicitSolver, ImmersedDrag
    from .coriolis import FPlane

    grid = model.grid
    dyn = model.dynamics
    if dyn is None or not isinstance(dyn.rheology, ElastoViscoPlasticRheology):
        return False
    if not isinstance(dyn.solver, SplitExplicitSolver):
        return False
    if grid.kind != "rectilinear" or grid.north_fold:
        return False
    if any(t not in (PERIODIC, BOUNDED) for t in grid.topology):
        return False
    # Distributed shards are fused-eligible ONLY in wide-halo mode: the
    # substep loop is exchange-free there, so the kernel's local-only fills
    # match the jnp path exactly (`halo_exchange='wide'`).
    if grid.mesh_axes is not None:
        if dyn.solver.halo_exchange != "wide":
            return False
        # the kernel's static fills can't apply the traced global-edge wall
        # BCs that fill_halos_*_local now refreshes per substep
        from ..fields import _meshed
        if any(_meshed(grid, d) and grid.topology[d] == BOUNDED for d in (0, 1)):
            return False
    if grid.np_dtype != np.dtype("float32"):
        return False
    if dyn.immersed_drag is not None and not isinstance(dyn.immersed_drag,
                                                        ImmersedDrag):
        return False  # general ImmersedStressBC callables: jnp path only
    # Scoped-VMEM eligibility, calibrated against measured compiles: the
    # drag variant adds 4 const arrays + per-face shift temporaries (16.8 MB
    # at 266² → over the 16 MB scoped limit), the drag-free variant matches
    # round-1 occupancy.
    drag_on = dyn.immersed_drag is not None and grid.solid_cc is not None
    mult = 46 if drag_on else 34
    if mult * grid.nxp * grid.nyp * 4 > _VMEM_BUDGET:
        return False

    def ok_val(x):
        if isinstance(x, StressFunction):
            # evaluated once per momentum step at step-start clock/fields —
            # the reference's update_external_stress! semantics
            # (`split_explicit_momentum_equations.jl:133-134`)
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


def _make_fillers(grid):
    """Static in-kernel halo fill closures for (f,c) and (c,f) fields —
    mirrors fields._fill_x/_fill_y on values.  Mesh-split directions are left
    untouched (wide-halo mode: their halos were exchanged once before the
    loop and go stale, exactly like `fill_halos_*_local`)."""
    from ..fields import _meshed
    Hx, Nx = grid.Hx, grid.Nx
    Hy, Ny = grid.Hy, grid.Ny
    TX, TY = grid.topology
    skip_x = _meshed(grid, 0)
    skip_y = _meshed(grid, 1)

    def fill_x(q, face):
        if Hx == 0 or skip_x:
            return q
        if TX == PERIODIC:
            return jnp.concatenate([q[Nx:Nx + Hx], q[Hx:Hx + Nx], q[Hx:2 * Hx]], 0)
        if face:
            zeros_l = jnp.zeros_like(q[:Hx])
            zeros_r = jnp.zeros_like(q[Hx + Nx + 1:])
            return jnp.concatenate([zeros_l, q[Hx:Hx + Nx + 1], zeros_r], 0)
        left = jnp.broadcast_to(q[Hx:Hx + 1], (Hx,) + q.shape[1:])
        right = jnp.broadcast_to(q[Hx + Nx - 1:Hx + Nx], (Hx,) + q.shape[1:])
        return jnp.concatenate([left, q[Hx:Hx + Nx], right], 0)

    def fill_y(q, face):
        if Hy == 0 or skip_y:
            return q
        if TY == PERIODIC:
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


def _padded_kernel(nsub, fill_fc, fill_cf, has_drag, repl_on,
                   params_ref, *refs):
    # The 4 immersed-drag coefficient arrays are inputs ONLY when an
    # ImmersedDrag is configured (`has_drag`): keeping them (and the drag
    # term's shift temporaries) out of the drag-free kernel preserves the
    # scoped-VMEM headroom of periodic/bounded-without-land configs.
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
     o_u_ref, o_v_ref, o_s11_ref, o_s22_ref, o_s12_ref, o_al_ref) = rest
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
    msk_cc = mcc_ref[:]     # 1 where the cc node is fluid (σ11/σ22 valid)
    msk_ff = mff_ref[:]     # 1 where the ff node is non-peripheral (σ12 valid)
    if has_drag:
        imms_u = immsu_ref[:]   # immersed-drag coefficients: south/north faces
        immn_u = immnu_ref[:]   # of the u point, west/east faces of the v point
        immw_v = immwv_ref[:]
        imme_v = immev_ref[:]
    tau_u_top = tauu_ref[:]  # external stresses as (broadcast) arrays
    tau_v_top = tauv_ref[:]
    ue = ue_ref[:]           # ocean velocity at (f,c)
    ve = ve_ref[:]           # ocean velocity at (c,f)

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

    # Substeps run in odd/even pairs with the Oceananigans-alternating
    # update order (odd substep: v then u; even: u then v) statically
    # unrolled — bit-identical to the per-substep `lax.cond` dispatch it
    # replaces, but branch-free inside the hot loop.
    def pair(j, carry):
        u, v, s11, s22, s12, alpha = carry
        s11, s22, s12, alpha = stresses(u, v, s11, s22, s12)  # substep 2j+1
        v = v_update(u, v, s22, s12, alpha)
        u = u_update(u, v, s11, s12, alpha)
        s11, s22, s12, alpha = stresses(u, v, s11, s22, s12)  # substep 2j+2
        u = u_update(u, v, s11, s12, alpha)
        v = v_update(u, v, s22, s12, alpha)
        return (u, v, s11, s22, s12, alpha)

    init = (fill_fc(u_ref[:]), fill_cf(v_ref[:]),
            s11_ref[:], s22_ref[:], s12_ref[:], al_ref[:])
    carry = lax.fori_loop(0, nsub // 2, pair, init)
    if nsub % 2:  # trailing odd substep
        u, v, s11, s22, s12, alpha = carry
        s11, s22, s12, alpha = stresses(u, v, s11, s22, s12)
        v = v_update(u, v, s22, s12, alpha)
        u = u_update(u, v, s11, s12, alpha)
        carry = (u, v, s11, s22, s12, alpha)
    u, v, s11, s22, s12, alpha = carry

    o_u_ref[:] = u
    o_v_ref[:] = v
    o_s11_ref[:] = s11
    o_s22_ref[:] = s22
    o_s12_ref[:] = s12
    o_al_ref[:] = alpha


def _prepare_inputs(model, state, dt, u_start, v_start):
    """Assemble the params vector, 22 const arrays, and 6 carry arrays shared
    by the whole-array and tiled padded kernels."""
    from ..ops import ixf, iyf, ixy_ff

    grid = model.grid
    dyn = model.dynamics
    rheo = dyn.rheology
    dt = jnp.asarray(dt, jnp.float32)
    masks = model.masks

    h, a = state.h, state.a
    rho = jnp.asarray(model.sea_ice_density, jnp.float32)
    dx = jnp.asarray(grid.dx_cc, jnp.float32)
    dy = jnp.asarray(grid.dy_cc, jnp.float32)
    az = dx * dy

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
                    rheo.relaxation_strength * dt / (jnp.where(m_cc > 0, m_cc, 1.0) * az),
                    -1.0)
    gff = jnp.where(m_ff > 0,
                    rheo.relaxation_strength * dt / (jnp.where(m_ff > 0, m_ff, 1.0) * az),
                    -1.0)

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

    # immersed-drag geometric coefficients: the drag term at a u point is
    # −(immS_u·u(i,j) + immN_u·u(i,j+1))/m — flux −C·u sampled at each face's
    # own ff index, gated by the immersed-only peripheral mask
    # (see momentum.velocity_tendencies; `ice_stress_divergence.jl:65-101`)
    has_drag = dyn.immersed_drag is not None and masks.imm_ff is not None
    if has_drag:
        from ..ops import shift_m
        C = jnp.asarray(dyn.immersed_drag.coefficient, jnp.float32)
        dx_ff = jnp.broadcast_to(jnp.asarray(grid.dx_ff, jnp.float32), grid.shape)
        dy_ff = jnp.broadcast_to(jnp.asarray(grid.dy_ff, jnp.float32), grid.shape)
        wx = jnp.where(masks.imm_ff, C * dx_ff, 0.0) / az
        wy = jnp.where(masks.imm_ff, C * dy_ff, 0.0) / az
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

    top = dyn.top_momentum_stress
    if isinstance(top, dict):
        tau_u_top, tau_v_top = _arr(top.get("u")), _arr(top.get("v"))
    else:
        tau_u_top = _arr(top)
        tau_v_top = tau_u_top
    bottom = dyn.bottom_momentum_stress
    if isinstance(bottom, SemiImplicitStress):
        rC = jnp.asarray(bottom.rho_e * bottom.Cd, jnp.float32)
        ue, ve = _arr(bottom.ue), _arr(bottom.ve)
    else:
        rC = jnp.zeros((), jnp.float32)
        ue = ve = jnp.zeros(grid.shape, jnp.float32)
    f_cor = _f32(dyn.coriolis.f if dyn.coriolis is not None else 0.0)

    params = jnp.stack([
        dt, dx, dy, f_cor, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        rC, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        jnp.asarray(rheo.yield_curve_eccentricity, jnp.float32) ** -2.0,
        _f32(rheo.min_relaxation_parameter), _f32(rheo.max_relaxation_parameter),
        _f32(rheo.relaxation_strength), _f32(rheo.minimum_plastic_stress),
        _f32(dyn.minimum_mass), _f32(dyn.minimum_concentration),
        jnp.ones((), jnp.float32) if rheo.pressure_formulation == "replacement"
        else jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
    ])

    # Decomposition-invariant prepare (fixed_tiles mode): XLA fuses this
    # coefficient chain with the surrounding step graph, contracting FMAs
    # shape-dependently (measured ~1e-10 on invm/gff between serial and
    # shard compilations — enough to break the bitwise serial≡distributed
    # contract once the EVP loop amplifies it).  Recompute the mass/strength
    # coefficient block on fixed tiles: Mosaic codegen depends only on the
    # block shape, so the values are identical in every decomposition (same
    # invariant as the fixed-tile EVP kernel itself).
    if getattr(dyn.solver, "fixed_tiles", None) is not None:
        (P, Pff, gcc, gff, drag_u, invm_u, act_u0,
         drag_v, invm_v, act_v0) = _fixed_tile_prepare(model, h, a, dt)
        if masks.per_fc is not None:
            act_u0 = act_u0 * (~masks.per_fc).astype(jnp.float32)
        if masks.per_cf is not None:
            act_v0 = act_v0 * (~masks.per_cf).astype(jnp.float32)
        act_u, act_v = act_u0, act_v0

    consts = ([P, Pff, gcc, gff, drag_u, invm_u, act_u, u_start,
               drag_v, invm_v, act_v, v_start,
               msk_cc, msk_ff] + imm_consts
              + [tau_u_top, tau_v_top, ue, ve])
    carry_in = [u_start, v_start, state.sig11, state.sig22, state.sig12,
                state.alpha]
    return params, consts, carry_in, P, has_drag


def _prep_kernel(params_ref, h_ref, a_ref, *out_refs):
    """Pointwise/interp EVP coefficient block on one fixed tile (the
    decomposition-invariant analog of the jnp chain above; ops and order
    match it exactly)."""
    (oP, oPff, ogcc, ogff, odrag_u, oinvm_u, oact_u,
     odrag_v, oinvm_v, oact_v) = out_refs
    p = params_ref
    rho = p[0]
    Pstar = p[1]
    Chard = p[2]
    cadt = p[3]       # relaxation_strength · Δt
    az = p[4]
    mass_min = p[5]
    conc_min = p[6]

    h = h_ref[:]
    a = a_ref[:]
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

    gcc = jnp.where(m_cc > 0, cadt / (jnp.where(m_cc > 0, m_cc, 1.0) * az), -1.0)
    gff = jnp.where(m_ff > 0, cadt / (jnp.where(m_ff > 0, m_ff, 1.0) * az), -1.0)
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


def _fixed_tile_prepare(model, h, a, dt):
    """Run `_prep_kernel` over fixed (TX, TY) tiles of the padded arrays;
    returns the 10 coefficient arrays on the padded shape."""
    from .pallas_evp_tiled_curvilinear import _tile_indices
    from ..grids import PERIODIC as _PER
    from ..fields import _meshed as _dim_meshed

    grid = model.grid
    dyn = model.dynamics
    rheo = dyn.rheology
    TX, TY = dyn.solver.fixed_tiles
    Wx, Wy = 8, 64
    nxp, nyp = grid.nxp, grid.nyp
    ntx, nty = -(-nxp // TX), -(-nyp // TY)
    bx, by = TX + 2 * Wx, TY + 2 * Wy

    wrap_x = grid.topology[0] == _PER and not _dim_meshed(grid, 0)
    wrap_y = grid.topology[1] == _PER and not _dim_meshed(grid, 1)
    idx_x, _ = _tile_indices(nxp, grid.Nx, grid.Hx, ntx, TX, Wx, wrap_x)
    idx_y, _ = _tile_indices(nyp, grid.Ny, grid.Hy, nty, TY, Wy, wrap_y)

    def slab(q):
        return q[idx_x][:, idx_y]

    dx = jnp.asarray(grid.dx_cc, jnp.float32)
    dy = jnp.asarray(grid.dy_cc, jnp.float32)
    params = jnp.stack([
        jnp.asarray(model.sea_ice_density, jnp.float32),
        jnp.asarray(rheo.ice_compressive_strength, jnp.float32),
        jnp.asarray(rheo.ice_compaction_hardening, jnp.float32),
        jnp.asarray(rheo.relaxation_strength, jnp.float32)
        * jnp.asarray(dt, jnp.float32),
        dx * dy,
        jnp.asarray(dyn.minimum_mass, jnp.float32),
        jnp.asarray(dyn.minimum_concentration, jnp.float32)])

    blk_in = pl.BlockSpec((bx, by), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    interpret = not on_tpu
    outs = pl.pallas_call(
        _prep_kernel,
        grid=(ntx, nty),
        out_shape=[jax.ShapeDtypeStruct((ntx * TX, nty * TY),
                                        jnp.float32)] * 10,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk_in] * 2,
        out_specs=[blk_out] * 10,
        interpret=interpret,
        **vmem_compiler_params(interpret),
    )(params, slab(h), slab(a))
    return tuple(q[:nxp, :nyp] for q in outs)


def padded_fused_momentum_step(model, state, dt, u_start, v_start,
                               interpret=False):
    """Whole-loop padded fused step; returns the jnp path's update dict."""
    from ..fields import fill_halos_cc, fill_halos_ff

    grid = model.grid
    nsub = model.dynamics.solver.substeps
    params, consts, carry_in, P, has_drag = _prepare_inputs(model, state, dt,
                                                            u_start, v_start)
    fill_fc, fill_cf = _make_fillers(grid)
    kernel = functools.partial(
        _padded_kernel, nsub, fill_fc, fill_cf, has_drag,
        model.dynamics.rheology.pressure_formulation == "replacement")

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
