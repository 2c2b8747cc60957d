"""Fused Pallas TPU kernel for the split-explicit αEVP substep loop.

The reference's hot loop is ~2·substeps tiny kernel launches per outer step
(`split_explicit_momentum_equations.jl:150-189`); the jnp path already fuses
each substep, but every substep still round-trips ~20 arrays through HBM.
This kernel keeps the whole EVP state (u, v, σ₁₁, σ₂₂, σ₁₂, α) *resident in
VMEM across all substeps* — HBM is touched exactly twice (load constants +
initial state, store final state), making the loop compute-bound instead of
bandwidth-bound (SURVEY.md §7 "hard parts" #1).

Supported fast-path configuration (checked by :func:`fused_available`):
uniform rectilinear doubly-periodic grid (shifts are exact `pltpu.roll`
circular shifts on interior-only arrays — no halos at all), float32, αEVP
rheology, FPlane/no coriolis, scalar (or zero) top stress, SemiImplicitStress
bottom stress with scalar external velocities, no free drift, no user
forcing, single device.  Everything else falls back to the general jnp path.

Uniform-metric simplifications used (algebraically exact on uniform grids):

    ϵ̇₁₁ = δxᶜu/Δx          ϵ̇₂₂ = δyᶜv/Δy       ϵ̇₁₂ = (δyᶠu/Δy + δxᶠv/Δx)/2
    ∂ⱼσ₁ⱼ = δxᶠσ₁₁/Δx + δyᶜσ₁₂/Δy
    ∂ⱼσ₂ⱼ = δyᶠσ₂₂/Δy + δxᶜσ₁₂/Δx
    EVP forcing (uⁿ−u)/Δτ/ᾱ with Δτ = Δt/ᾱ  ≡  (uⁿ−u)/Δt
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grids import PERIODIC
from ..ops import ixf, iyf, ixy_ff
from .rheologies import ElastoViscoPlasticRheology, ice_strength
from .stresses import SemiImplicitStress, StressFunction

# params vector layout (SMEM)
_P_DT, _P_DX, _P_DY, _P_F, _P_TAUU, _P_TAUV, _P_RC, _P_UE, _P_VE, \
    _P_EINV2, _P_AMIN, _P_AMAX, _P_CALPHA, _P_DMIN, _P_MASSMIN, _P_CONCMIN, \
    _P_REPL, _P_NPARAMS = range(18)

# The target chip (TPU v5e) has 128 MB of VMEM per core, but Mosaic's
# *default* scoped-VMEM limit is ~16 MB — kernels must request a raised
# limit explicitly via CompilerParams(vmem_limit_bytes=...).  All fused
# tiers request VMEM_LIMIT_MB (env CSI_VMEM_LIMIT_MB) and the tile pickers
# budget against it, leaving headroom for Mosaic's own scratch.
VMEM_LIMIT_MB = int(os.environ.get("CSI_VMEM_LIMIT_MB", "126"))


def vmem_compiler_params(interpret=False):
    """kwargs for ``pl.pallas_call`` raising the Mosaic scoped-VMEM limit.

    Empty in interpret mode (TPU compiler params have no CPU lowering)."""
    if interpret:
        return {}
    return dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=VMEM_LIMIT_MB * 2 ** 20))


# VMEM budgets (f32): the rich whole-loop kernel keeps 12 precomputed
# constants + 6 carry resident; the measured whole-array live multiplier is
# ~54 block-sized f32 arrays (768² compiled at 121.5 MB scoped → 55.2/pt
# with double-buffered outputs), so budget points against 54×4 B.  Larger
# grids use the tiled substep-chunked kernel (pallas_evp_tiled.py);
# 2-D tiled above _Y_SLAB_MAX.
_RICH_MULT = 56  # conservative vs the 55.2 measured
_MAX_POINTS_RICH = (VMEM_LIMIT_MB - 4) * 2 ** 20 // (_RICH_MULT * 4)
_MAX_POINTS_TILED = 67_108_864  # 8192²; HBM (16 GB) is the binding cap above


def _tiled_eligible(grid, nsub):
    from .pallas_evp_tiled import _plan_chunks, pick_chunk
    if pick_chunk(nsub) is None or grid.Nx * grid.Ny > _MAX_POINTS_TILED:
        return False
    plan = _plan_chunks(grid.Nx, grid.Ny, nsub)  # (K, TX, TY, Wy)
    return plan is not None and grid.Nx % plan[1] == 0


def _scalar(x):
    if isinstance(x, StressFunction):
        return False  # time-dependent stress -> jnp path
    return x is None or np.ndim(x) == 0


def fused_available(model):
    """True when the model matches the Pallas fast-path configuration."""
    from .momentum import SplitExplicitSolver
    from .coriolis import FPlane

    grid = model.grid
    dyn = model.dynamics
    if dyn is None or not isinstance(dyn.rheology, ElastoViscoPlasticRheology):
        return False
    if not isinstance(dyn.solver, SplitExplicitSolver):
        return False
    if grid.kind != "rectilinear" or grid.topology != (PERIODIC, PERIODIC):
        return False
    if grid.mesh_axes is not None or grid.is_immersed:
        return False
    if grid.np_dtype != np.dtype("float32"):
        return False
    if grid.Nx % 8 or grid.Ny % 128:
        return False
    if (grid.Nx * grid.Ny > _MAX_POINTS_RICH
            and not _tiled_eligible(grid, dyn.solver.substeps)):
        return False
    # metrics must be uniform scalars
    if not all(_scalar(m) or np.ndim(np.asarray(m)) == 0
               for m in (grid.dx_cc, grid.dy_cc)):
        return False

    top = dyn.top_momentum_stress
    if isinstance(top, dict):
        if not (_scalar(top.get("u")) and _scalar(top.get("v"))):
            return False
    elif top is not None and not _scalar(top):
        return False
    bottom = dyn.bottom_momentum_stress
    if bottom is not None and not isinstance(bottom, SemiImplicitStress):
        return False
    if isinstance(bottom, SemiImplicitStress):
        if not (_scalar(bottom.ue) and _scalar(bottom.ve)):
            return False
    if dyn.coriolis is not None and not isinstance(dyn.coriolis, FPlane):
        return False
    if dyn.free_drift is not None:
        return False
    if model.forcing:
        return False
    return True


def _evp_kernel(nsub, repl_on, params_ref,
                P_ref, Pff_ref, gcc_ref, gff_ref,
                drag_u_ref, invm_u_ref, act_u_ref, un_ref,
                drag_v_ref, invm_v_ref, act_v_ref, vn_ref,
                u_ref, v_ref, s11_ref, s22_ref, s12_ref, al_ref,
                o_u_ref, o_v_ref, o_s11_ref, o_s22_ref, o_s12_ref, o_al_ref):
    p = params_ref
    dt = p[_P_DT]
    inv_dx = 1.0 / p[_P_DX]
    inv_dy = 1.0 / p[_P_DY]
    f_cor = p[_P_F]
    tau_u_top = p[_P_TAUU]
    tau_v_top = p[_P_TAUV]
    rC = p[_P_RC]          # ρₑ·Cᴰ of the bottom SemiImplicitStress
    ue = p[_P_UE]
    ve = p[_P_VE]
    e_inv2 = p[_P_EINV2]
    a_min = p[_P_AMIN]
    a_max = p[_P_AMAX]
    c_alpha = p[_P_CALPHA]
    d_min = p[_P_DMIN]

    P = P_ref[:]
    Pff = Pff_ref[:]
    gcc = gcc_ref[:]       # cα·Δt/(m·Az) at cc, < 0 where m ≤ 0
    gff = gff_ref[:]
    drag_u = drag_u_ref[:]     # a_fc/m_fc (0 where m ≤ 0)
    invm_u = invm_u_ref[:]
    act_u = act_u_ref[:]       # active-ice mask at (f,c) as f32
    un = un_ref[:]
    drag_v = drag_v_ref[:]
    invm_v = invm_v_ref[:]
    act_v = act_v_ref[:]
    vn = vn_ref[:]

    roll = pltpu.roll

    def sp(q, axis):   # q[I-1]
        return roll(q, 1, axis)

    def sm(q, axis):   # q[I+1]  (pltpu.roll needs a non-negative shift)
        return roll(q, q.shape[axis] - 1, axis)

    def ixf_(q):
        return 0.5 * (q + sp(q, 0))

    def iyf_(q):
        return 0.5 * (q + sp(q, 1))

    def ixc_(q):
        return 0.5 * (q + sm(q, 0))

    def iyc_(q):
        return 0.5 * (q + sm(q, 1))

    # fused double interpolations — one 0.25 scale instead of two 0.5s
    # (exact: power-of-two scalings commute with rounding, so every r5 op
    # -diet transform below is an FP identity of the r3 form)
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

    # Transcendental-lean substep algebra (measured ~1.3× on a v5e — the
    # loop is VPU-issue-bound, see validation/perf_kernel_surgery.py):
    # 1/Δ via clamped rsqrt (ζ needs only the reciprocal), γ and 1/γ from one
    # clamped γ² (γ = γ²·rsqrt(γ²), 1/γ = rsqrt(γ²) — no divides), the
    # (t, d) strain pair interpolated to ff instead of (ϵ̇₁₁, ϵ̇₂₂) (one ixy
    # saved), and the implicit update in 1/Δτ form (dτ-divide folded into
    # the update's single divide).  All forms agree with the original to
    # ulps per substep; physical configs are contracting so the loop-level
    # agreement vs the jnp path stays at the tested 1e-4 level.
    inv_dt = 1.0 / dt
    inv_dmin = 1.0 / d_min
    amin2 = a_min * a_min
    amax2 = a_max * a_max
    rsqrt = lax.rsqrt
    Ph = 0.5 * P           # loop-invariant halved strengths (exact)
    Pffh = 0.5 * Pff

    def stresses(u, v, s11, s22, s12):
        # r5 op diet (all FP identities of the r3 forms): eS = 2·e12
        # carried instead of e12 (4·(eS/2)² ≡ eS², 2η·(eS/2) ≡ η·eS),
        # double interpolations fused, halved strengths hoisted, and the
        # replacement-pressure select resolved statically.
        e11 = (sm(u, 0) - u) * inv_dx
        e22 = (sm(v, 1) - v) * inv_dy
        eS = (u - sp(u, 1)) * inv_dy + (v - sp(v, 0)) * inv_dx

        d_cc = e11 + e22
        t_cc = e11 - e22
        d_ff = ixyf_(d_cc)
        t_ff = ixyf_(t_cc)
        eSc = ixyc_(eS)

        dd_cc = d_cc * d_cc + (t_cc * t_cc + eSc * eSc) * e_inv2
        dd_ff = d_ff * d_ff + (t_ff * t_ff + eS * eS) * e_inv2
        rD_cc = jnp.minimum(rsqrt(dd_cc), inv_dmin)   # = 1/max(Δcc, Δmin)
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

        # dynamic relaxation γ = clamp(√(ζ·cαΔt/m/Az)), α⁺ where m ≤ 0
        g2cc = jnp.clip(zcc * gcc, amin2, amax2)
        g2ff = jnp.clip(zff * gff, amin2, amax2)
        rg_cc = rsqrt(g2cc)
        rg_ff = rsqrt(g2ff)
        ok_cc = gcc > 0
        ok_ff = gff > 0
        gamma_cc = jnp.where(ok_cc, g2cc * rg_cc, a_max)
        s11 = s11 + jnp.where(ok_cc, (s11_t - s11) * rg_cc, 0.0)
        s22 = s22 + jnp.where(ok_cc, (s22_t - s22) * rg_cc, 0.0)
        s12 = s12 + jnp.where(ok_ff, (s12_t - s12) * rg_ff, 0.0)
        return s11, s22, s12, gamma_cc

    def u_update(u, v, s11, s12, alpha):
        div_x = (s11 - sp(s11, 0)) * inv_dx + (sm(s12, 1) - s12) * inv_dy
        v_fc = ixf_yc_(v)
        du = ue - u
        dv = ve - v_fc
        speed = jnp.sqrt(du * du + dv * dv)
        tau_bx = rC * speed * ue
        tau_i = rC * speed * drag_u        # implicit drag · a/m

        Gu = (f_cor * v_fc
              - tau_u_top * drag_u
              + tau_bx * drag_u
              + div_x * invm_u
              + (un - u) * inv_dt)
        Gu = jnp.where(invm_u > 0, Gu, 0.0)
        idtau = ixf_(alpha) * inv_dt       # 1/Δτ
        uD = (u * idtau + Gu) / (idtau + tau_i)
        return uD * act_u

    def v_update(u, v, s22, s12, alpha):
        div_y = (s22 - sp(s22, 1)) * inv_dy + (sm(s12, 0) - s12) * inv_dx
        u_cf = ixc_yf_(u)
        dv = ve - v
        du = ue - u_cf
        speed = jnp.sqrt(du * du + dv * dv)
        tau_by = rC * speed * ve
        tau_i = rC * speed * drag_v

        Gv = (-f_cor * u_cf
              - tau_v_top * drag_v
              + tau_by * drag_v
              + div_y * invm_v
              + (vn - v) * inv_dt)
        Gv = jnp.where(invm_v > 0, Gv, 0.0)
        idtau = iyf_(alpha) * inv_dt
        vD = (v * idtau + Gv) / (idtau + tau_i)
        return vD * act_v

    # Substeps run in odd/even pairs with the alternating update order
    # statically unrolled (odd substep: v then u; even: u then v) —
    # bit-identical to the per-substep `lax.cond` dispatch it replaces but
    # branch-free inside the hot loop (measured ~16 % of kernel time).
    def one(carry, even):
        u, v, s11, s22, s12, alpha = carry
        s11, s22, s12, alpha = stresses(u, v, s11, s22, s12)
        if even:
            u = u_update(u, v, s11, s12, alpha)
            v = v_update(u, v, s22, s12, alpha)
        else:
            v = v_update(u, v, s22, s12, alpha)
            u = u_update(u, v, s11, s12, alpha)
        return (u, v, s11, s22, s12, alpha)

    def pair(j, carry):
        return one(one(carry, False), True)

    init = (u_ref[:], v_ref[:], s11_ref[:], s22_ref[:], s12_ref[:], al_ref[:])
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


def fused_split_explicit_momentum_step(model, state, dt, u_start, v_start,
                                       interpret=False):
    """Run the full substep loop in one pallas_call; returns the same update
    dict as the jnp `split_explicit_momentum_step`."""
    from ..fields import fill_halos_cc, fill_halos_fc, fill_halos_cf, fill_halos_ff

    grid = model.grid
    dyn = model.dynamics
    rheo = dyn.rheology
    nsub = dyn.solver.substeps
    dt = jnp.asarray(dt, jnp.float32)
    I = grid.interior

    h, a = state.h, state.a
    rho = jnp.asarray(model.sea_ice_density, jnp.float32)
    dx = jnp.asarray(grid.dx_cc, jnp.float32)
    dy = jnp.asarray(grid.dy_cc, jnp.float32)
    az = dx * dy

    # --- constants on padded arrays (correct halos), then cropped ------------
    P_pad = ice_strength(rheo, h, a)
    Pff_pad = ixy_ff(P_pad)
    m_cc = h * a * rho
    m_ff = ixy_ff(m_cc)
    m_fc = ixf(m_cc)
    a_fc = ixf(a)
    m_cf = iyf(m_cc)
    a_cf = iyf(a)

    def inv0(x):
        ok = x > 0
        return jnp.where(ok, 1.0 / jnp.where(ok, x, 1.0), 0.0)

    # γ² coefficient with the m ≤ 0 sentinel (negative)
    gcc_pad = jnp.where(m_cc > 0,
                        rheo.relaxation_strength * dt / (jnp.where(m_cc > 0, m_cc, 1.0) * az),
                        -1.0)
    gff_pad = jnp.where(m_ff > 0,
                        rheo.relaxation_strength * dt / (jnp.where(m_ff > 0, m_ff, 1.0) * az),
                        -1.0)

    invm_u_pad = inv0(m_fc)
    drag_u_pad = invm_u_pad * a_fc
    invm_v_pad = inv0(m_cf)
    drag_v_pad = invm_v_pad * a_cf

    eps_ = jnp.finfo(jnp.float32).eps
    act_u_pad = ((m_fc >= dyn.minimum_mass) & (a_fc >= dyn.minimum_concentration)
                 ).astype(jnp.float32)
    act_v_pad = ((m_cf >= dyn.minimum_mass) & (a_cf >= dyn.minimum_concentration)
                 ).astype(jnp.float32)
    del eps_

    def _f32(x):
        return jnp.asarray(0.0 if x is None else x, jnp.float32)

    top = dyn.top_momentum_stress
    if isinstance(top, dict):
        tau_u_top = _f32(top.get("u"))
        tau_v_top = _f32(top.get("v"))
    else:
        tau_u_top = _f32(top)
        tau_v_top = tau_u_top
    bottom = dyn.bottom_momentum_stress
    if isinstance(bottom, SemiImplicitStress):
        rC = jnp.asarray(bottom.rho_e * bottom.Cd, jnp.float32)
        ue = jnp.asarray(bottom.ue, jnp.float32)
        ve = jnp.asarray(bottom.ve, jnp.float32)
    else:
        rC = jnp.zeros((), jnp.float32)
        ue = jnp.zeros((), jnp.float32)
        ve = jnp.zeros((), jnp.float32)
    f_cor = jnp.asarray(dyn.coriolis.f if dyn.coriolis is not None else 0.0,
                        jnp.float32)

    params = jnp.stack([
        dt, dx, dy, f_cor, tau_u_top, tau_v_top, rC, ue, ve,
        jnp.asarray(rheo.yield_curve_eccentricity, jnp.float32) ** -2.0,
        jnp.asarray(rheo.min_relaxation_parameter, jnp.float32),
        jnp.asarray(rheo.max_relaxation_parameter, jnp.float32),
        jnp.asarray(rheo.relaxation_strength, jnp.float32),
        jnp.asarray(rheo.minimum_plastic_stress, jnp.float32),
        jnp.asarray(dyn.minimum_mass, jnp.float32),
        jnp.asarray(dyn.minimum_concentration, jnp.float32),
        jnp.ones((), jnp.float32) if rheo.pressure_formulation == "replacement"
        else jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
    ])

    carry_in = [I(q) for q in (u_start, v_start, state.sig11, state.sig22,
                               state.sig12, state.alpha)]

    if grid.Nx * grid.Ny <= _MAX_POINTS_RICH:
        consts = [I(q) for q in (P_pad, Pff_pad, gcc_pad, gff_pad,
                                 drag_u_pad, invm_u_pad, act_u_pad, u_start,
                                 drag_v_pad, invm_v_pad, act_v_pad, v_start)]
        kernel = functools.partial(
            _evp_kernel, nsub,
            rheo.pressure_formulation == "replacement")
        shape = carry_in[0].shape
        out_shape = [jax.ShapeDtypeStruct(shape, jnp.float32)] * 6
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
    else:
        from .pallas_evp_tiled import tiled_chunked_evp
        outs = tiled_chunked_evp(nsub, params,
                                 I(m_cc), I(a), I(P_pad), I(u_start), I(v_start),
                                 *carry_in, interpret=interpret,
                                 repl_on=rheo.pressure_formulation
                                 == "replacement")

    u_i, v_i, s11_i, s22_i, s12_i, al_i = outs

    def repad(name_filler, q_int, old):
        q = old.at[grid.Hx:grid.Hx + grid.Nx, grid.Hy:grid.Hy + grid.Ny].set(q_int)
        return name_filler(q, grid)

    u = repad(fill_halos_fc, u_i, state.u)
    v = repad(fill_halos_cf, v_i, state.v)
    s11 = repad(fill_halos_cc, s11_i, state.sig11)
    s22 = repad(fill_halos_cc, s22_i, state.sig22)
    s12 = repad(fill_halos_ff, s12_i, state.sig12)
    alpha = repad(fill_halos_cc, al_i, state.alpha)

    return dict(u=u, v=v, sig11=s11, sig22=s22, sig12=s12, alpha=alpha,
                P=P_pad, un=u_start, vn=v_start,
                Delta=state.Delta, zeta_cc=state.zeta_cc, zeta_ff=state.zeta_ff)
