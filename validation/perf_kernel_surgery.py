"""Kernel-surgery profile of the fused EVP substep loop (VERDICT r2 item 2).

Runs the rich rectilinear kernel body and ablated variants (rolls removed,
transcendentals removed, selects removed, ...) on the real chip at a given
size, attributing per-substep time to instruction classes.  The ablations
compute WRONG physics — they exist only to bound each class's cost.

Usage: [N=2048] [NSUB=120] python validation/perf_kernel_surgery.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from climaseaice_jl_tpu.dynamics.pallas_evp import (
    _P_DT, _P_DX, _P_DY, _P_F, _P_TAUU, _P_TAUV, _P_RC, _P_UE, _P_VE,
    _P_EINV2, _P_AMIN, _P_AMAX, _P_CALPHA, _P_DMIN, _P_MASSMIN, _P_CONCMIN,
    _P_REPL, vmem_compiler_params)


def make_opt_kernel(nsub):
    """Optimized candidate body: rsqrt-reciprocal forms for ζ and 1/γ,
    t/d strain forms on the ff grid (one ixy saved), scalar 1/dt, and the
    dtau divide folded into the implicit update's single divide."""

    def kernel(params_ref,
               P_ref, Pff_ref, gcc_ref, gff_ref,
               drag_u_ref, invm_u_ref, act_u_ref, un_ref,
               drag_v_ref, invm_v_ref, act_v_ref, vn_ref,
               u_ref, v_ref, s11_ref, s22_ref, s12_ref, al_ref,
               o_u_ref, o_v_ref, o_s11_ref, o_s22_ref, o_s12_ref, o_al_ref):
        p = params_ref
        dt = p[_P_DT]
        inv_dt = 1.0 / dt
        inv_dx = 1.0 / p[_P_DX]
        inv_dy = 1.0 / p[_P_DY]
        f_cor = p[_P_F]
        tau_u_top = p[_P_TAUU]
        tau_v_top = p[_P_TAUV]
        rC = p[_P_RC]
        ue = p[_P_UE]
        ve = p[_P_VE]
        e_inv2 = p[_P_EINV2]
        a_min = p[_P_AMIN]
        a_max = p[_P_AMAX]
        d_min = p[_P_DMIN]
        inv_dmin = 1.0 / d_min
        amin2 = a_min * a_min
        amax2 = a_max * a_max
        inv_amax = 1.0 / a_max
        repl = p[_P_REPL]

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

        rsqrt = jax.lax.rsqrt

        def stresses(u, v, s11, s22, s12):
            e11 = (sm(u, 0) - u) * inv_dx
            e22 = (sm(v, 1) - v) * inv_dy
            e12 = 0.5 * ((u - sp(u, 1)) * inv_dy + (v - sp(v, 0)) * inv_dx)
            d_cc = e11 + e22
            t_cc = e11 - e22
            e12c = ixc_(iyc_(e12))
            d_ff = ixf_(iyf_(d_cc))
            t_ff = ixf_(iyf_(t_cc))
            dd_cc = d_cc * d_cc + (t_cc * t_cc + 4 * e12c * e12c) * e_inv2
            dd_ff = d_ff * d_ff + (t_ff * t_ff + 4 * e12 * e12) * e_inv2
            # 1/Δ with the Δ_min clamp in reciprocal space
            rD_cc = jnp.minimum(rsqrt(dd_cc), inv_dmin)
            rD_ff = jnp.minimum(rsqrt(dd_ff), inv_dmin)
            Dcc = jnp.maximum(dd_cc * rD_cc, d_min)
            zcc = 0.5 * P * rD_cc
            zff = 0.5 * Pff * rD_ff
            Pr = jnp.where(repl > 0, P * Dcc / (Dcc + d_min), P)
            eta_cc = zcc * e_inv2
            eta_ff = zff * e_inv2
            iso = (zcc - eta_cc) * d_cc - Pr * 0.5
            s11_t = 2 * eta_cc * e11 + iso
            s22_t = (2 * eta_cc) * (e11 - t_cc) + iso
            s12_t = 2 * eta_ff * e12
            # γ and 1/γ from one clamped g², sqrt + rsqrt (no divides)
            g2cc = jnp.clip(zcc * gcc, amin2, amax2)
            g2ff = jnp.clip(zff * gff, amin2, amax2)
            rg_cc = rsqrt(g2cc)
            gamma_cc = jnp.where(gcc > 0, g2cc * rg_cc, a_max)
            ginv_cc = jnp.where(gcc > 0, rg_cc, inv_amax)
            ginv_ff = jnp.where(gff > 0, rsqrt(g2ff), 0.0)
            ok_cc = gcc > 0
            s11 = s11 + jnp.where(ok_cc, (s11_t - s11) * ginv_cc, 0.0)
            s22 = s22 + jnp.where(ok_cc, (s22_t - s22) * ginv_cc, 0.0)
            s12 = s12 + (s12_t - s12) * ginv_ff
            return s11, s22, s12, gamma_cc

        def u_update(u, v, s11, s12, alpha):
            div_x = (s11 - sp(s11, 0)) * inv_dx + (sm(s12, 1) - s12) * inv_dy
            v_fc = ixf_(iyc_(v))
            du = ue - u
            dv = ve - v_fc
            speed = jnp.sqrt(du * du + dv * dv)
            ti = rC * speed * drag_u
            Gu = (f_cor * v_fc - tau_u_top * drag_u + rC * speed * ue * drag_u
                  + div_x * invm_u + (un - u) * inv_dt)
            Gu = jnp.where(invm_u > 0, Gu, 0.0)
            # (u + dτGu)/(1 + dτ·ti) with dτ = dt/ᾱ  ≡  (u·ᾱ/dt + Gu)/(ᾱ/dt + ti)
            idtau = ixf_(alpha) * inv_dt
            return (u * idtau + Gu) / (idtau + ti) * act_u

        def v_update(u, v, s22, s12, alpha):
            div_y = (s22 - sp(s22, 1)) * inv_dy + (sm(s12, 0) - s12) * inv_dx
            u_cf = ixc_(iyf_(u))
            dv = ve - v
            du = ue - u_cf
            speed = jnp.sqrt(du * du + dv * dv)
            ti = rC * speed * drag_v
            Gv = (-f_cor * u_cf - tau_v_top * drag_v + rC * speed * ve * drag_v
                  + div_y * invm_v + (vn - v) * inv_dt)
            Gv = jnp.where(invm_v > 0, Gv, 0.0)
            idtau = iyf_(alpha) * inv_dt
            return (v * idtau + Gv) / (idtau + ti) * act_v

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
        u, v, s11, s22, s12, alpha = carry
        o_u_ref[:] = u
        o_v_ref[:] = v
        o_s11_ref[:] = s11
        o_s22_ref[:] = s22
        o_s12_ref[:] = s12
        o_al_ref[:] = alpha

    return kernel


def make_dt_basis_kernel(nsub, ddff_interp=False):
    """Candidate restructuring R1 (VERDICT r3 item 8): carry the stress in
    the (σD, σT, σ12) invariant basis — σD_t = 2ζ·ε̇D − Pr and
    σT_t = 2η·ε̇T assemble in 5 ops vs 11 for (σ11, σ22) via `iso`, at the
    cost of rebuilding σ11/σ22 halves for the divergences (4 ops).  Carry
    converts at chunk entry/exit, so the in/out contract matches the other
    variants bit-for-bit in layout (≈ulp in values).

    ``ddff_interp`` = candidate R2: replace the separate (d, t) ff
    interpolations with ONE 4-point interpolation of the cc invariant
    square dd (saves ~13 slots/substep) — NOT parity-exact (Δ_ff is then
    an interpolated-square, not a square-of-interpolated) and exists only
    to measure what breaking exactness would buy."""

    def kernel(params_ref,
               P_ref, Pff_ref, gcc_ref, gff_ref,
               drag_u_ref, invm_u_ref, act_u_ref, un_ref,
               drag_v_ref, invm_v_ref, act_v_ref, vn_ref,
               u_ref, v_ref, s11_ref, s22_ref, s12_ref, al_ref,
               o_u_ref, o_v_ref, o_s11_ref, o_s22_ref, o_s12_ref, o_al_ref):
        p = params_ref
        dt = p[_P_DT]
        inv_dt = 1.0 / dt
        inv_dx = 1.0 / p[_P_DX]
        inv_dy = 1.0 / p[_P_DY]
        f_cor = p[_P_F]
        tau_u_top = p[_P_TAUU]
        tau_v_top = p[_P_TAUV]
        rC = p[_P_RC]
        ue = p[_P_UE]
        ve = p[_P_VE]
        e_inv2 = p[_P_EINV2]
        a_min = p[_P_AMIN]
        a_max = p[_P_AMAX]
        d_min = p[_P_DMIN]
        inv_dmin = 1.0 / d_min
        amin2 = a_min * a_min
        amax2 = a_max * a_max
        inv_amax = 1.0 / a_max
        repl = p[_P_REPL]

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

        rsqrt = jax.lax.rsqrt

        def stresses(u, v, sD, sT, s12):
            e11 = (sm(u, 0) - u) * inv_dx
            e22 = (sm(v, 1) - v) * inv_dy
            e12 = 0.5 * ((u - sp(u, 1)) * inv_dy + (v - sp(v, 0)) * inv_dx)
            d_cc = e11 + e22
            t_cc = e11 - e22
            e12c = ixc_(iyc_(e12))
            dd_cc = d_cc * d_cc + (t_cc * t_cc + 4 * e12c * e12c) * e_inv2
            if ddff_interp:
                dd_ff = ixf_(iyf_(dd_cc))
            else:
                d_ff = ixf_(iyf_(d_cc))
                t_ff = ixf_(iyf_(t_cc))
                dd_ff = d_ff * d_ff + (t_ff * t_ff + 4 * e12 * e12) * e_inv2
            rD_cc = jnp.minimum(rsqrt(dd_cc), inv_dmin)
            rD_ff = jnp.minimum(rsqrt(dd_ff), inv_dmin)
            Dcc = jnp.maximum(dd_cc * rD_cc, d_min)
            zcc = 0.5 * P * rD_cc
            zff = 0.5 * Pff * rD_ff
            Pr = jnp.where(repl > 0, P * Dcc / (Dcc + d_min), P)
            eta_ff = zff * e_inv2
            sD_t = 2 * zcc * d_cc - Pr
            sT_t = (2 * e_inv2) * zcc * t_cc
            s12_t = 2 * eta_ff * e12
            g2cc = jnp.clip(zcc * gcc, amin2, amax2)
            g2ff = jnp.clip(zff * gff, amin2, amax2)
            rg_cc = rsqrt(g2cc)
            gamma_cc = jnp.where(gcc > 0, g2cc * rg_cc, a_max)
            ginv_cc = jnp.where(gcc > 0, rg_cc, inv_amax)
            ginv_ff = jnp.where(gff > 0, rsqrt(g2ff), 0.0)
            ok_cc = gcc > 0
            sD = sD + jnp.where(ok_cc, (sD_t - sD) * ginv_cc, 0.0)
            sT = sT + jnp.where(ok_cc, (sT_t - sT) * ginv_cc, 0.0)
            s12 = s12 + (s12_t - s12) * ginv_ff
            return sD, sT, s12, gamma_cc

        def u_update(u, v, s11h, s12, alpha):
            div_x = 2 * (s11h - sp(s11h, 0)) * inv_dx + (sm(s12, 1) - s12) * inv_dy
            v_fc = ixf_(iyc_(v))
            du = ue - u
            dv = ve - v_fc
            speed = jnp.sqrt(du * du + dv * dv)
            ti = rC * speed * drag_u
            Gu = (f_cor * v_fc - tau_u_top * drag_u + rC * speed * ue * drag_u
                  + div_x * invm_u + (un - u) * inv_dt)
            Gu = jnp.where(invm_u > 0, Gu, 0.0)
            idtau = ixf_(alpha) * inv_dt
            return (u * idtau + Gu) / (idtau + ti) * act_u

        def v_update(u, v, s22h, s12, alpha):
            div_y = 2 * (s22h - sp(s22h, 1)) * inv_dy + (sm(s12, 0) - s12) * inv_dx
            u_cf = ixc_(iyf_(u))
            dv = ve - v
            du = ue - u_cf
            speed = jnp.sqrt(du * du + dv * dv)
            ti = rC * speed * drag_v
            Gv = (-f_cor * u_cf - tau_v_top * drag_v + rC * speed * ve * drag_v
                  + div_y * invm_v + (vn - v) * inv_dt)
            Gv = jnp.where(invm_v > 0, Gv, 0.0)
            idtau = iyf_(alpha) * inv_dt
            return (v * idtau + Gv) / (idtau + ti) * act_v

        def one(carry, even):
            u, v, sD, sT, s12, alpha = carry
            sD, sT, s12, alpha = stresses(u, v, sD, sT, s12)
            s11h = 0.25 * (sD + sT)   # σ11/2 (the 2· in div folds the half)
            s22h = 0.25 * (sD - sT)
            if even:
                u = u_update(u, v, s11h, s12, alpha)
                v = v_update(u, v, s22h, s12, alpha)
            else:
                v = v_update(u, v, s22h, s12, alpha)
                u = u_update(u, v, s11h, s12, alpha)
            return (u, v, sD, sT, s12, alpha)

        def pair(j, carry):
            return one(one(carry, False), True)

        s11_0, s22_0 = s11_ref[:], s22_ref[:]
        init = (u_ref[:], v_ref[:], s11_0 + s22_0, s11_0 - s22_0,
                s12_ref[:], al_ref[:])
        carry = lax.fori_loop(0, nsub // 2, pair, init)
        u, v, sD, sT, s12, alpha = carry
        o_u_ref[:] = u
        o_v_ref[:] = v
        o_s11_ref[:] = 0.5 * (sD + sT)
        o_s22_ref[:] = 0.5 * (sD - sT)
        o_s12_ref[:] = s12
        o_al_ref[:] = alpha

    return kernel


def make_kernel(nsub, mode):
    """mode: full | opt | dtbasis | ddffint | norolls | notrans | nosel |
    bare (adds/muls only)."""
    if mode == "opt":
        return make_opt_kernel(nsub)
    if mode == "dtbasis":
        return make_dt_basis_kernel(nsub)
    if mode == "ddffint":
        return make_dt_basis_kernel(nsub, ddff_interp=True)
    rolls = mode != "norolls"
    trans = mode != "notrans"
    sel = mode != "nosel"
    if mode == "bare":
        rolls = trans = sel = False

    def kernel(params_ref,
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
        rC = p[_P_RC]
        ue = p[_P_UE]
        ve = p[_P_VE]
        e_inv2 = p[_P_EINV2]
        a_min = p[_P_AMIN]
        a_max = p[_P_AMAX]
        d_min = p[_P_DMIN]
        repl = p[_P_REPL]

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

        roll = pltpu.roll

        def sp(q, axis):
            return roll(q, 1, axis) if rolls else q * 0.999

        def sm(q, axis):
            return roll(q, q.shape[axis] - 1, axis) if rolls else q * 1.001

        def SQRT(q):
            return jnp.sqrt(q) if trans else q * 0.5

        def DIV(a, b):
            return a / b if trans else a * b

        def WHERE(c, a, b):
            return jnp.where(c, a, b) if sel else a

        def CLIP(q, lo, hi):
            return jnp.clip(q, lo, hi) if sel else q

        def ixf_(q):
            return 0.5 * (q + sp(q, 0))

        def iyf_(q):
            return 0.5 * (q + sp(q, 1))

        def ixc_(q):
            return 0.5 * (q + sm(q, 0))

        def iyc_(q):
            return 0.5 * (q + sm(q, 1))

        def stresses(u, v, s11, s22, s12):
            e11 = (sm(u, 0) - u) * inv_dx
            e22 = (sm(v, 1) - v) * inv_dy
            e12 = 0.5 * ((u - sp(u, 1)) * inv_dy + (v - sp(v, 0)) * inv_dx)
            e11f = ixf_(iyf_(e11))
            e22f = ixf_(iyf_(e22))
            e12c = ixc_(iyc_(e12))
            d_cc = e11 + e22
            d_ff = e11f + e22f
            s_cc2 = (e11 - e22) ** 2 + 4 * e12c ** 2
            s_ff2 = (e11f - e22f) ** 2 + 4 * e12 ** 2
            Dcc = jnp.maximum(SQRT(d_cc ** 2 + s_cc2 * e_inv2), d_min)
            Dff = jnp.maximum(SQRT(d_ff ** 2 + s_ff2 * e_inv2), d_min)
            zcc = DIV(P, 2 * Dcc)
            zff = DIV(Pff, 2 * Dff)
            Pr = WHERE(repl > 0, P * DIV(Dcc, Dcc + d_min), P)
            eta_cc = zcc * e_inv2
            eta_ff = zff * e_inv2
            iso = (zcc - eta_cc) * d_cc - Pr * 0.5
            s11_t = 2 * eta_cc * e11 + iso
            s22_t = 2 * eta_cc * e22 + iso
            s12_t = 2 * eta_ff * e12
            gamma_cc = WHERE(gcc > 0, CLIP(SQRT(jnp.abs(zcc * gcc)), a_min, a_max), a_max)
            gamma_ff = WHERE(gff > 0, CLIP(SQRT(jnp.abs(zff * gff)), a_min, a_max), a_max)
            s11 = s11 + WHERE(gcc > 0, DIV(s11_t - s11, gamma_cc), 0.0)
            s22 = s22 + WHERE(gcc > 0, DIV(s22_t - s22, gamma_cc), 0.0)
            s12 = s12 + WHERE(gff > 0, DIV(s12_t - s12, gamma_ff), 0.0)
            return s11, s22, s12, gamma_cc

        def u_update(u, v, s11, s12, alpha):
            div_x = (s11 - sp(s11, 0)) * inv_dx + (sm(s12, 1) - s12) * inv_dy
            v_fc = ixf_(iyc_(v))
            du = ue - u
            dv = ve - v_fc
            speed = SQRT(du * du + dv * dv)
            Gu = (f_cor * v_fc - tau_u_top * drag_u + rC * speed * ue * drag_u
                  + div_x * invm_u + DIV(un - u, dt))
            Gu = WHERE(invm_u > 0, Gu, 0.0)
            dtau = DIV(dt, ixf_(alpha))
            return DIV(u + dtau * Gu, 1 + dtau * rC * speed * drag_u) * act_u

        def v_update(u, v, s22, s12, alpha):
            div_y = (s22 - sp(s22, 1)) * inv_dy + (sm(s12, 0) - s12) * inv_dx
            u_cf = ixc_(iyf_(u))
            dv = ve - v
            du = ue - u_cf
            speed = SQRT(du * du + dv * dv)
            Gv = (-f_cor * u_cf - tau_v_top * drag_v + rC * speed * ve * drag_v
                  + div_y * invm_v + DIV(vn - v, dt))
            Gv = WHERE(invm_v > 0, Gv, 0.0)
            dtau = DIV(dt, iyf_(alpha))
            return DIV(v + dtau * Gv, 1 + dtau * rC * speed * drag_v) * act_v

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
        u, v, s11, s22, s12, alpha = carry
        o_u_ref[:] = u
        o_v_ref[:] = v
        o_s11_ref[:] = s11
        o_s22_ref[:] = s22
        o_s12_ref[:] = s12
        o_al_ref[:] = alpha

    return kernel


def run(N, nsub, mode, reps=int(os.environ.get("REPS", 40)),
        return_outs=False, interpret=bool(os.environ.get("INTERPRET"))):
    rng = np.random.default_rng(0)
    shape = (N, N)
    params = jnp.asarray(np.array(
        [120.0, 1000.0, 1000.0, 1.4e-4, 0.1, 0.05, 5.5, 0.0, 0.0,
         0.25, 30.0, 500.0, np.pi**2, 2e-9, 1.0, 1e-3, 1.0, 0.0],
        np.float32))
    consts = [jnp.asarray(rng.random(shape, np.float32) + 0.5)
              for _ in range(12)]
    carry = [jnp.asarray(0.1 * rng.random(shape, np.float32))
             for _ in range(6)]
    kernel = make_kernel(nsub, mode)

    @jax.jit
    def go(params, *args):
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 6,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 18,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            interpret=interpret,
            **vmem_compiler_params(interpret),
        )(params, *args)

    outs = go(params, *consts, *carry)
    if return_outs:
        return [np.asarray(o) for o in outs]
    np.asarray(outs[0])  # axon: block_until_ready does not sync; fetch does
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = go(params, *consts, *carry)
    np.asarray(outs[0])
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    N = int(os.environ.get("N", 2048))
    nsub = int(os.environ.get("NSUB", 120))
    a = run(N, nsub, "full", return_outs=True)
    b = run(N, nsub, "opt", return_outs=True)
    errs = [float(np.abs(x - y).max() / max(np.abs(x).max(), 1e-12))
            for x, y in zip(a, b)]
    print("opt-vs-full rel errs (u,v,s11,s22,s12,al):",
          ["%.2e" % e for e in errs])
    if os.environ.get("ERRONLY"):
        return 0
    base = None
    for mode in ["full", "opt", "dtbasis", "ddffint",
                 "norolls", "notrans", "nosel", "bare"]:
        t = run(N, nsub, mode)
        ns_pt_sub = t / (N * N * nsub) * 1e12
        if base is None:
            base = t
        print(f"{mode:9s} {t*1e3:8.2f} ms/loop  {ns_pt_sub:7.2f} ps/pt/substep"
              f"  {t/base*100:6.1f}% of full")
    print(f"(N={N}, nsub={nsub}; deltas vs full bound each class's cost)")


if __name__ == "__main__":
    sys.exit(main())
