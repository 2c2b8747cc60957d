"""Summation-by-parts adjointness of the stress divergence.

Port of `test/test_rheology_energy_budget.jl`: on a curvilinear
(latitude-longitude) grid, the metric-aware invariant-form ∂ⱼσᵢⱼ must satisfy

    Σ [u ∂ⱼσ₁ⱼ + v ∂ⱼσ₂ⱼ] Az = − Σ [σ₁₁ε̇₁₁ + σ₂₂ε̇₂₂ + 2σ₁₂ε̇₁₂] Az

to machine precision (< 1e-10), while the naive flux-form divergence carries a
percent-level imbalance (> 1e-3).
"""

import numpy as np

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.ops import dxf, dxc, dyf, dyc
from climaseaice_jl_tpu.state import ModelFields
from climaseaice_jl_tpu.dynamics.rheologies import (
    stress_divergence, strain_rate_xx, strain_rate_yy, strain_rate_xy,
    ElastoViscoPlasticRheology)


def _set_smooth(grid, xloc, yloc, func, margin=2):
    """Zero-filled padded field with func(λ, φ) on the interior margin region,
    at the requested staggered location ('c'/'f' per axis)."""
    lam = np.asarray(grid.xc if xloc == "c" else grid.xf)
    phi = np.asarray(grid.yc if yloc == "c" else grid.yf)
    q = np.zeros(grid.shape)
    Hx, Hy, Nx, Ny = grid.Hx, grid.Hy, grid.Nx, grid.Ny
    for i in range(margin, Nx - margin):
        for j in range(margin, Ny - margin):
            q[Hx + i, Hy + j] = func(lam[Hx + i], phi[Hy + j])
    return q


def _old_flux_form_divergence(grid, s11, s22, s12):
    """The non-adjoint flux-form divergence
    (`test_rheology_energy_budget.jl:27-36`)."""
    div_x = (dxf(grid.dy_cc * s11) + dyc(grid.dx_ff * s12)) / grid.az_fc
    div_y = (dxc(grid.dy_ff * s12) + dyf(grid.dx_cc * s22)) / grid.az_cf
    return div_x, div_y


def stress_power_budget(N):
    grid = csi.LatitudeLongitudeGrid(size=(N, N), longitude=(0, 60),
                                     latitude=(20, 70),
                                     topology=("bounded", "bounded"), halo=4)

    lam_hat = lambda l: (l - 0) / 60 * 2 * np.pi
    phi_hat = lambda p: (p - 20) / 50 * 2 * np.pi

    u = _set_smooth(grid, "f", "c", lambda l, p: np.sin(2 * lam_hat(l)) * np.cos(3 * phi_hat(p)))
    v = _set_smooth(grid, "c", "f", lambda l, p: np.cos(3 * lam_hat(l)) * np.sin(2 * phi_hat(p)))
    s11 = _set_smooth(grid, "c", "c", lambda l, p: np.sin(lam_hat(l)) * np.sin(2 * phi_hat(p)))
    s22 = _set_smooth(grid, "c", "c", lambda l, p: np.cos(2 * lam_hat(l)) * np.cos(phi_hat(p)))
    s12 = _set_smooth(grid, "f", "f", lambda l, p: np.sin(3 * lam_hat(l)) * np.cos(2 * phi_hat(p)))

    rheology = ElastoViscoPlasticRheology()
    fields = ModelFields(u=u, v=v, sig11=s11, sig22=s22, sig12=s12)

    div_x, div_y = stress_divergence(rheology, grid, fields)
    old_x, old_y = _old_flux_form_divergence(grid, s11, s22, s12)

    I = grid.interior
    az_cc = np.broadcast_to(np.asarray(grid.az_cc), grid.shape)
    az_fc = np.broadcast_to(np.asarray(grid.az_fc), grid.shape)
    az_cf = np.broadcast_to(np.asarray(grid.az_cf), grid.shape)
    az_ff = np.broadcast_to(np.asarray(grid.az_ff), grid.shape)

    W_new = float((I(u) * I(np.asarray(div_x)) * I(az_fc)).sum()
                  + (I(v) * I(np.asarray(div_y)) * I(az_cf)).sum())
    W_old = float((I(u) * I(np.asarray(old_x)) * I(az_fc)).sum()
                  + (I(v) * I(np.asarray(old_y)) * I(az_cf)).sum())

    e11 = np.asarray(strain_rate_xx(grid, u, v))
    e22 = np.asarray(strain_rate_yy(grid, u, v))
    e12 = np.asarray(strain_rate_xy(grid, u, v))
    D = float((I(s11) * I(e11) * I(az_cc)).sum()
              + (I(s22) * I(e22) * I(az_cc)).sum()
              + 2 * (I(s12) * I(e12) * I(az_ff)).sum())

    return W_new, W_old, D


def relative_imbalance(W, D):
    return abs(W + D) / max(abs(W), abs(D))


def test_sbp_adjointness():
    for N in (40, 80):
        W_new, W_old, D = stress_power_budget(N)
        imb_new = relative_imbalance(W_new, D)
        imb_old = relative_imbalance(W_old, D)
        assert imb_new < 1e-10, f"N={N}: metric-aware imbalance {imb_new}"
        assert imb_old > 1e-3, f"N={N}: flux-form unexpectedly adjoint {imb_old}"
        assert imb_new < 1e-6 * imb_old
