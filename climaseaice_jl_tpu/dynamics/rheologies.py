"""Sea-ice rheologies: viscous and elasto-visco-plastic (αEVP), plus the
metric-aware, energy-conserving (SBP) stress divergence.

Vectorized equivalents of:

* `src/Rheologies/viscous_rheology.jl` — Newtonian σ = ν δu;
* `src/Rheologies/elasto_visco_plastic_rheology.jl` — Kimmritz et al. (2017)
  αEVP with spatially-varying dynamic relaxation α ∈ [α⁻, α⁺];
* `src/Rheologies/ice_stress_divergence.jl:36-51` — the divergence /
  tension / shear invariant form of ∂ⱼσᵢⱼ that is the exact discrete adjoint
  of the strain-rate operators (machine-precision energy balance on
  curvilinear grids; guarded by the SBP adjointness test).

Strain rates (`elasto_visco_plastic_rheology.jl:360-375`):

    ϵ̇D = [δx(Δy·u) + δy(Δx·v)] / Az            (divergence, cc)
    ϵ̇T = [Δy² δx(u/Δy) − Δx² δy(v/Δx)] / Az    (tension, cc)
    ϵ̇S = [Δx² δy(u/Δx) + Δy² δx(v/Δy)] / Az    (shear, ff)
    ϵ̇₁₁ = (ϵ̇D + ϵ̇T)/2,  ϵ̇₂₂ = (ϵ̇D − ϵ̇T)/2,  ϵ̇₁₂ = ϵ̇S/2
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..utils import pytree_dataclass, static_field
from ..ops import dxc, dxf, dyc, dyf, ixf, iyf, ixy_ff, ixy_cc


# --- strain rates ------------------------------------------------------------

def eps_D_cc(grid, u, v):
    return (dxc(grid.dy_fc * u) + dyc(grid.dx_cf * v)) / grid.az_cc


def eps_T_cc(grid, u, v):
    return (grid.dy_cc ** 2 * dxc(u / grid.dy_fc)
            - grid.dx_cc ** 2 * dyc(v / grid.dx_cf)) / grid.az_cc


def eps_S_ff(grid, u, v):
    return (grid.dx_ff ** 2 * dyf(u / grid.dx_fc)
            + grid.dy_ff ** 2 * dxf(v / grid.dy_cf)) / grid.az_ff


def strain_rates(grid, u, v):
    """(ϵ̇₁₁@cc, ϵ̇₂₂@cc, ϵ̇₁₂@ff) with ϵ̇D/ϵ̇T evaluated once each — the shared
    intermediate of `compute_evp_viscosities`/`compute_evp_stresses` (each
    substep needs all three; computing through `strain_rate_*` would evaluate
    ϵ̇D and ϵ̇T twice)."""
    eD = eps_D_cc(grid, u, v)
    eT = eps_T_cc(grid, u, v)
    return 0.5 * (eD + eT), 0.5 * (eD - eT), 0.5 * eps_S_ff(grid, u, v)


def strain_rate_xx(grid, u, v):
    return 0.5 * (eps_D_cc(grid, u, v) + eps_T_cc(grid, u, v))


def strain_rate_yy(grid, u, v):
    return 0.5 * (eps_D_cc(grid, u, v) - eps_T_cc(grid, u, v))


def strain_rate_xy(grid, u, v):
    return 0.5 * (eps_S_ff(grid, u, v))


# --- rheology configurations -------------------------------------------------

@pytree_dataclass
class ViscosityFunction:
    """Static wrapper for a function-valued viscosity ``ν(x, y, t)`` — the
    νᶜᶜᶜ(::Function) path of `viscous_rheology.jl:5-23`.  ``func`` is part of
    the jit cache key (like FluxFunction/StressFunction)."""
    func: object = static_field()


@pytree_dataclass
class ViscousRheology:
    """Newtonian stress σ = ν δu (`viscous_rheology.jl:5-23`).  ``nu`` may be
    a scalar, a centered field (face values use the 4-point average), or a
    function ``ν(x, y, t)`` evaluated at the stress location."""
    nu: object = 1000.0

    def __post_init__(self):
        if callable(self.nu) and not isinstance(self.nu, ViscosityFunction):
            object.__setattr__(self, "nu", ViscosityFunction(func=self.nu))


@pytree_dataclass
class ElastoViscoPlasticRheology:
    """αEVP of Kimmritz et al. (2017) (`elasto_visco_plastic_rheology.jl:119-137`)."""
    ice_compressive_strength: object = 27500.0   # P★ (N m⁻²)
    ice_compaction_hardening: object = 20.0      # C
    yield_curve_eccentricity: object = 2.0       # e
    minimum_plastic_stress: object = 2e-9        # Δ_min
    min_relaxation_parameter: object = 50.0      # α⁻
    max_relaxation_parameter: object = 300.0     # α⁺
    relaxation_strength: object = math.pi ** 2   # c_α
    pressure_formulation: str = static_field(default="replacement")  # replacement | ice_strength


def ice_strength(rheology: ElastoViscoPlasticRheology, h, a):
    """P = P★ h exp(−C (1 − ℵ)) (`elasto_visco_plastic_rheology.jl:219`)."""
    return (rheology.ice_compressive_strength * h
            * jnp.exp(-rheology.ice_compaction_hardening * (1 - a)))


def ice_pressure(rheology: ElastoViscoPlasticRheology, P, Delta):
    """Replacement pressure P·Δ/(Δ+Δmin) or raw ice strength
    (`elasto_visco_plastic_rheology.jl:282-289`)."""
    if rheology.pressure_formulation == "ice_strength":
        return P
    Dm = rheology.minimum_plastic_stress
    return P * Delta / (Delta + Dm)


def compute_evp_viscosities(rheology: ElastoViscoPlasticRheology, grid, u, v, P,
                            strains=None):
    """Strain invariants → (Δ_cc, ζ_cc, ζ_ff) (`elasto_visco_plastic_rheology.jl:236-273`).

    ``strains``: optional precomputed :func:`strain_rates` tuple shared with
    `compute_evp_stresses` in the substep loop."""
    e_inv2 = rheology.yield_curve_eccentricity ** -2.0
    Dm = rheology.minimum_plastic_stress

    e11_cc, e22_cc, e12_ff = (strain_rates(grid, u, v)
                              if strains is None else strains)
    e11_ff = ixy_ff(e11_cc)
    e22_ff = ixy_ff(e22_cc)
    e12_cc = ixy_cc(e12_ff)

    d_cc = e11_cc + e22_cc
    d_ff = e11_ff + e22_ff
    s_cc = jnp.sqrt((e11_cc - e22_cc) ** 2 + 4 * e12_cc ** 2)
    s_ff = jnp.sqrt((e11_ff - e22_ff) ** 2 + 4 * e12_ff ** 2)

    Delta_cc = jnp.maximum(jnp.sqrt(d_cc ** 2 + s_cc ** 2 * e_inv2), Dm)
    Delta_ff = jnp.maximum(jnp.sqrt(d_ff ** 2 + s_ff ** 2 * e_inv2), Dm)

    P_ff = ixy_ff(P)
    zeta_cc = P / (2 * Delta_cc)
    zeta_ff = P_ff / (2 * Delta_ff)
    return Delta_cc, zeta_cc, zeta_ff


def compute_evp_stresses(rheology: ElastoViscoPlasticRheology, grid,
                         u, v, h, a, rho, dt,
                         sig11, sig22, sig12, Delta_cc, zeta_cc, zeta_ff, P,
                         strains=None):
    """One αEVP stress relaxation substep
    (`elasto_visco_plastic_rheology.jl:294-354`).

    Returns updated (σ₁₁, σ₂₂, σ₁₂, α)."""
    e_inv2 = rheology.yield_curve_eccentricity ** -2.0
    a_plus = rheology.max_relaxation_parameter
    a_minus = rheology.min_relaxation_parameter
    c_alpha = rheology.relaxation_strength

    e11, e22, e12 = strain_rates(grid, u, v) if strains is None else strains

    Pr = ice_pressure(rheology, P, Delta_cc)

    eta_cc = zeta_cc * e_inv2
    eta_ff = zeta_ff * e_inv2

    sig11_target = 2 * eta_cc * e11 + ((zeta_cc - eta_cc) * (e11 + e22) - Pr / 2)
    sig22_target = 2 * eta_cc * e22 + ((zeta_cc - eta_cc) * (e11 + e22) - Pr / 2)
    sig12_target = 2 * eta_ff * e12

    m_cc = h * a * rho
    m_ff = ixy_ff(m_cc)

    # Dynamic relaxation parameter γ = clamp(√(ζ c_α Δt / m / Az), α⁻, α⁺)
    def gamma(zeta, m, az):
        ok = m > 0
        g2 = jnp.where(ok, zeta * c_alpha * dt / jnp.where(ok, m, 1.0) / az, a_plus ** 2)
        g2 = jnp.where(jnp.isnan(g2), a_plus ** 2, g2)
        return jnp.clip(jnp.sqrt(g2), a_minus, a_plus)

    g_cc = gamma(zeta_cc, m_cc, grid.az_cc)
    g_ff = gamma(zeta_ff, m_ff, grid.az_ff)

    sig11 = sig11 + jnp.where(m_cc > 0, (sig11_target - sig11) / g_cc, 0.0)
    sig22 = sig22 + jnp.where(m_cc > 0, (sig22_target - sig22) / g_cc, 0.0)
    sig12 = sig12 + jnp.where(m_ff > 0, (sig12_target - sig12) / g_ff, 0.0)
    alpha = g_cc
    return sig11, sig22, sig12, alpha


# --- rheology stress lookup --------------------------------------------------
# (`elasto_visco_plastic_rheology.jl:378-381`, `viscous_rheology.jl:15-23`)

def _viscosity_cc(nu, grid, clock):
    if isinstance(nu, ViscosityFunction):
        # function ν(x, y, t) evaluated at cell centers — the νᶜᶜᶜ(::Function)
        # path of `viscous_rheology.jl:5-23` (Oceananigans TurbulenceClosures)
        t = clock.time if clock is not None else 0.0
        return nu.func(grid.xc[:, None], grid.yc[None, :], t)
    return nu


def _viscosity_ff(nu, grid, clock):
    if isinstance(nu, ViscosityFunction):
        t = clock.time if clock is not None else 0.0
        return nu.func(grid.xf[:, None], grid.yf[None, :], t)
    if hasattr(nu, "ndim") and getattr(nu, "ndim", 0) == 2:
        return ixy_ff(nu)
    return nu


def rheology_stresses(rheology, grid, fields, clock=None):
    """(σ_ux@cc, σ_uy@ff, σ_vx@ff, σ_vy@cc) for the stress divergence."""
    if isinstance(rheology, ElastoViscoPlasticRheology):
        return fields.sig11, fields.sig12, fields.sig12, fields.sig22
    if isinstance(rheology, ViscousRheology):
        nu_cc = _viscosity_cc(rheology.nu, grid, clock)
        nu_ff = _viscosity_ff(rheology.nu, grid, clock)
        s_ux = nu_cc * dxc(fields.u)
        s_uy = nu_ff * dyf(fields.u)
        s_vx = nu_ff * dxf(fields.v)
        s_vy = nu_cc * dyc(fields.v)
        return s_ux, s_uy, s_vx, s_vy
    if rheology is None:
        z = jnp.zeros(grid.shape, grid.np_dtype)
        return z, z, z, z
    raise TypeError(f"unsupported rheology {rheology!r}")


# --- SBP stress divergence (`ice_stress_divergence.jl:36-51`) -----------------

def stress_divergence(rheology, grid, fields, masks=None, clock=None):
    """(∂ⱼσ₁ⱼ @ (f,c), ∂ⱼσ₂ⱼ @ (c,f)) in the energy-conserving invariant form.

    ``masks``: optional (solid_cc, per_ff) immersed-conditional masks zeroing
    stresses at solid locations (conditional_flux_ccc/ffc analog,
    `ice_stress_divergence.jl:21-24`).
    """
    s_ux, s_uy, s_vx, s_vy = rheology_stresses(rheology, grid, fields, clock=clock)

    if masks is not None:
        solid_cc, per_ff = masks
        if solid_cc is not None:
            s_ux = jnp.where(solid_cc, 0.0, s_ux)
            s_vy = jnp.where(solid_cc, 0.0, s_vy)
        if per_ff is not None:
            s_uy = jnp.where(per_ff, 0.0, s_uy)
            s_vx = jnp.where(per_ff, 0.0, s_vx)

    sD = s_ux + s_vy
    sT = s_ux - s_vy

    div_x = (grid.dy_fc * dxf(sD) / 2
             + dxf(grid.dy_cc ** 2 * sT) / grid.dy_fc / 2
             + dyc(grid.dx_ff ** 2 * s_uy) / grid.dx_fc) / grid.az_fc

    div_y = (grid.dx_cf * dyf(sD) / 2
             - dyf(grid.dx_cc ** 2 * sT) / grid.dx_cf / 2
             + dxc(grid.dy_ff ** 2 * s_vx) / grid.dy_cf) / grid.az_cf

    return div_x, div_y


# --- EVP substep Δτ and rheology forcing -------------------------------------

def substep_dt_fc(rheology, grid, dt, fields):
    """Δτ at u points: Δt / ℑxᶠ(α) for EVP, Δt/substeps otherwise
    (`elasto_visco_plastic_rheology.jl:384-385`, `Rheologies.jl:49`)."""
    if isinstance(rheology, ElastoViscoPlasticRheology):
        return dt / ixf(fields.alpha)
    raise TypeError("substep_dt_fc is EVP-specific")


def substep_dt_cf(rheology, grid, dt, fields):
    if isinstance(rheology, ElastoViscoPlasticRheology):
        return dt / iyf(fields.alpha)
    raise TypeError("substep_dt_cf is EVP-specific")


def rheology_forcing_u(rheology, grid, dt, fields):
    """EVP convergence forcing (uⁿ − u)/Δt/ᾱ (`elasto_visco_plastic_rheology.jl:391-395`)."""
    if isinstance(rheology, ElastoViscoPlasticRheology):
        return (fields.un - fields.u) / dt / ixf(fields.alpha)
    return jnp.zeros(grid.shape, grid.np_dtype)


def rheology_forcing_v(rheology, grid, dt, fields):
    if isinstance(rheology, ElastoViscoPlasticRheology):
        return (fields.vn - fields.v) / dt / iyf(fields.alpha)
    return jnp.zeros(grid.shape, grid.np_dtype)
