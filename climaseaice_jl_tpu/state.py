"""Model state pytrees: the prognostic/auxiliary state, the clock, and the
field namespace handed to user flux/forcing callables.

The reference keeps state as mutable Oceananigans `Field`s hanging off the
model struct (`src/sea_ice_model.jl:22-51`); here the whole state is one
immutable pytree threaded through a pure ``step`` function.
"""

from __future__ import annotations

from .utils import pytree_dataclass


@pytree_dataclass
class Clock:
    time: object = 0.0
    iteration: object = 0


@pytree_dataclass
class ModelFields:
    """Read-only namespace passed to flux functions, forcings and kernels.

    Mirrors the reference's ``fields(model)`` / merged ``model_fields``
    NamedTuple (`split_explicit_momentum_equations.jl:124-127`).  Attribute
    names: ``h`` thickness, ``a`` concentration (the reference's ℵ), ``S``
    salinity, ``hs`` snow thickness, ``u``/``v`` velocities, ``Tu``/``Tus``
    ice/snow top temperatures, ``rho`` sea-ice density, plus the EVP
    auxiliaries (σ, α, uⁿ, vⁿ, P).
    """
    h: object = None
    a: object = None
    S: object = None
    hs: object = None
    u: object = None
    v: object = None
    Tu: object = None
    Tus: object = None
    rho: object = None
    sig11: object = None
    sig22: object = None
    sig12: object = None
    un: object = None
    vn: object = None
    P: object = None
    alpha: object = None
    tracers: dict = None


@pytree_dataclass
class SeaIceState:
    """The full prognostic + auxiliary + diagnostic state.

    Optional components are ``None`` when the corresponding physics is off
    (no snow → ``hs is None``; no EVP → σ/α/… are ``None``), mirroring the
    reference's `nothing` fields.
    """
    # prognostic
    h: object = None          # ice thickness (m), cc
    a: object = None          # ice concentration, cc
    u: object = None          # x velocity, fc
    v: object = None          # y velocity, cf
    hs: object = None         # snow thickness, cc
    S: object = None          # ice salinity, cc
    tracers: dict = None      # extra prognostic tracers, cc

    # thermodynamic diagnostic state
    Tu: object = None         # ice top-surface temperature, cc
    Tus: object = None        # snow top-surface temperature, cc

    # EVP auxiliary state (`elasto_visco_plastic_rheology.jl:140-173`)
    sig11: object = None      # cc
    sig22: object = None      # cc
    sig12: object = None      # ff
    alpha: object = None      # cc, dynamic relaxation parameter
    P: object = None          # cc, ice strength
    un: object = None         # fc, velocity snapshot at step start
    vn: object = None         # cf
    Delta: object = None      # cc, visco-plastic Δ (diagnostic)
    zeta_cc: object = None
    zeta_ff: object = None

    # mass-flux diagnostics (kg m⁻² s⁻¹) + applied external heat fluxes
    mf_ice: object = None
    mf_snow: object = None
    mf_snowfall: object = None
    Qtop: object = None
    Qbot: object = None

    clock: Clock = None
