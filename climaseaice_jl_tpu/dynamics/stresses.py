"""External (atmosphere / ocean) momentum stresses.

Vectorized equivalent of `src/SeaIceDynamics/sea_ice_external_stress.jl`:
each stress type exposes an explicit part ``explicit_τ{x,y}`` and an implicit
coefficient ``implicit_τ{x,y}_coefficient`` enabling the semi-implicit
velocity update ``u = (u⁻ + Δt G)/(1 + Δt τᵢ)``.

Supported stress specifications:

* ``None`` — zero;
* a scalar;
* an array (applied to both components? no — use a dict for components);
* a dict ``{"u": ..., "v": ...}`` of per-component scalars/arrays
  (NamedTuple analog, `sea_ice_external_stress.jl:22-27`);
* :class:`SemiImplicitStress` — quadratic drag against an external fluid
  (`sea_ice_external_stress.jl:84-202`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import pytree_dataclass
from ..ops import ixy_fc_of_cf, ixy_cf_of_fc


@pytree_dataclass
class SemiImplicitStress:
    """τ = ρₑ Cᴰ |Δuⁿ| (uₑ − uⁿ⁺¹): quadratic drag, semi-implicit in uᵢ.

    ``ue``/``ve`` are the external velocities at (f,c)/(c,f) — padded arrays
    (halos pre-filled) or scalars.  The functional design makes the
    reference's source/extended-copy refresh machinery
    (`sea_ice_external_stress.jl:132-152`) unnecessary: the coupler passes
    fresh arrays each step.
    """
    ue: object = 0.0
    ve: object = 0.0
    rho_e: object = 1026.0
    Cd: object = 5.5e-3


def _component(stress, comp):
    if isinstance(stress, dict):
        return stress.get(comp)
    return stress


def explicit_tau_x(grid, stress, clock, fields):
    stress = _component(stress, "u")
    if stress is None:
        return jnp.zeros(grid.shape, grid.np_dtype)
    if isinstance(stress, SemiImplicitStress):
        ue = stress.ue
        du = ue - fields.u
        dv = ixy_fc_of_cf(jnp.broadcast_to(stress.ve, grid.shape)) - ixy_fc_of_cf(fields.v)
        return stress.rho_e * stress.Cd * jnp.sqrt(du ** 2 + dv ** 2) * ue
    return jnp.asarray(stress, grid.np_dtype)


def explicit_tau_y(grid, stress, clock, fields):
    stress = _component(stress, "v")
    if stress is None:
        return jnp.zeros(grid.shape, grid.np_dtype)
    if isinstance(stress, SemiImplicitStress):
        ve = stress.ve
        dv = ve - fields.v
        du = ixy_cf_of_fc(jnp.broadcast_to(stress.ue, grid.shape)) - ixy_cf_of_fc(fields.u)
        return stress.rho_e * stress.Cd * jnp.sqrt(du ** 2 + dv ** 2) * ve
    return jnp.asarray(stress, grid.np_dtype)


def implicit_tau_x_coefficient(grid, stress, clock, fields):
    stress = _component(stress, "u")
    if isinstance(stress, SemiImplicitStress):
        du = stress.ue - fields.u
        dv = ixy_fc_of_cf(jnp.broadcast_to(stress.ve, grid.shape)) - ixy_fc_of_cf(fields.v)
        return stress.rho_e * stress.Cd * jnp.sqrt(du ** 2 + dv ** 2)
    return jnp.zeros(grid.shape, grid.np_dtype)


def implicit_tau_y_coefficient(grid, stress, clock, fields):
    stress = _component(stress, "v")
    if isinstance(stress, SemiImplicitStress):
        dv = stress.ve - fields.v
        du = ixy_cf_of_fc(jnp.broadcast_to(stress.ue, grid.shape)) - ixy_cf_of_fc(fields.u)
        return stress.rho_e * stress.Cd * jnp.sqrt(du ** 2 + dv ** 2)
    return jnp.zeros(grid.shape, grid.np_dtype)


def x_momentum_stress(grid, stress, clock, fields):
    """Total x-stress τₓ = explicit − implicit·u (`sea_ice_external_stress.jl:33-37,162-167`)."""
    s = _component(stress, "u")
    if isinstance(s, SemiImplicitStress):
        du = s.ue - fields.u
        dv = ixy_fc_of_cf(jnp.broadcast_to(s.ve, grid.shape)) - ixy_fc_of_cf(fields.v)
        return s.rho_e * s.Cd * jnp.sqrt(du ** 2 + dv ** 2) * du
    return (explicit_tau_x(grid, stress, clock, fields)
            - implicit_tau_x_coefficient(grid, stress, clock, fields) * fields.u)


def y_momentum_stress(grid, stress, clock, fields):
    s = _component(stress, "v")
    if isinstance(s, SemiImplicitStress):
        dv = s.ve - fields.v
        du = ixy_cf_of_fc(jnp.broadcast_to(s.ue, grid.shape)) - ixy_cf_of_fc(fields.u)
        return s.rho_e * s.Cd * jnp.sqrt(du ** 2 + dv ** 2) * dv
    return (explicit_tau_y(grid, stress, clock, fields)
            - implicit_tau_y_coefficient(grid, stress, clock, fields) * fields.v)
