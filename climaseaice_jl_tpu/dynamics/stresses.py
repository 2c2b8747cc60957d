"""External (atmosphere / ocean) momentum stresses.

Vectorized equivalent of `src/SeaIceDynamics/sea_ice_external_stress.jl`:
each stress type exposes an explicit part ``explicit_τ{x,y}`` and an implicit
coefficient ``implicit_τ{x,y}_coefficient`` enabling the semi-implicit
velocity update ``u = (u⁻ + Δt G)/(1 + Δt τᵢ)``.

Supported stress specifications:

* ``None`` — zero;
* a scalar;
* an array (applied to both components? no — use a dict for components);
* a dict ``{"u": ..., "v": ...}`` of per-component scalars/arrays/callables
  (NamedTuple analog, `sea_ice_external_stress.jl:22-27`);
* a :class:`StressFunction` wrapping ``f(grid, clock, fields[, parameters])``
  — a *time-dependent* stress evaluated inside the step (the functional
  analog of the reference's per-iteration Field-refresh callbacks,
  `examples/ice_advected_by_anticyclone.jl`); the callable is a static
  pytree field so the wrapped model stays jittable;
* :class:`SemiImplicitStress` — quadratic drag against an external fluid
  (`sea_ice_external_stress.jl:84-202`); its ``ue``/``ve`` may likewise be
  callables of ``(grid, clock, fields)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import pytree_dataclass, static_field
from ..ops import ixy_fc_of_cf, ixy_cf_of_fc


@pytree_dataclass
class StressFunction:
    """Wrap a callable stress ``func(grid, clock, fields[, parameters])``.

    The stress analog of :class:`~..thermodynamics.heat_bcs.FluxFunction`:
    ``func`` is static (part of the jit cache key), ``parameters`` is a traced
    leaf, so time-dependent winds/currents run on device with no per-step
    host work (unlike the reference's host-side Field refresh in
    `examples/ice_advected_by_anticyclone.jl:97-116`).
    """
    func: object = static_field()
    parameters: object = None


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


def _value(x, grid, clock, fields):
    """Resolve a scalar/array/StressFunction stress ingredient to a value."""
    if isinstance(x, StressFunction):
        if x.parameters is None:
            return x.func(grid, clock, fields)
        return x.func(grid, clock, fields, x.parameters)
    return jnp.asarray(x, grid.np_dtype)


def _vec_value(x, grid, clock, fields, comp):
    """Resolve a *vector-component* stress ingredient (τ component or
    external fluid velocity).  On north-folded grids, impose the Zipper
    sign flip on the fold halo: the reference materializes external
    stresses as Fields whose default BCs carry the sign-flipped Zipper fold
    (`src/sea_ice_model.jl:57-64`, `sea_ice_external_stress.jl:63-78`), so
    stencils interpolating across the seam see the mirrored, sign-flipped
    vector component — not the raw broadcast value."""
    v = _value(x, grid, clock, fields)
    if grid.north_fold and grid.Hy > 0:
        from ..fields import _maybe_fold
        v = jnp.broadcast_to(v, grid.shape)
        xface = comp == "u"
        v = _maybe_fold(v, grid, xface, not xface, -1.0)
    return v


def explicit_tau_x(grid, stress, clock, fields):
    stress = _component(stress, "u")
    if stress is None:
        return jnp.zeros(grid.shape, grid.np_dtype)
    if isinstance(stress, SemiImplicitStress):
        ue = _vec_value(stress.ue, grid, clock, fields, "u")
        ve = _vec_value(stress.ve, grid, clock, fields, "v")
        du = ue - fields.u
        dv = ixy_fc_of_cf(jnp.broadcast_to(ve, grid.shape)) - ixy_fc_of_cf(fields.v)
        return stress.rho_e * stress.Cd * jnp.sqrt(du ** 2 + dv ** 2) * ue
    return _vec_value(stress, grid, clock, fields, "u")


def explicit_tau_y(grid, stress, clock, fields):
    stress = _component(stress, "v")
    if stress is None:
        return jnp.zeros(grid.shape, grid.np_dtype)
    if isinstance(stress, SemiImplicitStress):
        ue = _vec_value(stress.ue, grid, clock, fields, "u")
        ve = _vec_value(stress.ve, grid, clock, fields, "v")
        dv = ve - fields.v
        du = ixy_cf_of_fc(jnp.broadcast_to(ue, grid.shape)) - ixy_cf_of_fc(fields.u)
        return stress.rho_e * stress.Cd * jnp.sqrt(du ** 2 + dv ** 2) * ve
    return _vec_value(stress, grid, clock, fields, "v")


def implicit_tau_x_coefficient(grid, stress, clock, fields):
    stress = _component(stress, "u")
    if isinstance(stress, SemiImplicitStress):
        ue = _vec_value(stress.ue, grid, clock, fields, "u")
        ve = _vec_value(stress.ve, grid, clock, fields, "v")
        du = ue - fields.u
        dv = ixy_fc_of_cf(jnp.broadcast_to(ve, grid.shape)) - ixy_fc_of_cf(fields.v)
        return stress.rho_e * stress.Cd * jnp.sqrt(du ** 2 + dv ** 2)
    return jnp.zeros(grid.shape, grid.np_dtype)


def implicit_tau_y_coefficient(grid, stress, clock, fields):
    stress = _component(stress, "v")
    if isinstance(stress, SemiImplicitStress):
        ue = _vec_value(stress.ue, grid, clock, fields, "u")
        ve = _vec_value(stress.ve, grid, clock, fields, "v")
        dv = ve - fields.v
        du = ixy_cf_of_fc(jnp.broadcast_to(ue, grid.shape)) - ixy_cf_of_fc(fields.u)
        return stress.rho_e * stress.Cd * jnp.sqrt(du ** 2 + dv ** 2)
    return jnp.zeros(grid.shape, grid.np_dtype)


def x_momentum_stress(grid, stress, clock, fields):
    """Total x-stress τₓ = explicit − implicit·u (`sea_ice_external_stress.jl:33-37,162-167`)."""
    s = _component(stress, "u")
    if isinstance(s, SemiImplicitStress):
        ue = _vec_value(s.ue, grid, clock, fields, "u")
        ve = _vec_value(s.ve, grid, clock, fields, "v")
        du = ue - fields.u
        dv = ixy_fc_of_cf(jnp.broadcast_to(ve, grid.shape)) - ixy_fc_of_cf(fields.v)
        return s.rho_e * s.Cd * jnp.sqrt(du ** 2 + dv ** 2) * du
    return (explicit_tau_x(grid, stress, clock, fields)
            - implicit_tau_x_coefficient(grid, stress, clock, fields) * fields.u)


def y_momentum_stress(grid, stress, clock, fields):
    s = _component(stress, "v")
    if isinstance(s, SemiImplicitStress):
        ue = _vec_value(s.ue, grid, clock, fields, "u")
        ve = _vec_value(s.ve, grid, clock, fields, "v")
        dv = ve - fields.v
        du = ixy_cf_of_fc(jnp.broadcast_to(ue, grid.shape)) - ixy_cf_of_fc(fields.u)
        return s.rho_e * s.Cd * jnp.sqrt(du ** 2 + dv ** 2) * dv
    return (explicit_tau_y(grid, stress, clock, fields)
            - implicit_tau_y_coefficient(grid, stress, clock, fields) * fields.v)
