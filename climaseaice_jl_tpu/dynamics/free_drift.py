"""Free-drift velocity closures.

Vectorized equivalent of `src/SeaIceDynamics/stress_balance_free_drift.jl`:
when exactly one of the top/bottom stresses is a velocity-dependent
:class:`SemiImplicitStress`, the balance τᵀ ≈ τᴮ has the closed form
``𝒰ᵢ = 𝒰ₑ − τ/√(C‖τ‖)``.  Used both as a sub-threshold velocity limiter in
the momentum kernels and as a standalone dynamics.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import pytree_dataclass
from ..ops import ixy_fc_of_cf, ixy_cf_of_fc
from .stresses import SemiImplicitStress, x_momentum_stress, y_momentum_stress


@pytree_dataclass
class StressBalanceFreeDrift:
    top_momentum_stress: object = None
    bottom_momentum_stress: object = None

    def __post_init__(self):
        top = self.top_momentum_stress
        bottom = self.bottom_momentum_stress
        if isinstance(top, SemiImplicitStress) and isinstance(bottom, SemiImplicitStress):
            raise ValueError("StressBalanceFreeDrift supports a SemiImplicitStress "
                             "for only one of top/bottom, not both")


def _closed_form_u(grid, known_stress, si: SemiImplicitStress, clock, fields):
    """u_e − τₓ/√(C‖τ‖) where ``known_stress`` is velocity-independent."""
    tx = x_momentum_stress(grid, known_stress, clock, fields)
    ty = ixy_fc_of_cf(y_momentum_stress(grid, known_stress, clock, fields))
    tmag = jnp.sqrt(tx ** 2 + ty ** 2)
    C = si.rho_e * si.Cd
    ue = jnp.broadcast_to(jnp.asarray(si.ue, grid.np_dtype), grid.shape)
    denom = jnp.sqrt(C * jnp.where(tmag > 0, tmag, 1.0))
    return ue - jnp.where(tmag > 0, tx / denom, 0.0)


def _closed_form_v(grid, known_stress, si: SemiImplicitStress, clock, fields):
    tx = ixy_cf_of_fc(x_momentum_stress(grid, known_stress, clock, fields))
    ty = y_momentum_stress(grid, known_stress, clock, fields)
    tmag = jnp.sqrt(tx ** 2 + ty ** 2)
    C = si.rho_e * si.Cd
    ve = jnp.broadcast_to(jnp.asarray(si.ve, grid.np_dtype), grid.shape)
    denom = jnp.sqrt(C * jnp.where(tmag > 0, tmag, 1.0))
    return ve - jnp.where(tmag > 0, ty / denom, 0.0)


def free_drift_u(grid, free_drift, clock, fields):
    if free_drift is None:
        return jnp.zeros(grid.shape, grid.np_dtype)
    if isinstance(free_drift, dict):  # prescribed velocities
        return jnp.broadcast_to(jnp.asarray(free_drift["u"], grid.np_dtype), grid.shape)
    if isinstance(free_drift, StressBalanceFreeDrift):
        top = free_drift.top_momentum_stress
        bottom = free_drift.bottom_momentum_stress
        if isinstance(bottom, SemiImplicitStress):
            return _closed_form_u(grid, top, bottom, clock, fields)
        if isinstance(top, SemiImplicitStress):
            return _closed_form_u(grid, bottom, top, clock, fields)
        return jnp.zeros(grid.shape, grid.np_dtype)
    raise TypeError(f"unsupported free drift {free_drift!r}")


def free_drift_v(grid, free_drift, clock, fields):
    if free_drift is None:
        return jnp.zeros(grid.shape, grid.np_dtype)
    if isinstance(free_drift, dict):
        return jnp.broadcast_to(jnp.asarray(free_drift["v"], grid.np_dtype), grid.shape)
    if isinstance(free_drift, StressBalanceFreeDrift):
        top = free_drift.top_momentum_stress
        bottom = free_drift.bottom_momentum_stress
        if isinstance(bottom, SemiImplicitStress):
            return _closed_form_v(grid, top, bottom, clock, fields)
        if isinstance(top, SemiImplicitStress):
            return _closed_form_v(grid, bottom, top, clock, fields)
        return jnp.zeros(grid.shape, grid.np_dtype)
    raise TypeError(f"unsupported free drift {free_drift!r}")
