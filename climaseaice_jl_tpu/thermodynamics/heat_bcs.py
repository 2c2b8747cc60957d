"""Heat boundary conditions and the flux-combinator layer.

Vectorized, trace-time-dispatched equivalent of
`src/SeaIceThermodynamics/HeatBoundaryConditions/` (boundary_fluxes.jl,
top_heat_boundary_conditions.jl, bottom_heat_boundary_conditions.jl).

A *flux specification* may be:

* ``None``            → zero,
* a python / numpy / jax scalar,
* a 2-D array (interior- or padded-shaped),
* a :class:`FluxFunction` wrapping ``func(grid, Tu, clock, fields[, parameters])``,
* a :class:`RadiativeEmission`,
* a plain callable with the FluxFunction signature (no parameters),
* a tuple of any of the above (summed),

resolved by :func:`getflux` at trace time into one fused jnp expression —
the vectorized analog of the reference's per-point ``getflux`` dispatch
(`boundary_fluxes.jl:8-22,90-91,122-127`).

The diagnostic surface-temperature solve of ``MeltingConstrainedFluxBalance``
(`top_heat_boundary_conditions.jl:82-100`, RootSolvers secant) becomes a
fixed-iteration, branch-free vectorized secant loop — jit/vmap-friendly and
exact for the (a)ffine flux balances exercised by the 1e-15 energy-closure
tests.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..utils import pytree_dataclass, static_field
from .phase_transitions import melting_temperature


# --- boundary condition types ------------------------------------------------

@pytree_dataclass
class PrescribedTemperature:
    """Hold the surface at a prescribed temperature (scalar or field)."""
    temperature: object = 0.0


@pytree_dataclass
class MeltingConstrainedFluxBalance:
    """Diagnose the top temperature from Qext(Tu) = Qint(Tu), capped at Tₘ(S).

    ``iterations`` is the fixed secant iteration count (the reference uses an
    adaptive RootSolvers secant; a fixed count keeps the solve jit-compatible
    and converges to machine precision for smooth flux balances).
    """
    iterations: int = static_field(default=20)


@pytree_dataclass
class IceWaterThermalEquilibrium:
    """Bottom boundary in thermal equilibrium: T_b = Tₘ(S_ocean)."""
    salinity: object = 0.0


@pytree_dataclass
class RadiativeEmission:
    emissivity: object = 1.0
    stefan_boltzmann_constant: object = 5.67e-8
    reference_temperature: object = 273.15


@pytree_dataclass
class FluxFunction:
    """Wrap a callable flux ``func(grid, Tu, clock, fields[, parameters])``.

    Mirrors `boundary_fluxes.jl:26-91` minus the (i, j) indices: the callable
    returns a whole-grid array (or scalar) instead of a point value.
    """
    func: object = static_field()
    parameters: object = None
    top_temperature_dependent: bool = static_field(default=False)


# --- flux extraction ---------------------------------------------------------

def getflux(flux, grid, Tu, clock, fields):
    """Resolve a flux specification to a jnp value (scalar or padded array)."""
    if flux is None:
        return jnp.zeros((), grid.np_dtype)
    if isinstance(flux, tuple):
        total = jnp.zeros((), grid.np_dtype)
        for f in flux:
            total = total + getflux(f, grid, Tu, clock, fields)
        return total
    if isinstance(flux, FluxFunction):
        if flux.parameters is None:
            return flux.func(grid, Tu, clock, fields)
        return flux.func(grid, Tu, clock, fields, flux.parameters)
    if isinstance(flux, RadiativeEmission):
        eps_ = flux.emissivity
        sb = flux.stefan_boltzmann_constant
        Tr = flux.reference_temperature
        return eps_ * sb * (Tu + Tr) ** 4
    if callable(flux):
        return flux(grid, Tu, clock, fields)
    # number or array
    return _as_grid_value(flux, grid)


def _as_grid_value(value, grid):
    """Normalize a scalar or (interior/padded) array to a broadcastable value."""
    v = jnp.asarray(value, grid.np_dtype)
    if v.ndim == 0:
        return v
    if v.shape == grid.shape:
        return v
    if v.shape == grid.interior_shape:
        return grid.set_interior(grid.new_field(), v)
    return v  # trust broadcasting


# --- bottom temperature ------------------------------------------------------

def bottom_temperature(bc, grid, liquidus, fields):
    """`bottom_heat_boundary_conditions.jl:33-39`."""
    if isinstance(bc, PrescribedTemperature):
        return _as_grid_value(bc.temperature, grid)
    if isinstance(bc, IceWaterThermalEquilibrium):
        S = _as_grid_value(bc.salinity, grid)
        return melting_temperature(liquidus, S)
    raise TypeError(f"unsupported bottom heat boundary condition {bc!r}")


# --- surface-temperature secant solve ---------------------------------------

def solve_surface_temperature(flux_balance, Tu0, iterations=32):
    """Vectorized fixed-iteration secant solve of ``flux_balance(T) = 0``.

    Starts from the bracket ``(Tu0 + 1, Tu0)`` like the reference
    (`top_heat_boundary_conditions.jl:88-91`).  Division-by-zero (converged or
    temperature-independent balance) freezes the iterate in place.
    """
    T1 = Tu0 + 1.0
    T2 = Tu0 + 0.0
    F1 = flux_balance(T1)
    F2 = flux_balance(T2)

    def body(_, carry):
        T1, F1, T2, F2 = carry
        dF = F2 - F1
        safe = jnp.abs(dF) > 0
        step = jnp.where(safe, F2 * (T2 - T1) / jnp.where(safe, dF, 1.0), 0.0)
        T3 = T2 - step
        F3 = flux_balance(T3)
        return (T2, F2, T3, F3)

    T1, F1, T2, F2 = lax.fori_loop(0, iterations, body, (T1, F1, T2, F2))
    return T2
