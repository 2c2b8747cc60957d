"""Liquidus relation and phase-transition thermodynamic parameters.

Mirrors `src/SeaIceThermodynamics/SeaIceThermodynamics.jl:22-170`:
``Tₘ(S) = T₀ − m S`` and the Stefan-corrected latent heat
``ℒ(T) = ℒ₀ + (ρ_ℓ c_ℓ / ρ − c)(T − T₀)``.
"""

from __future__ import annotations

from ..utils import pytree_dataclass


@pytree_dataclass
class LinearLiquidus:
    freshwater_melting_temperature: object = 0.0  # °C
    slope: object = 0.054                          # psu / °C


def melting_temperature(liquidus: LinearLiquidus, salinity):
    return liquidus.freshwater_melting_temperature - liquidus.slope * salinity


@pytree_dataclass
class PhaseTransitions:
    density: object = 917.0                 # kg m⁻³ (microscopic pure ice)
    heat_capacity: object = 2000.0          # J/(kg °C)
    liquid_density: object = 999.8          # kg m⁻³
    liquid_heat_capacity: object = 4186.0   # J/(kg °C)
    reference_latent_heat: object = 334e3   # J/kg
    reference_temperature: object = 0.0     # °C
    liquidus: LinearLiquidus = None

    def __post_init__(self):
        if self.liquidus is None:
            object.__setattr__(self, "liquidus", LinearLiquidus())


def latent_heat(pt: PhaseTransitions, T):
    """Per-mass latent heat of fusion of pure ice at temperature ``T``."""
    return (pt.reference_latent_heat
            + (pt.liquid_density * pt.liquid_heat_capacity / pt.density
               - pt.heat_capacity) * (T - pt.reference_temperature))
