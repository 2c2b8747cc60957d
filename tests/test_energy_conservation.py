"""Column energy closure tests.

Port of `test/test_energy_conservation.jl`: per-step energy balance
ΔE = (−Qa + Ql + Qp)·Δt with E = −ℵ(ρᵢℒh + ρₛℒhs), to rtol 1e-15, across
{bare, snow} × {freeze, melt} × {precipitation}; plus the partial-cover
(ℵ < 1) variants at 1e-13 guarding the per-ice/per-cell flux convention.

The reference records the applied fluxes via mutating FluxFunctions
(`test_energy_conservation.jl:8-18`); mutation is impossible under jit, so
the framework exposes the applied external fluxes as state diagnostics
(``state.Qtop`` / ``state.Qbot``) written by the thermodynamic kernels.
"""

import numpy as np
import pytest

import climaseaice_jl_tpu as csi


def _top_flux(Ta):
    # Q = c (Tu − Ta) ℵ  (per-cell; `test_energy_conservation.jl:8-13`)
    coeff = 1e-3 * 1.225 * 1004 * 5

    def flux(grid, Tu, clock, fields, p):
        return p["coefficient"] * (Tu - p["temperature"]) * fields.a

    return csi.FluxFunction(func=flux,
                            parameters={"coefficient": coeff, "temperature": Ta},
                            top_temperature_dependent=True)


def energy_residual(snow=False, precipitation=False, melting=False,
                    timestepper="SplitRungeKutta3", a0=1.0, hs0=0.2):
    grid = csi.RectilinearGrid(size=())

    Ta = 5.0 if melting else -15.0
    Qb = -20.0 if melting else -5.0
    Ps = 6e-5 if precipitation else 0.0

    snow_thermo = csi.snow_slab_thermodynamics() if snow else None

    model = csi.sea_ice_model(
        grid,
        ice_consolidation_thickness=0.05,
        top_heat_flux=_top_flux(Ta),
        bottom_heat_flux=Qb,
        snow_thermodynamics=snow_thermo,
        snowfall=Ps,
        timestepper=timestepper,
    )
    state = csi.initial_state(model, h=1.0, a=a0, hs=hs0 if snow else 0.0)

    pt = model.phase_transitions
    L = float(csi.latent_heat(pt, 0.0))
    rho_i = float(model.sea_ice_density)
    rho_s = float(model.snow_density) if snow else 0.0

    dt = 600.0
    max_residual = 0.0
    for _ in range(200):
        h0 = float(state.h[0, 0])
        a0_ = float(state.a[0, 0])
        hs0_ = float(state.hs[0, 0]) if snow else 0.0
        E0 = -a0_ * (rho_i * L * h0 + rho_s * L * hs0_)

        state = csi.step(model, state, dt)

        h1 = float(state.h[0, 0])
        a1 = float(state.a[0, 0])
        hs1 = float(state.hs[0, 0]) if snow else 0.0
        E1 = -a1 * (rho_i * L * h1 + rho_s * L * hs1)

        Qa = float(state.Qtop[0, 0])
        Ql = float(state.Qbot[0, 0])
        Qp = -L * Ps if (precipitation and a1 > 0) else 0.0

        dE = E1 - E0
        expected = (-Qa + Ql + Qp) * dt
        scale = max(abs(E0), abs(E1), abs(expected), 1.0)
        max_residual = max(max_residual, abs(dE - expected) / scale)

        if h1 <= 0 and a1 <= 0:
            break

    return max_residual


RTOL = 1e-15


@pytest.mark.parametrize("timestepper", ["ForwardEuler", "SplitRungeKutta3"])
class TestEnergyConservation:
    def test_bare_freezing(self, timestepper):
        assert energy_residual(snow=False, melting=False, timestepper=timestepper) < RTOL

    def test_bare_melting(self, timestepper):
        assert energy_residual(snow=False, melting=True, timestepper=timestepper) < RTOL

    def test_snow_freezing(self, timestepper):
        assert energy_residual(snow=True, melting=False, timestepper=timestepper) < RTOL

    def test_snow_melting(self, timestepper):
        assert energy_residual(snow=True, melting=True, timestepper=timestepper) < RTOL

    def test_snow_precip_freezing(self, timestepper):
        assert energy_residual(snow=True, precipitation=True, melting=False,
                               timestepper=timestepper) < RTOL

    def test_snow_precip_melting(self, timestepper):
        assert energy_residual(snow=True, precipitation=True, melting=True,
                               timestepper=timestepper) < RTOL


# Partial-cover (ℵ < 1) regression tests (`test_energy_conservation.jl:114-211`)
@pytest.mark.parametrize("melting", [True, False])
def test_partial_cover(melting):
    assert energy_residual(snow=True, melting=melting, a0=0.5, hs0=0.15) < 1e-13
