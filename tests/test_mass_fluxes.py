"""Thermodynamic mass-flux closure — port of `test/test_thermodynamic_mass_fluxes.jl`.

Closure identity (thermodynamics only):
∂t(ρᵢ h ℵ + ρₛ hs ℵ) = mf_ice + mf_snow + mf_snowfall, at atol 1e-12.
"""

import numpy as np
import pytest

import climaseaice_jl_tpu as csi


def column_masses(model, state):
    rho_i = float(model.sea_ice_density)
    h = float(state.h[0, 0])
    a = float(state.a[0, 0])
    Mi = rho_i * h * a
    if state.hs is None:
        Ms = 0.0
    else:
        Ms = float(model.snow_density) * float(state.hs[0, 0]) * a
    return Mi, Ms


def mass_flux_closure(model, state, dt):
    Mi0, Ms0 = column_masses(model, state)
    state = csi.step(model, state, dt)
    Mi1, Ms1 = column_masses(model, state)
    total = (float(state.mf_ice[0, 0]) + float(state.mf_snow[0, 0])
             + float(state.mf_snowfall[0, 0]))
    expected = ((Mi1 + Ms1) - (Mi0 + Ms0)) / dt
    return state, total, expected


def tol(expected):
    return 1e-12 * max(1.0, abs(expected))


@pytest.mark.parametrize("timestepper", ["ForwardEuler", "SplitRungeKutta3"])
class TestBareIceMassFluxes:
    def test_freezing(self, timestepper):
        grid = csi.RectilinearGrid(size=())
        model = csi.sea_ice_model(grid, top_heat_flux=100.0, bottom_heat_flux=10.0,
                                  timestepper=timestepper)
        state = csi.initial_state(model, h=1, a=1)
        state, total, expected = mass_flux_closure(model, state, 3600.0)
        assert total == pytest.approx(expected, abs=tol(expected))
        assert float(state.mf_ice[0, 0]) > 0
        assert float(state.mf_snow[0, 0]) == 0
        assert float(state.mf_snowfall[0, 0]) == 0

    def test_melting(self, timestepper):
        grid = csi.RectilinearGrid(size=())
        model = csi.sea_ice_model(grid, top_heat_flux=-200.0, bottom_heat_flux=10.0,
                                  timestepper=timestepper)
        state = csi.initial_state(model, h=1, a=1)
        state, total, expected = mass_flux_closure(model, state, 3600.0)
        assert total == pytest.approx(expected, abs=tol(expected))
        assert float(state.mf_ice[0, 0]) < 0

    def test_melt_to_extinction(self, timestepper):
        grid = csi.RectilinearGrid(size=())
        model = csi.sea_ice_model(grid, top_heat_flux=-1e5, bottom_heat_flux=10.0,
                                  timestepper=timestepper)
        state = csi.initial_state(model, h=0.2, a=1)
        state, total, expected = mass_flux_closure(model, state, 3600.0)
        assert float(state.h[0, 0]) == 0
        assert float(state.a[0, 0]) == 0
        assert total == pytest.approx(expected, abs=tol(expected))

    def test_partial_concentration_freezing(self, timestepper):
        grid = csi.RectilinearGrid(size=())
        model = csi.sea_ice_model(grid, top_heat_flux=300.0, bottom_heat_flux=10.0,
                                  timestepper=timestepper)
        state = csi.initial_state(model, h=1, a=0.95)
        state, total, expected = mass_flux_closure(model, state, 3600.0)
        assert total == pytest.approx(expected, abs=tol(expected))
        assert float(state.a[0, 0]) > 0.95


@pytest.mark.parametrize("timestepper", ["ForwardEuler", "SplitRungeKutta3"])
class TestSnowMassFluxes:
    def test_snow_freezing(self, timestepper):
        grid = csi.RectilinearGrid(size=())
        model = csi.sea_ice_model(grid, top_heat_flux=100.0, bottom_heat_flux=10.0,
                                  snow_thermodynamics=csi.snow_slab_thermodynamics(),
                                  timestepper=timestepper)
        state = csi.initial_state(model, h=1, a=1, hs=0.2)
        state, total, expected = mass_flux_closure(model, state, 3600.0)
        assert total == pytest.approx(expected, abs=tol(expected))

    def test_snow_melting_with_snowfall(self, timestepper):
        grid = csi.RectilinearGrid(size=())
        model = csi.sea_ice_model(grid, top_heat_flux=-200.0, bottom_heat_flux=10.0,
                                  snow_thermodynamics=csi.snow_slab_thermodynamics(),
                                  snowfall=6e-5, timestepper=timestepper)
        state = csi.initial_state(model, h=1, a=1, hs=0.2)
        state, total, expected = mass_flux_closure(model, state, 3600.0)
        assert total == pytest.approx(expected, abs=tol(expected))
        assert float(state.mf_snowfall[0, 0]) > 0

    def test_flooding_mass_closure(self, timestepper):
        grid = csi.RectilinearGrid(size=())
        model = csi.sea_ice_model(grid, top_heat_flux=50.0, bottom_heat_flux=0.0,
                                  snow_thermodynamics=csi.snow_slab_thermodynamics(),
                                  timestepper=timestepper)
        state = csi.initial_state(model, h=0.5, a=1, hs=1.0)  # negative freeboard
        state, total, expected = mass_flux_closure(model, state, 3600.0)
        assert total == pytest.approx(expected, abs=tol(expected))


def test_immersed_cell_reports_zero_flux():
    """Land cells must report zero mass flux (`test_thermodynamic_mass_fluxes.jl`
    immersed masking check)."""
    grid = csi.RectilinearGrid(size=(4, 4), topology=("bounded", "bounded"))
    mask = np.zeros((4, 4), bool)
    mask[1, 1] = True
    grid = csi.ImmersedBoundaryGrid(grid, mask)
    model = csi.sea_ice_model(grid, top_heat_flux=100.0, bottom_heat_flux=10.0)
    state = csi.initial_state(model, h=1, a=1)
    state = csi.step(model, state, 3600.0)
    mf = np.asarray(grid.interior(state.mf_ice))
    assert mf[1, 1] == 0.0
    assert mf[0, 0] != 0.0
