"""Snow thermodynamics physics tests — port of `test/test_snow_thermodynamics.jl`."""

import numpy as np
import pytest

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.thermodynamics.slab import (
    conductive_flux_value, ice_snow_conductive_flux_value, interface_temperature,
    IceSnowConductiveFlux, ConductiveFlux)


def test_snow_model_construction():
    grid = csi.RectilinearGrid(size=(10, 10), topology=("bounded", "bounded"))
    model = csi.sea_ice_model(grid, snow_thermodynamics=csi.snow_slab_thermodynamics())
    assert isinstance(model.snow_thermodynamics, csi.SlabThermodynamics)
    assert float(model.snow_thermodynamics.internal_heat_flux.conductivity) == pytest.approx(0.31)
    assert isinstance(model.ice_thermodynamics.internal_heat_flux, ConductiveFlux)

    state = csi.initial_state(model, h=1, a=1, hs=0.1)
    assert state.hs is not None

    model_no_snow = csi.sea_ice_model(grid)
    assert model_no_snow.snow_thermodynamics is None
    state2 = csi.initial_state(model_no_snow, h=1, a=1)
    assert state2.hs is None


def test_backward_compat_without_snow():
    grid = csi.RectilinearGrid(size=(10, 10), topology=("bounded", "bounded"))
    model = csi.sea_ice_model(grid)
    state = csi.initial_state(model, h=1, a=1)
    sim = csi.Simulation(model, state, dt=1.0, stop_iteration=3)
    sim.run()
    assert sim.iteration == 3


def test_snow_insulation():
    ki, ks = 2.0, 0.31
    hi, hs = 1.0, 0.3
    Tu, Tb = -10.0, -1.8
    f = IceSnowConductiveFlux(snow_conductivity=ks, ice_conductivity=ki)

    Fc_no_snow = float(conductive_flux_value(ConductiveFlux(ki), np.float64(Tu),
                                             np.float64(Tb), np.float64(hi)))
    Fc_with_snow = float(ice_snow_conductive_flux_value(f, np.float64(Tu), np.float64(Tb),
                                                        np.float64(hi), np.float64(hs)))
    assert abs(Fc_with_snow) < abs(Fc_no_snow)

    Fc_zero_snow = float(ice_snow_conductive_flux_value(f, np.float64(Tu), np.float64(Tb),
                                                        np.float64(hi), np.float64(0.0)))
    assert Fc_zero_snow == pytest.approx(Fc_no_snow)

    Fc_thick = float(ice_snow_conductive_flux_value(f, np.float64(Tu), np.float64(Tb),
                                                    np.float64(hi), np.float64(1.0)))
    assert abs(Fc_thick) < abs(Fc_with_snow)


def test_interface_temperature():
    ki, ks = 2.0, 0.31
    hi, hs = 1.0, 0.3
    Tu, Tb = -10.0, -1.8
    f = IceSnowConductiveFlux(snow_conductivity=ks, ice_conductivity=ki)
    Tsi = float(interface_temperature(f, np.float64(Tu), np.float64(Tb),
                                      np.float64(hi), np.float64(hs)))
    assert Tu < Tsi < Tb
    Tsi_no_snow = float(interface_temperature(f, np.float64(Tu), np.float64(Tb),
                                              np.float64(hi), np.float64(0.0)))
    assert Tsi_no_snow == pytest.approx(Tu)


def test_snow_ice_formation_flooding():
    grid = csi.RectilinearGrid(size=())
    ice_thermo = csi.SlabThermodynamics(top_heat_bc=csi.PrescribedTemperature(-5.0))
    model = csi.sea_ice_model(grid, ice_thermodynamics=ice_thermo,
                              snow_thermodynamics=csi.snow_slab_thermodynamics())
    hi, hs = 0.5, 1.0
    state = csi.initial_state(model, h=hi, a=1, hs=hs)
    state = csi.step(model, state, 1.0)
    assert float(state.h[0, 0]) > hi
    assert float(state.hs[0, 0]) < hs


def test_snowfall_accumulation():
    grid = csi.RectilinearGrid(size=())
    model = csi.sea_ice_model(grid, snow_thermodynamics=csi.snow_slab_thermodynamics(),
                              snowfall=1e-5)
    state = csi.initial_state(model, h=1, a=1, hs=0)
    state = csi.step(model, state, 3600.0)
    assert float(state.hs[0, 0]) > 0


def test_snow_melts_before_ice():
    grid = csi.RectilinearGrid(size=())
    model = csi.sea_ice_model(grid, snow_thermodynamics=csi.snow_slab_thermodynamics(),
                              top_heat_flux=-100.0)  # incoming heat
    hi, hs = 2.0, 0.1
    state = csi.initial_state(model, h=hi, a=1, hs=hs)
    state = csi.step(model, state, 3600.0)
    assert float(state.hs[0, 0]) < hs


@pytest.mark.parametrize("timestepper", ["ForwardEuler", "SplitRungeKutta3"])
def test_time_stepping_with_snow(timestepper):
    grid = csi.RectilinearGrid(size=(10, 10), topology=("bounded", "bounded"))
    model = csi.sea_ice_model(grid, snow_thermodynamics=csi.snow_slab_thermodynamics(),
                              advection=csi.WENO(order=5), timestepper=timestepper)
    state = csi.initial_state(model, h=1, a=1, hs=0.1)
    sim = csi.Simulation(model, state, dt=1.0, stop_iteration=3)
    sim.run()
    assert sim.iteration == 3
