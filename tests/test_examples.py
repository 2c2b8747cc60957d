"""Short-duration runs of every example configuration (the reference's
examples are its de-facto integration suite; BASELINE.md configs)."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.simulation import Simulation


def test_freezing_bucket_short():
    import freezing_bucket as ex
    model, state = ex.build()
    sim = Simulation(model, state, dt=600.0, stop_time=86400.0)
    sim.run()
    assert float(sim.state.h[0, 0]) > 0.0
    assert 0 < float(sim.state.a[0, 0]) <= 1.0


def test_melting_in_spring_short():
    import melting_in_spring as ex
    model, state = ex.build(snow=False)
    for _ in range(20):
        state = csi.step(model, state, 600.0)
    h = np.asarray(model.grid.interior(state.h))[:, 0]
    assert np.isfinite(h).all()
    # stronger insolation melts more: h decreasing across columns
    assert h[0] >= h[-1]


def test_perpetual_night_short():
    import perpetual_night as ex
    grid = csi.RectilinearGrid(size=())
    model = csi.sea_ice_model(grid, top_heat_flux=(csi.RadiativeEmission(), -200.0))
    state = csi.initial_state(model, h=0.01, a=1.0)
    for _ in range(48):
        state = csi.step(model, state, 3600.0)
    assert float(state.h[0, 0]) > 0.01  # strong cooling → growth


def test_diffusive_column_short():
    import diffusive_ice_column_model as ex
    from climaseaice_jl_tpu import enthalpy as em
    model, state = ex.build()
    for _ in range(50):
        state = em.step(model, state, 600.0)
    assert np.isfinite(np.asarray(state.T)).all()


def test_anticyclone_short():
    import ice_advected_by_anticyclone as ex
    from climaseaice_jl_tpu import step as model_step
    model, state = ex.build(N=32, substeps=10)
    for _ in range(5):
        state = model_step(model, state, 120.0)
    I = model.grid.interior
    assert np.isfinite(np.asarray(I(state.h))).all()
    assert np.abs(np.asarray(I(state.u))).max() > 0


def test_coastline_short():
    import ice_advected_on_coastline as ex
    model, state = ex.build(Nx=64, Ny=32, substeps=10)
    for _ in range(5):
        state = csi.step(model, state, 300.0)
    I = model.grid.interior
    h = np.asarray(I(state.h))
    assert np.isfinite(h).all()
    # land stays empty
    land = np.asarray(I(model.grid.solid_cc))
    assert np.all(h[land] == 0)


def test_arctic_basin_short():
    import arctic_basin_seasonal_cycle as ex
    model, state = ex.build()
    for _ in range(90):  # 30 days at 8h
        state = csi.step(model, state, 8 * 3600.0)
    assert np.isfinite(float(state.h[0, 0]))
    assert float(state.h[0, 0]) > 0


def test_lake_short():
    import freezing_of_a_lake as ex
    model, state = ex.build()
    for _ in range(100):
        state = ex.advance_lake(model, state, 600.0)
        state = csi.step(model, state, 600.0)
    g = model.grid
    h = np.asarray(g.interior(state.h))[:, 0]
    TL = np.asarray(g.interior(state.tracers["T_lake"]))[:, 0]
    assert np.isfinite(h).all()
    # coldest column cools the lake fastest
    assert TL[0] <= TL[-1]


def test_melting_over_dynamic_ocean_short():
    """Dynamical-ocean coupling example (`melting_baroclinicity.jl` analog):
    the warm strip melts ice and the ocean develops currents."""
    import melting_over_dynamic_ocean as ex
    from climaseaice_jl_tpu import coupled as cp
    iom, state = ex.build(N=32)
    g = iom.ice.grid
    h0 = np.asarray(g.interior(state.ice.h)).copy()
    for _ in range(12):
        state = cp.coupled_step(iom, state, 1200.0)
    h = np.asarray(g.interior(state.ice.h))
    uo = np.asarray(g.interior(state.u_ocean))
    assert np.isfinite(h).all() and np.isfinite(uo).all()
    mid = h[:, h.shape[1] // 2].mean()        # warm strip: basal melt
    edge = h[:, 2].mean()
    assert mid < h0[:, h0.shape[1] // 2].mean()
    assert mid < edge
    assert np.abs(uo).max() > 1e-5            # ocean responds
