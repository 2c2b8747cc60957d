"""Ice-ocean coupling prototype tests (validation/ice_ocean_model analog)."""

import numpy as np

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu import coupled as cp


def _build(T0, S0=30.0, insolation=0.0, h0=0.0, a0=0.0):
    grid = csi.RectilinearGrid(size=(4, 4))
    ice = csi.sea_ice_model(grid, top_heat_flux=0.0, bottom_heat_flux=0.0,
                            ice_salinity=5.0, timestepper="ForwardEuler")
    ocean = cp.SlabOcean(mixed_layer_depth=20.0, solar_insolation=insolation)
    iom = cp.IceOceanModel(ice=ice, ocean=ocean)
    state = cp.initial_state(iom, T_ocean=T0, S_ocean=S0, h=h0, a=a0)
    return iom, state


def test_supercooled_ocean_forms_frazil_ice():
    """Ocean below Tₘ(S) → frazil heat flux into the ice → ice grows and the
    ocean is reset to the melting temperature."""
    iom, state = _build(T0=-3.0, S0=30.0)
    for _ in range(10):
        state = cp.coupled_step(iom, state, 600.0)
    g = iom.ice.grid
    h = np.asarray(g.interior(state.ice.h))
    T = np.asarray(g.interior(state.T_ocean))
    S = np.asarray(g.interior(state.S_ocean))
    Tm = np.asarray(csi.melting_temperature(iom.ice.phase_transitions.liquidus, S))
    assert (h > 0).all()                      # ice formed
    # pinned at Tm(S) up to the post-adjustment open-water radiative cooling
    np.testing.assert_allclose(T, Tm, atol=1e-3)
    assert (T <= Tm + 1e-9).all()


def test_warm_ocean_melts_ice():
    iom, state = _build(T0=2.0, S0=30.0, h0=1.0, a0=1.0)
    h_start = float(state.ice.h[iom.ice.grid.Hx, iom.ice.grid.Hy])
    for _ in range(20):
        state = cp.coupled_step(iom, state, 600.0)
    g = iom.ice.grid
    h = np.asarray(g.interior(state.ice.h))
    assert h.max() < h_start                  # basal melt


def test_brine_rejection_raises_salinity():
    """Freezing (ice growth) rejects brine: S_ice < S_ocean → S_ocean rises."""
    iom, state = _build(T0=-3.0, S0=30.0)
    S0 = float(state.S_ocean[iom.ice.grid.Hx, iom.ice.grid.Hy])
    for _ in range(10):
        state = cp.coupled_step(iom, state, 600.0)
    S1 = float(state.S_ocean[iom.ice.grid.Hx, iom.ice.grid.Hy])
    assert S1 > S0


def test_open_water_radiative_cooling():
    """Ice-free warm ocean cools radiatively through the air-sea flux."""
    iom, state = _build(T0=5.0, S0=30.0)
    T0 = 5.0
    for _ in range(10):
        state = cp.coupled_step(iom, state, 600.0)
    T1 = float(state.T_ocean[iom.ice.grid.Hx, iom.ice.grid.Hy])
    assert T1 < T0
