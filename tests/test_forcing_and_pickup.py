"""User forcing on tracers/velocities, immersed drag BC, checkpoint pickup."""

import numpy as np
import pytest

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.io import Checkpointer


def test_thickness_forcing():
    """A constant h-forcing grows ice linearly (no thermo, no advection)."""
    grid = csi.RectilinearGrid(size=(4, 4))
    rate = 1e-6  # m/s

    model = csi.sea_ice_model(grid, ice_thermodynamics=None,
                              advection=csi.Centered(order=2),
                              timestepper="ForwardEuler",
                              forcing={"h": lambda g, clock, fields: rate})
    state = csi.initial_state(model, h=1.0, a=1.0)
    dt = 100.0
    for _ in range(10):
        state = csi.step(model, state, dt)
    h = float(state.h[grid.Hx, grid.Hy])
    assert h == pytest.approx(1.0 + rate * dt * 10, rel=1e-12)


def test_velocity_forcing():
    """A body force accelerates the ice (explicit solver, no stresses)."""
    grid = csi.RectilinearGrid(size=(8, 8))
    accel = 1e-6

    dyn = csi.SeaIceMomentumEquation(rheology=csi.ViscousRheology(nu=0.0),
                                     solver=csi.ExplicitSolver())
    model = csi.sea_ice_model(grid, ice_thermodynamics=None, dynamics=dyn,
                              timestepper="ForwardEuler",
                              forcing={"u": lambda g, clock, fields: accel})
    state = csi.initial_state(model, h=1.0, a=1.0)
    for _ in range(5):
        state = csi.step(model, state, 10.0)
    u = np.asarray(grid.interior(state.u))
    np.testing.assert_allclose(u, 5 * 10.0 * accel, rtol=1e-10)


def test_immersed_drag_decelerates():
    """ImmersedDrag slows ice sliding along a coastline."""
    km = 1000.0
    grid = csi.RectilinearGrid(size=(16, 16), x=(0, 16 * km), y=(0, 16 * km),
                               topology=("periodic", "bounded"))
    mask = np.zeros((16, 16), bool)
    mask[:, :2] = True  # southern land strip
    grid = csi.ImmersedBoundaryGrid(grid, mask)

    def build(drag):
        dyn = csi.SeaIceMomentumEquation(
            rheology=csi.ElastoViscoPlasticRheology(),
            top_momentum_stress={"u": -0.05, "v": 0.0},  # eastward wind
            bottom_momentum_stress=csi.SemiImplicitStress(),
            immersed_drag=csi.ImmersedDrag(coefficient=drag) if drag else None,
            solver=csi.SplitExplicitSolver(substeps=8))
        model = csi.sea_ice_model(grid, dynamics=dyn, ice_thermodynamics=None,
                                  advection=csi.WENO(order=5),
                                  timestepper="ForwardEuler")
        state = csi.initial_state(model, h=1.0, a=1.0)
        for _ in range(10):
            state = csi.step(model, state, 60.0)
        return np.asarray(grid.interior(state.u))

    u_free = build(None)
    u_drag = build(3e-1)
    # coastal row (first ocean row) decelerated by the drag
    assert np.isfinite(u_drag).all()
    assert np.abs(u_drag[:, 2]).max() < np.abs(u_free[:, 2]).max()


def test_simulation_pickup(tmp_path):
    grid = csi.RectilinearGrid(size=())
    model = csi.sea_ice_model(grid, top_heat_flux=80.0, bottom_heat_flux=-5.0)
    state = csi.initial_state(model, h=1.0, a=1.0)
    prefix = str(tmp_path / "chk")

    sim = csi.Simulation(model, state, dt=600.0, stop_iteration=10)
    sim.output_writers["ckpt"] = Checkpointer(prefix, csi.IterationInterval(5))
    sim.run()
    h_full = float(sim.state.h[0, 0])

    # resume from the iteration-5 checkpoint and rerun to 10
    sim2 = csi.Simulation(model, csi.initial_state(model, h=1.0, a=1.0),
                          dt=600.0, stop_iteration=10)
    sim2.output_writers["ckpt"] = Checkpointer(prefix, csi.IterationInterval(5))
    sim2.run(pickup=f"{prefix}_iteration5.npz")
    assert float(sim2.state.h[0, 0]) == h_full
    assert sim2.iteration == 10

    # pickup=True resolves the latest checkpoint
    sim3 = csi.Simulation(model, csi.initial_state(model, h=1.0, a=1.0),
                          dt=600.0, stop_iteration=12)
    sim3.output_writers["ckpt"] = Checkpointer(prefix, csi.IterationInterval(5))
    sim3.run(pickup=True)
    assert sim3.iteration == 12
