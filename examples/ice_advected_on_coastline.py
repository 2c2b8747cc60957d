"""Ice advected along a coastline: immersed boundary + EVP dynamics.

Port of `examples/ice_advected_on_coastline.jl`: 256×128 periodic-x channel
with a diagonal coastline immersed boundary, constant eastward wind stress,
SemiImplicitStress ocean drag, split-explicit EVP with 150 substeps.
The reference's immersed drag flux BCs map to ``ImmersedDrag`` (linear
−C·u drag through coast-adjacent faces, C = 3e-3).
"""

import numpy as np

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.simulation import Simulation, Callback

km, minute, day = 1000.0, 60.0, 86400.0


def build(Nx=256, Ny=128, substeps=150):
    Lx, Ly = 512 * km, 256 * km
    grid = csi.RectilinearGrid(size=(Nx, Ny), x=(-Lx / 2, Lx / 2), y=(0, Ly),
                               halo=4, topology=("periodic", "bounded"))

    def land(x, y):
        # `ice_advected_on_coastline.jl:bottom`: water only in a diagonal wedge
        ocean = (y <= Ly / 2) & (np.abs(x / Lx) * Nx + y / Ly * Ny > 24)
        return ~ocean

    grid = csi.ImmersedBoundaryGrid(grid, land)

    v_a, Cd, rho_a = 10.0, 1.2e-3, 1.3
    tau_u = -rho_a * Cd * v_a ** 2   # constant eastward wind stress

    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(),
        top_momentum_stress={"u": tau_u, "v": 0.0},
        bottom_momentum_stress=csi.SemiImplicitStress(),
        immersed_drag=csi.ImmersedDrag(coefficient=3e-3),
        solver=csi.SplitExplicitSolver(substeps=substeps))

    model = csi.sea_ice_model(grid, dynamics=dynamics, ice_thermodynamics=None,
                              advection=csi.WENO(order=7),
                              timestepper="SplitRungeKutta3")
    state = csi.initial_state(model, h=1.0, a=1.0)
    return model, state


def main(stop_days=3.0):
    model, state = build()
    sim = Simulation(model, state, dt=5 * minute, stop_time=stop_days * day)
    snaps = []
    sim.callbacks["save"] = Callback(
        lambda s: snaps.append((s.time,
                                np.asarray(model.grid.interior(s.state.h)).copy())),
        schedule=csi.IterationInterval(36))
    sim.run()
    t, h = zip(*snaps)
    np.savez("ice_advected_on_coastline.npz", t=np.array(t), h=np.stack(h))
    print(f"final: h ∈ [{h[-1].min():.2f}, {h[-1].max():.2f}] m "
          f"(ridging against the coast expected)")
    return model, sim.state


if __name__ == "__main__":
    main()
