"""Minimal freezing bucket (port of `examples/simple_freezing_bucket.jl`):
prescribed -10 °C lid, default equilibrium top flux, 10 days of freezing."""

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.simulation import Simulation

minute, day = 60.0, 86400.0


def main():
    grid = csi.RectilinearGrid(size=())
    thermo = csi.SlabThermodynamics(
        top_heat_bc=csi.PrescribedTemperature(-10.0),
        internal_heat_flux=csi.ConductiveFlux(conductivity=2.0))
    model = csi.sea_ice_model(grid, ice_thermodynamics=thermo)
    state = csi.initial_state(model, h=0.01, a=1.0)
    sim = Simulation(model, state, dt=10 * minute, stop_time=10 * day)
    sim.run()
    print(f"h after 10 days: {float(sim.state.h[0, 0]):.4f} m")


if __name__ == "__main__":
    main()
