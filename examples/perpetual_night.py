"""Perpetual night: ice growth under constant -200 W/m² cooling + radiative
emission with a MeltingConstrainedFluxBalance surface solve.

Port of `examples/perpetual_night.jl`.
"""

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.simulation import Simulation, Callback

hour, day = 3600.0, 86400.0


def main():
    grid = csi.RectilinearGrid(size=())
    thermo = csi.SlabThermodynamics(top_heat_bc=csi.MeltingConstrainedFluxBalance())
    model = csi.sea_ice_model(grid, ice_thermodynamics=thermo,
                              top_heat_flux=(csi.RadiativeEmission(), -200.0))
    state = csi.initial_state(model, h=0.01, a=1.0)

    sim = Simulation(model, state, dt=hour, stop_time=40 * day)
    series = []
    sim.callbacks["save"] = Callback(
        lambda s: series.append((s.time, float(s.state.h[0, 0]), float(s.state.Tu[0, 0]))))
    sim.run()
    t, h, T = zip(*series)
    print(f"final: h = {h[-1]:.3f} m, Tu = {T[-1]:.2f} °C")
    return series


if __name__ == "__main__":
    main()
