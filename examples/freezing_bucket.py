"""Freezing bucket: a 0-D slab of ice freezing under a prescribed -10 °C lid.

Port of `examples/freezing_bucket.jl`: PrescribedTemperature top BC,
ConductiveFlux(k=2), frazil-ice bottom heat flux that shuts off as ℵ → 1.
"""

import numpy as np

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.simulation import Simulation, Callback

minute, day = 60.0, 86400.0


def build():
    grid = csi.RectilinearGrid(size=())
    ice_thermodynamics = csi.SlabThermodynamics(
        top_heat_bc=csi.PrescribedTemperature(-10.0),
        internal_heat_flux=csi.ConductiveFlux(conductivity=2.0))
    phase_transitions = csi.PhaseTransitions(heat_capacity=2100.0)

    def frazil_ice_formation(grid, Tu, clock, fields):
        return -(1 - fields.a)  # W m⁻², stops when ℵ = 1

    model = csi.sea_ice_model(grid,
                              ice_thermodynamics=ice_thermodynamics,
                              phase_transitions=phase_transitions,
                              sea_ice_density=900.0,
                              bottom_heat_flux=csi.FluxFunction(func=frazil_ice_formation))
    state = csi.initial_state(model)
    return model, state


def main():
    model, state = build()
    sim = Simulation(model, state, dt=10 * minute, stop_time=10 * day)

    series = []
    sim.callbacks["save"] = Callback(
        lambda s: series.append((s.time, float(s.state.h[0, 0]), float(s.state.a[0, 0]))))
    sim.run()

    t, h, a = map(np.array, zip(*series))
    np.savez("freezing_bucket.npz", t=t, h=h, a=a)
    print(f"final: h = {h[-1]:.4f} m, ℵ = {a[-1]:.4f} after {t[-1]/day:.1f} days")
    return t, h, a


if __name__ == "__main__":
    main()
