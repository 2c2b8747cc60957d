"""Melting in spring: 4 columns under different solar insolation.

Port of `examples/melting_in_spring.jl`: radiative emission + per-column
solar insolation + sensible aerodynamic flux; bare-ice and snowy variants.
"""

import numpy as np

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.simulation import Simulation, Callback

minute, day = 60.0, 86400.0


def sensible_heat_flux(grid, Tu, clock, fields, p):
    return (p["transfer_coefficient"] * p["atmosphere_density"]
            * p["atmosphere_heat_capacity"] * p["atmosphere_wind_speed"]
            * (Tu - p["atmosphere_temperature"]) * fields.a)


def build(snow=False):
    grid = csi.RectilinearGrid(size=(4,), topology=("periodic", "flat"))

    solar_insolation = np.array([-600.0, -800.0, -1000.0, -1200.0])[:, None]  # W m⁻²
    outgoing_radiation = csi.RadiativeEmission()
    aerodynamic_flux = csi.FluxFunction(
        func=sensible_heat_flux,
        parameters={"transfer_coefficient": 1e-3, "atmosphere_density": 1.225,
                    "atmosphere_heat_capacity": 1004.0, "atmosphere_temperature": -5.0,
                    "atmosphere_wind_speed": 5.0},
        top_temperature_dependent=True)

    top_heat_flux = (outgoing_radiation, solar_insolation, aerodynamic_flux)
    model = csi.sea_ice_model(
        grid, ice_consolidation_thickness=0.05, top_heat_flux=top_heat_flux,
        snow_thermodynamics=csi.snow_slab_thermodynamics() if snow else None)
    kw = dict(h=1.0, a=1.0)
    if snow:
        kw["hs"] = 0.2
    return model, csi.initial_state(model, **kw)


def run(snow=False):
    model, state = build(snow)
    sim = Simulation(model, state, dt=10 * minute, stop_time=30 * day)
    series = []

    def record(s):
        g = model.grid
        series.append((s.time,
                       np.asarray(g.interior(s.state.h))[:, 0].copy(),
                       np.asarray(g.interior(s.state.a))[:, 0].copy(),
                       np.asarray(g.interior(s.state.Tus if snow else s.state.Tu))[:, 0].copy()))

    sim.callbacks["save"] = Callback(record)
    sim.run()
    return series


def main():
    for snow in (False, True):
        series = run(snow)
        t = np.array([s[0] for s in series])
        h = np.stack([s[1] for s in series])
        tag = "snow" if snow else "bare"
        np.savez(f"melting_in_spring_{tag}.npz", t=t, h=h,
                 a=np.stack([s[2] for s in series]),
                 T=np.stack([s[3] for s in series]))
        print(f"{tag}: final h per column = {h[-1]}")


if __name__ == "__main__":
    main()
