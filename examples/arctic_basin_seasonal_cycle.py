"""Arctic-basin seasonal cycle: multi-decade 0-D column with cyclically
interpolated monthly heat fluxes (Semtner's tabulated climatology).

Port of `examples/arctic_basin_seasonal_cycle.jl`: monthly shortwave /
longwave / sensible / latent fluxes with cyclical linear time interpolation,
temperature-dependent albedo, radiative emission, 8-hour steps for 30 years.
"""

import numpy as np

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.forcing_utils import FieldTimeSeries
from climaseaice_jl_tpu.simulation import Simulation, Callback

hour, day = 3600.0, 86400.0
month_days, n_months = 30, 12
year = month_days * n_months * day

KCAL = 4184.0
PER_MONTH = KCAL / (month_days * day)

TAB_SHORTWAVE = -np.array([0, 0, 1.9, 9.9, 17.7, 19.2, 13.6, 9.0, 3.7, 0.4, 0, 0]) * 1e4 * PER_MONTH
TAB_LONGWAVE = -np.array([10.4, 10.3, 10.3, 11.6, 15.1, 18.0, 19.1, 18.7, 16.5, 13.9, 11.2, 10.9]) * 1e4 * PER_MONTH
TAB_SENSIBLE = -np.array([1.18, 0.76, 0.72, 0.29, -0.45, -0.39, -0.30, -0.40, -0.17, 0.1, 0.56, 0.79]) * 1e4 * PER_MONTH
TAB_LATENT = -np.array([0, -0.02, -0.03, -0.09, -0.46, -0.70, -0.64, -0.66, -0.39, -0.19, -0.01, -0.01]) * 1e4 * PER_MONTH

TIMES = (np.arange(15, month_days * n_months, 30)) * day


def build():
    import jax.numpy as jnp

    grid = csi.RectilinearGrid(size=())

    Rs = FieldTimeSeries(times=TIMES, data=TAB_SHORTWAVE, cyclical=True)
    Rl = FieldTimeSeries(times=TIMES, data=TAB_LONGWAVE, cyclical=True)
    Qs = FieldTimeSeries(times=TIMES, data=TAB_SENSIBLE, cyclical=True)
    Ql = FieldTimeSeries(times=TIMES, data=TAB_LATENT, cyclical=True)

    def solar_flux(grid, Tu, clock, fields, fts):
        Q = fts.at_time(clock.time)
        albedo = jnp.where(Tu < -0.1, 0.75, 0.64)  # T-dependent albedo
        return Q * (1 - albedo)

    Q_shortwave = csi.FluxFunction(func=solar_flux, parameters=Rs,
                                   top_temperature_dependent=True)
    Q_emission = csi.RadiativeEmission(emissivity=1.0,
                                       stefan_boltzmann_constant=5.67e-8 * 1.02)

    top_heat_flux = (Q_shortwave, Rl, Qs, Ql, Q_emission)
    model = csi.sea_ice_model(grid, top_heat_flux=top_heat_flux)
    state = csi.initial_state(model, h=0.3, a=1.0)
    return model, state


def main(years=30.0):
    model, state = build()
    sim = Simulation(model, state, dt=8 * hour, stop_time=years * 360 * day)
    series = []
    sim.callbacks["save"] = Callback(
        lambda s: series.append((s.time, float(s.state.h[0, 0]),
                                 float(s.state.Tu[0, 0]), float(s.state.a[0, 0]))),
        schedule=csi.IterationInterval(3))
    sim.run()
    t, h, T, a = map(np.array, zip(*series))
    np.savez("arctic_basin_seasonal_cycle.npz", t=t, h=h, T=T, a=a)
    last_year = t > t[-1] - year
    print(f"equilibrium cycle: h ∈ [{h[last_year].min():.2f}, {h[last_year].max():.2f}] m, "
          f"T ∈ [{T[last_year].min():.1f}, {T[last_year].max():.1f}] °C")
    return t, h, T, a


if __name__ == "__main__":
    main()
