"""Coupled ice-ocean seasonal demo (validation/ice_ocean_model analog):
a slab mixed-layer ocean under seasonal insolation grows and melts ice via
frazil formation, basal melt, and brine rejection."""

import numpy as np
import jax.numpy as jnp

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu import coupled as cp

day, year = 86400.0, 360 * 86400.0


def build():
    grid = csi.RectilinearGrid(size=(8, 8))
    ice = csi.sea_ice_model(grid, top_heat_flux=(csi.RadiativeEmission(),),
                            bottom_heat_flux=0.0, ice_salinity=5.0,
                            timestepper="ForwardEuler")
    ocean = cp.SlabOcean(mixed_layer_depth=30.0,
                         temperature_restoring_rate=1.0 / (30 * day),
                         temperature_restoring_target=-1.0)
    iom = cp.IceOceanModel(ice=ice, ocean=ocean)
    state = cp.initial_state(iom, T_ocean=-2.5, S_ocean=30.0)
    return iom, state


def main(years=2.0):
    iom, state = build()
    dt = 6 * 3600.0
    n = int(years * year / dt)
    series = []
    for k in range(n):
        # seasonal insolation cycle over open water
        t = float(state.clock.time)
        insol = -150.0 * max(0.0, np.sin(2 * np.pi * t / year))  # summer heating
        iom = iom.evolve(ocean=iom.ocean.evolve(solar_insolation=insol))
        state = cp.coupled_step(iom, state, dt)
        if k % 40 == 0:
            g = iom.ice.grid
            series.append((t / day,
                           float(np.asarray(g.interior(state.ice.h)).mean()),
                           float(np.asarray(g.interior(state.T_ocean)).mean()),
                           float(np.asarray(g.interior(state.S_ocean)).mean())))
    t, h, T, S = map(np.array, zip(*series))
    np.savez("ice_ocean_coupled.npz", t=t, h=h, T=T, S=S)
    print(f"h range over run: [{h.min():.3f}, {h.max():.3f}] m; "
          f"SST range: [{T.min():.2f}, {T.max():.2f}] °C; final S = {S[-1]:.2f}")
    return t, h, T, S


if __name__ == "__main__":
    main()
