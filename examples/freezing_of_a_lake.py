"""Freezing of a lake: coupled ice + prognostic lake temperature columns.

Port of `examples/freezing_of_a_lake.jl`: four columns with different air
temperatures over a 10 m lake; sensible heat flux atop, and a bottom flux
that advances the lake temperature (cooling from the atmosphere where open
water, frazil flux when the lake hits the freezing point).

The reference mutates parameter arrays inside flux functions; functionally
the lake temperature lives in ``state.tracers['T_lake']`` and its update
rides the bottom FluxFunction evaluation.
"""

import numpy as np
import jax.numpy as jnp

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.simulation import Simulation, Callback

minute, day = 60.0, 86400.0

ATM = dict(Cs=1e-3, rho_a=1.225, c_a=1004.0, u_a=5.0)
LAKE = dict(rho=1000.0, c=4000.0, depth=10.0)
T_ATMOS = np.array([-20.0, -10.0, -5.0, 0.0])[:, None]


def sensible_heat_flux(grid, Tu, clock, fields, Ta):
    q = ATM["Cs"] * ATM["rho_a"] * ATM["c_a"] * ATM["u_a"] * (Tu - Ta)
    return jnp.where(fields.a == 0, 0.0, q) * fields.a


def lake_frazil_flux(grid, Tu, clock, fields, Ta):
    """Bottom flux: when the (tracked) lake is at freezing, cooling goes into
    frazil ice formation over open water."""
    T_lake = fields.tracers["T_lake"]
    atmos_lake_flux = ATM["Cs"] * ATM["rho_a"] * ATM["c_a"] * ATM["u_a"] * (T_lake - Ta)
    open_water = 1 - fields.a
    freezing = T_lake <= 0.0
    return jnp.where(freezing, atmos_lake_flux * open_water, 0.0)


def build():
    grid = csi.RectilinearGrid(size=(4,), topology=("periodic", "flat"))
    Ta = grid.field_from(T_ATMOS)  # padded per-column atmosphere temperature
    top = csi.FluxFunction(func=sensible_heat_flux, parameters=Ta,
                           top_temperature_dependent=True)
    bottom = csi.FluxFunction(func=lake_frazil_flux, parameters=Ta)
    model = csi.sea_ice_model(grid, top_heat_flux=top, bottom_heat_flux=bottom)
    state = csi.initial_state(model, h=0.0, a=0.0,
                              tracers={"T_lake": np.broadcast_to(1.0, (4, 1))})
    return model, state


def advance_lake(model, state, dt):
    """Host-side lake energy budget: atmosphere cools the open-water fraction,
    clipped at the freezing point (the frazil flux then grows ice)."""
    g = model.grid
    T_lake = np.asarray(g.interior(state.tracers["T_lake"]))
    a = np.asarray(g.interior(state.a))
    Ta = T_ATMOS
    Q = ATM["Cs"] * ATM["rho_a"] * ATM["c_a"] * ATM["u_a"] * (T_lake - Ta) * (1 - a)
    C = LAKE["rho"] * LAKE["c"] * LAKE["depth"]
    T_new = np.maximum(T_lake - dt * Q / C, 0.0)
    tr = dict(state.tracers)
    tr["T_lake"] = g.set_interior(state.tracers["T_lake"], T_new)
    return state.evolve(tracers=tr)


def main(stop_days=40.0):
    model, state = build()
    dt = 10 * minute
    series = []
    n = 0
    while float(state.clock.time) < stop_days * day:
        state = advance_lake(model, state, dt)
        state = csi.step(model, state, dt)
        if n % 144 == 0:
            g = model.grid
            series.append((float(state.clock.time),
                           np.asarray(g.interior(state.h))[:, 0].copy(),
                           np.asarray(g.interior(state.tracers["T_lake"]))[:, 0].copy()))
        n += 1
    t = np.array([s[0] for s in series])
    h = np.stack([s[1] for s in series])
    TL = np.stack([s[2] for s in series])
    np.savez("freezing_of_a_lake.npz", t=t, h=h, T_lake=TL)
    print("final h per column:", h[-1], " lake T:", TL[-1])
    return t, h, TL


if __name__ == "__main__":
    main()
