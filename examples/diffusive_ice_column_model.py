"""Diffusive ice column: 1-D vertical enthalpy-method model with time-varying
Dirichlet temperature BCs.

Port of `examples/diffusive_ice_column_model.jl`: 20 points over 1 m, daily
oscillating + cooling top temperature, linearly cooling bottom temperature.
"""

import numpy as np
import jax.numpy as jnp

from climaseaice_jl_tpu import enthalpy as em

minute, day = 60.0, 86400.0


def build():
    grid = em.ZGrid(Nz=20, z0=-1.0, z1=0.0)
    closure = em.MolecularDiffusivity(kappa_ice=1e-5, kappa_water=1e-6)

    def air_ice_temperature(t):
        return -0.5 / day * t + 5 * jnp.sin(2 * np.pi * t / day) + (-5.0)

    def ice_ocean_temperature(t):
        return -0.1 / day * t + 1.1

    model = em.EnthalpyMethodSeaIceModel(
        grid=grid, closure=closure,
        top_T_bc=em.ValueBoundaryCondition(air_ice_temperature),
        bottom_T_bc=em.ValueBoundaryCondition(ice_ocean_temperature))
    state = em.initial_state(model, T=lambda z: 1.1 + 0.0 * z)
    return model, state


def main():
    model, state = build()
    dt = 100.0  # κ Δt/Δz² ≤ 0.4: explicit-Euler diffusion stability
    nsteps = int(10 * day / dt)
    times, profiles = [], []
    for n in range(nsteps):
        state = em.step(model, state, dt)
        if n % 216 == 0:
            times.append(float(state.clock.time))
            profiles.append(np.asarray(model.grid.interior(state.T)).copy())

    T = np.stack(profiles)
    np.savez("diffusive_ice_column.npz", t=np.array(times), T=T,
             z=model.grid.zc())
    frozen = (T[-1] < 0).sum()
    print(f"final: {frozen}/{model.grid.Nz} cells below freezing; "
          f"T_top = {T[-1, -1]:.2f} °C, T_bottom = {T[-1, 0]:.2f} °C")
    return times, T


if __name__ == "__main__":
    main()
