"""Ice advected by an anticyclone: 2-D EVP dynamics + WENO-7 advection.

Port of `examples/ice_advected_by_anticyclone.jl`: a translating anticyclonic
wind stress over a linear ocean-drag field on a 512 km bounded box,
128×128 grid, split-explicit αEVP, Δt = 2 min, 2 days.

The reference refreshes the wind-stress Fields once per iteration with a
host-side callback (`ice_advected_by_anticyclone.jl:97-116`); here the wind
is a :class:`~climaseaice_jl_tpu.StressFunction` evaluated *inside* the
jitted step — the translating anticyclone is recomputed on device from
``clock.time`` with zero per-step host work.
"""

import jax.numpy as jnp
import numpy as np

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu import step as model_step

km, minute, day = 1000.0, 60.0, 86400.0
L = 512 * km
v_ocean = 0.01   # m/s max ocean speed
v_atmos = 30.0   # m/s atmospheric speed modifier


def wind_velocity(x, y, t):
    center = 256 * km + 51.2 * km * t / day
    r = jnp.sqrt((x - center) ** 2 + (y - center) ** 2)
    s = 1 / 100 * jnp.exp(-r / (100 * km))
    cosd, sind = np.cos(np.deg2rad(72)), np.sin(np.deg2rad(72))
    ua = -v_atmos * s * (cosd * (x - center) + sind * (y - center)) / 1000
    va = -v_atmos * s * (-sind * (x - center) + cosd * (y - center)) / 1000
    return ua, va


def _wind_stress(x, y, t, comp):
    """τₐ = −ρₐ Cᴰ |Uₐ| Uₐ at the given points (traced; t = clock.time)."""
    ua, va = wind_velocity(x, y, t)
    C = 1.3 * 1.2e-3
    w = ua if comp == "u" else va
    return -w * jnp.sqrt(ua ** 2 + va ** 2) * C


def wind_stress_u(grid, clock, fields):
    x = jnp.asarray(grid.xf)[:, None]
    y = jnp.asarray(grid.yc)[None, :]
    return jnp.broadcast_to(_wind_stress(x, y, clock.time, "u"), grid.shape)


def wind_stress_v(grid, clock, fields):
    x = jnp.asarray(grid.xc)[:, None]
    y = jnp.asarray(grid.yf)[None, :]
    return jnp.broadcast_to(_wind_stress(x, y, clock.time, "v"), grid.shape)


def build(N=128, substeps=150, dtype="float64"):
    grid = csi.RectilinearGrid(size=(N, N), x=(0, L), y=(0, L), halo=7,
                               topology=("bounded", "bounded"), dtype=dtype)

    # linear ocean velocity field (anticyclonic shear)
    xf = np.asarray(grid.xf)[:, None]
    xc = np.asarray(grid.xc)[:, None]
    yc = np.asarray(grid.yc)[None, :]
    yf = np.asarray(grid.yf)[None, :]
    Uo = np.broadcast_to(v_ocean * (2 * yc - L) / L, grid.shape).astype(grid.np_dtype)
    Vo = np.broadcast_to(v_ocean * (L - 2 * xc) / L, grid.shape).astype(grid.np_dtype)
    tau_o = csi.SemiImplicitStress(ue=Uo, ve=Vo)

    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(),
        coriolis=csi.FPlane(f=1e-4),
        top_momentum_stress={"u": csi.StressFunction(func=wind_stress_u),
                             "v": csi.StressFunction(func=wind_stress_v)},
        bottom_momentum_stress=tau_o,
        solver=csi.SplitExplicitSolver(substeps=substeps))

    model = csi.sea_ice_model(grid, dynamics=dynamics, ice_thermodynamics=None,
                              advection=csi.WENO(order=7),
                              timestepper="SplitRungeKutta3")

    def h0(x, y):
        return 0.3 + 0.005 * (np.sin(60 * x / (1000 * km)) + np.sin(30 * y / (1000 * km)))

    state = csi.initial_state(model, h=h0, a=1.0)
    return model, state


def main(stop_days=2.0, N=128, substeps=150, save_every=60):
    model, state = build(N, substeps)
    dt = 2 * minute
    nsteps = int(stop_days * day / dt)
    snapshots = []
    for n in range(nsteps):
        t = float(state.clock.time)
        state = model_step(model, state, dt)
        if n % save_every == 0:
            I = model.grid.interior
            snapshots.append(dict(t=t,
                                  h=np.asarray(I(state.h)).copy(),
                                  a=np.asarray(I(state.a)).copy(),
                                  u=np.asarray(I(state.u)).copy(),
                                  v=np.asarray(I(state.v)).copy()))
    np.savez("ice_advected_by_anticyclone.npz",
             t=np.array([s["t"] for s in snapshots]),
             h=np.stack([s["h"] for s in snapshots]),
             u=np.stack([s["u"] for s in snapshots]))
    hf = snapshots[-1]["h"]
    print(f"final: h ∈ [{hf.min():.3f}, {hf.max():.3f}] m, "
          f"max |u| = {np.abs(snapshots[-1]['u']).max():.3f} m/s")
    return model, state


if __name__ == "__main__":
    main()
