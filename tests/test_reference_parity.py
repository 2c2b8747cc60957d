"""Reference-trajectory parity (VERDICT r1 item 5).

No Julia exists in this environment, so reference trajectories are obtained
from two independent oracles rather than recorded output:

1. A standalone NumPy transcription of the reference's *discrete update
   formulas* (`slab_thermodynamics_tendencies.jl:28-68`,
   `thermodynamic_time_step.jl:304-324,358-370`) — written directly from the
   Julia math, sharing no code with the framework.  The framework trajectory
   must match it allclose at every step.

2. The continuum Stefan square-root law h(t) = sqrt(h0² + 2kΔT·t/(ρᵢℒ)),
   which the discrete trajectory must converge to.

A third guard freezes the `ice_advected_by_anticyclone`-style dynamic config
against golden data generated once in float64 (regression vs this repo's own
verified state, since no external data source exists here).
"""

import numpy as np
import pytest

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.model import _step
from climaseaice_jl_tpu.state import Clock

minute = 60.0
day = 86400.0


# --- Independent NumPy oracle of the reference column recurrence ----------

def latent_heat_ref(T, L0=334e3, rho_i=917.0, c_i=2000.0,
                    rho_l=999.8, c_l=4186.0, T0=0.0):
    """`SeaIceThermodynamics.jl:161-170`: ℒ(T) = ℒ₀ + (ρℓcℓ/ρᵢ − cᵢ)(T−T₀)."""
    return L0 + (rho_l * c_l / rho_i - c_i) * (T - T0)


def freezing_bucket_oracle(n_steps, dt, *, Tu=-10.0, k=2.0, rho_ice=900.0,
                           c_i=2100.0, hc=0.05, h0=0.0, a0=0.0):
    """Discrete trajectory of the freezing-bucket config, transcribed from
    `slab_thermodynamics_tendencies.jl:50-64` (wu, wb) and
    `thermodynamic_time_step.jl:304-324,358-370` (volume/concentration
    update).  Bottom flux is the example's frazil flux −(1−ℵ)."""
    h, a = h0, a0
    Tb = 0.0  # melting_temperature(LinearLiquidus, S=0)
    hs, aas = [h], [a]
    for _ in range(n_steps):
        consolidated = h >= hc
        Eu = rho_ice * latent_heat_ref(Tu, c_i=c_i)
        Eb = rho_ice * latent_heat_ref(Tb, c_i=c_i)
        Qii = -k * (Tu - Tb) / h if (consolidated and h > 0) else 0.0
        # With PrescribedTemperature and no user-supplied top flux, the model
        # wires the default top external flux to the internal conductive flux
        # (`sea_ice_model.jl:243-257`), so the top interface is in equilibrium.
        Qui = Qii
        Qbi = -(1.0 - a)     # frazil-ice formation flux
        wu = (Qui - Qii) / Eu
        wb = (Qii - Qbi) / Eb
        dVdt = wu + wb

        # ice_volume_update
        V1 = max(0.0, h * a + dt * dVdt)
        dVdt = (V1 - h * a) / dt
        if dVdt >= 0:
            ap = a + dt * (1 - a) / hc * dVdt
        else:
            ap = a + dt * a / (2 * h) * dVdt if h > 0 else a
        ap = max(0.0, ap)
        hp = V1 / ap if ap > 0 else 0.0
        if dVdt == 0:
            hp, ap = h, a
        if hp == 0:
            ap = 0.0
        if ap == 0:
            hp = 0.0
        if ap > 1:
            hp, ap = hp * ap, 1.0
        h, a = hp, ap
        hs.append(h)
        aas.append(a)
    return np.array(hs), np.array(aas)


def build_bucket():
    grid = csi.RectilinearGrid(size=())
    thermo = csi.SlabThermodynamics(
        top_heat_bc=csi.PrescribedTemperature(-10.0),
        internal_heat_flux=csi.ConductiveFlux(conductivity=2.0))

    def frazil(grid, Tu, clock, fields):
        return -(1 - fields.a)

    model = csi.sea_ice_model(
        grid, ice_thermodynamics=thermo,
        phase_transitions=csi.PhaseTransitions(heat_capacity=2100.0),
        sea_ice_density=900.0,
        bottom_heat_flux=csi.FluxFunction(func=frazil))
    return model, csi.initial_state(model)


def test_freezing_bucket_matches_reference_recurrence():
    """Framework trajectory ≡ the transcribed reference recurrence, every
    step of 10 simulated days (`examples/freezing_bucket.jl:99-118`)."""
    dt = 10 * minute
    n = int(10 * day / dt)
    model, state = build_bucket()

    h_traj = [float(state.h[0, 0])]
    a_traj = [float(state.a[0, 0])]
    for _ in range(n):
        state = _step(model, state, dt)
        h_traj.append(float(state.h[0, 0]))
        a_traj.append(float(state.a[0, 0]))

    h_ref, a_ref = freezing_bucket_oracle(n, dt)
    np.testing.assert_allclose(h_traj, h_ref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(a_traj, a_ref, rtol=1e-10, atol=1e-12)


def test_freezing_bucket_stefan_law():
    """Once consolidated with ℵ≈1, thickness follows the continuum Stefan
    law dh/dt ∝ 1/h ⇒ h² grows linearly (reference docs
    `docs/src/physics/thermodynamics.md:13-18`)."""
    dt = 10 * minute
    n = int(10 * day / dt)
    h_ref, a_ref = freezing_bucket_oracle(n, dt)
    t = np.arange(n + 1) * dt

    # restrict to the consolidated, fully-covered regime
    sel = (a_ref > 0.99) & (h_ref > 0.1)
    ts, hs = t[sel], h_ref[sel]
    # dh²/dt should be constant: fit and check small residual
    coef = np.polyfit(ts, hs ** 2, 1)
    resid = hs ** 2 - np.polyval(coef, ts)
    assert np.max(np.abs(resid)) < 5e-3 * (hs.max() ** 2 - hs.min() ** 2)
    # growth-rate magnitude ≈ 2kΔT/(ρℒ_b) within the frazil/ℒ(T) corrections
    rho, k, dT = 900.0, 2.0, 10.0
    expected = 2 * k * dT / (rho * latent_heat_ref(0.0, c_i=2100.0))
    assert 0.9 * expected < coef[0] < 1.1 * expected


# --- Golden-trajectory regression for the dynamic config -------------------

def _anticyclone_model(N=32, dtype="float64"):
    km = 1000.0
    grid = csi.RectilinearGrid(size=(N, N), x=(0, 256 * km), y=(0, 256 * km),
                               halo=5, dtype=dtype,
                               topology=("periodic", "periodic"))
    dyn = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(),
        coriolis=csi.FPlane(f=1.4e-4),
        top_momentum_stress={"u": 0.1, "v": -0.1},
        bottom_momentum_stress=csi.SemiImplicitStress(),
        solver=csi.SplitExplicitSolver(substeps=24))
    model = csi.sea_ice_model(grid, dynamics=dyn, advection=csi.WENO(order=5),
                              timestepper="ForwardEuler")

    def h0(x, y):
        return (1.0 + 0.3 * np.sin(2 * np.pi * x / (256 * km))
                * np.cos(2 * np.pi * y / (256 * km)))

    state = csi.initial_state(model, h=h0, a=1.0)
    return model, state


GOLDEN = "tests/data/anticyclone_golden.npz"


def test_anticyclone_golden_trajectory():
    """20-step f64 EVP+WENO5 trajectory frozen as golden data: guards every
    numerical refactor of the dynamics/advection stack bit-for-bit-ish
    (`distributed_tests_utils.jl:40-88` uses the same 20-step contract)."""
    import os
    model, state = _anticyclone_model()
    dt = 120.0
    for _ in range(20):
        state = _step(model, state, dt)
    fields = {k: np.asarray(getattr(state, k)) for k in ("u", "v", "h", "a")}

    if not os.path.exists(GOLDEN):  # pragma: no cover - first generation
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **fields)
        pytest.skip("golden data generated; rerun to compare")

    ref = np.load(GOLDEN)
    for k, v in fields.items():
        np.testing.assert_allclose(v, ref[k], rtol=1e-9, atol=1e-11,
                                   err_msg=f"field {k} diverged from golden")
