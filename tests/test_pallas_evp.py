"""Fused Pallas EVP kernel vs the general jnp path (interpret mode on CPU)."""

import numpy as np
import pytest

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.dynamics.pallas_evp import fused_available


def _build(fused, substeps=10, P_star=27.5):
    """Soft ice (P★ small) keeps the αEVP relaxation contractive so the fused
    and jnp paths track each other to float32 accuracy; with the default
    P★ = 27500 the Δ→Δ_min regime amplifies f32 roundoff ~30×/substep and no
    two formulations agree tightly (see tests/test_distributed.py notes)."""
    km = 1000.0
    grid = csi.RectilinearGrid(size=(16, 128), x=(0, 100 * km), y=(0, 100 * km),
                               halo=5, dtype="float32",
                               topology=("periodic", "periodic"))
    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=P_star),
        coriolis=csi.FPlane(f=1e-4),
        top_momentum_stress={"u": 0.05, "v": 0.02},
        bottom_momentum_stress=csi.SemiImplicitStress(ue=0.1, ve=-0.05),
        solver=csi.SplitExplicitSolver(substeps=substeps, fused=fused))
    model = csi.sea_ice_model(grid, dynamics=dynamics, ice_thermodynamics=None,
                              advection=csi.WENO(order=5),
                              timestepper="ForwardEuler")

    def h0(x, y):
        return 0.5 + 0.2 * np.sin(2 * np.pi * x / (100 * km)) * np.cos(2 * np.pi * y / (100 * km))

    state = csi.initial_state(model, h=h0, a=1.0, u=0.02)
    return model, state


def test_fused_available():
    model, _ = _build("auto")
    assert fused_available(model)
    # bounded topology → not available
    grid_b = csi.RectilinearGrid(size=(16, 128), dtype="float32",
                                 topology=("bounded", "periodic"))
    model_b = model.evolve(grid=grid_b)
    assert not fused_available(model_b)


def test_fused_matches_jnp_path():
    model_f, state_f = _build("always")
    model_j, state_j = _build("never")

    for _ in range(3):
        state_f = csi.step(model_f, state_f, 60.0)
        state_j = csi.step(model_j, state_j, 60.0)

    I = model_f.grid.interior
    for name, tol in (("u", 1e-4), ("v", 1e-4), ("h", 1e-5), ("a", 1e-5),
                      ("sig11", 1e-3), ("sig12", 1e-3), ("alpha", 1e-3)):
        a = np.asarray(I(getattr(state_f, name)))
        b = np.asarray(I(getattr(state_j, name)))
        scale = max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() / scale < tol, \
            f"{name}: rel diff {np.abs(a - b).max() / scale}"


def test_fused_stiff_regime_stays_physical():
    """Default P★ (stiff regime): fused and jnp trajectories can't agree to
    roundoff, but must stay finite and physically close."""
    model_f, state_f = _build("always", P_star=27500.0)
    model_j, state_j = _build("never", P_star=27500.0)
    for _ in range(3):
        state_f = csi.step(model_f, state_f, 60.0)
        state_j = csi.step(model_j, state_j, 60.0)
    I = model_f.grid.interior
    for name, tol in (("u", 5e-2), ("h", 1e-2)):
        a = np.asarray(I(getattr(state_f, name)))
        b = np.asarray(I(getattr(state_j, name)))
        assert np.isfinite(a).all()
        assert np.abs(a - b).max() < tol * max(np.abs(b).max(), 1.0)
