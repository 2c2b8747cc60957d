"""Enthalpy-method column model tests (analog of the reference's enthalpy
test group; `src/EnthalpyMethodSeaIceModel.jl`)."""

import numpy as np
import jax.numpy as jnp

from climaseaice_jl_tpu import enthalpy as em


def test_construction_and_set():
    grid = em.ZGrid(Nz=20, z0=-1.0, z1=0.0)
    model = em.EnthalpyMethodSeaIceModel(grid=grid)
    state = em.initial_state(model, T=lambda z: -5.0 + 0 * z)
    T = np.asarray(grid.interior(state.T))
    np.testing.assert_allclose(T, -5.0)
    # ϕ = 1 where T < 0 (reference behavior)
    np.testing.assert_allclose(np.asarray(grid.interior(state.phi)), 1.0)


def test_diffusion_conserves_enthalpy_no_flux():
    """With zero-flux BCs, total enthalpy is conserved."""
    grid = em.ZGrid(Nz=16)
    model = em.EnthalpyMethodSeaIceModel(
        grid=grid,
        top_T_bc=em.FluxBoundaryCondition(0.0),
        bottom_T_bc=em.FluxBoundaryCondition(0.0))
    state = em.initial_state(model, T=lambda z: np.where(z > -0.5, 2.0, -3.0))
    H0 = float(np.asarray(grid.interior(state.H)).sum())
    for _ in range(500):
        state = em.step(model, state, 60.0)
    H1 = float(np.asarray(grid.interior(state.H)).sum())
    assert abs(H1 - H0) < 1e-10 * max(1.0, abs(H0))


def test_dirichlet_cooling_freezes_column():
    """Cold lid propagates downward: top cells drop below freezing."""
    grid = em.ZGrid(Nz=20)
    model = em.EnthalpyMethodSeaIceModel(
        grid=grid,
        top_T_bc=em.ValueBoundaryCondition(-10.0),
        bottom_T_bc=em.ValueBoundaryCondition(1.0))
    state = em.initial_state(model, T=lambda z: 1.0 + 0 * z)
    for _ in range(2000):
        state = em.step(model, state, 60.0)
    T = np.asarray(grid.interior(state.T))
    assert T[-1] < 0          # top cell froze
    assert T[0] > 0           # bottom still warm
    assert np.all(np.diff(T) <= 1e-9)  # monotone profile... cooling from top


def test_time_varying_bc():
    grid = em.ZGrid(Nz=10)
    day = 86400.0
    model = em.EnthalpyMethodSeaIceModel(
        grid=grid,
        top_T_bc=em.ValueBoundaryCondition(lambda t: -5.0 + 5 * jnp.sin(2 * np.pi * t / day)),
        bottom_T_bc=em.ValueBoundaryCondition(1.1))
    state = em.initial_state(model, T=lambda z: 1.1 + 0 * z)
    for _ in range(100):
        state = em.step(model, state, 60.0)
    assert np.isfinite(np.asarray(state.T)).all()
    assert int(state.clock.iteration) == 100


def test_batched_columns_xyz():
    """Batched (x, y, z) columns evolve identically to independent 1-D runs
    (`EnthalpyMethodSeaIceModel.jl` :xyz launch analog)."""
    grid = em.ZGrid(Nz=12)
    model = em.EnthalpyMethodSeaIceModel(
        grid=grid,
        top_T_bc=em.ValueBoundaryCondition(-8.0),
        bottom_T_bc=em.ValueBoundaryCondition(1.0))

    batched = em.initial_state(model, T=lambda z: 1.0 + 0 * z, columns=(3, 2))
    single = em.initial_state(model, T=lambda z: 1.0 + 0 * z)
    assert batched.T.shape == (3, 2, 14)
    for _ in range(200):
        batched = em.step(model, batched, 60.0)
        single = em.step(model, single, 60.0)
    Tb = np.asarray(grid.interior(batched.T))
    Ts = np.asarray(grid.interior(single.T))
    for i in range(3):
        for j in range(2):
            np.testing.assert_allclose(Tb[i, j], Ts, rtol=1e-12)
