"""Curvilinear fused Pallas EVP kernel vs the jnp path (interpret mode, CPU).

Covers the three array-metric grid families the kernel unlocks: bounded-y
latitude-longitude, rectilinear-with-north-fold (isolates the in-kernel
Zipper fill against the rectilinear jnp fold), and the full tripolar grid
with masked poles + immersed drag.
"""

import numpy as np
import pytest

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.dynamics.pallas_evp_curvilinear import (
    curvilinear_fused_available)

km = 1000.0


def _dynamics(fused, substeps=10, P_star=27.5, drag=None):
    """Soft ice (P* small) keeps αEVP contractive so two f32 formulations
    track each other (see test_pallas_evp._build notes)."""
    return csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=P_star),
        coriolis=csi.FPlane(f=1.2e-4),
        top_momentum_stress={"u": 0.05, "v": 0.02},
        bottom_momentum_stress=csi.SemiImplicitStress(ue=0.08, ve=-0.04),
        immersed_drag=drag,
        solver=csi.SplitExplicitSolver(substeps=substeps, fused=fused))


def _model(grid, fused, drag=None):
    return csi.sea_ice_model(grid, dynamics=_dynamics(fused, drag=drag),
                             ice_thermodynamics=None,
                             advection=csi.WENO(order=5),
                             timestepper="ForwardEuler")


def _compare(model_f, model_j, state_f, state_j, steps=3, dt=60.0,
             tols=(("u", 2e-4), ("v", 2e-4), ("h", 1e-5), ("a", 1e-5),
                   ("sig11", 2e-3), ("sig12", 2e-3), ("alpha", 2e-3))):
    for _ in range(steps):
        state_f = csi.step(model_f, state_f, dt)
        state_j = csi.step(model_j, state_j, dt)
    I = model_f.grid.interior
    for name, tol in tols:
        a = np.asarray(I(getattr(state_f, name)))
        b = np.asarray(I(getattr(state_j, name)))
        assert np.isfinite(a).all(), name
        scale = max(np.abs(b).max(), 1e-8)
        err = np.abs(a - b).max() / scale
        assert err < tol, (name, err)
    return state_f, state_j


def test_curvilinear_availability_gates():
    grid = csi.TripolarGrid((16, 16), southernmost_latitude=40.0,
                            halo=4, dtype="float32")
    model = _model(grid, "always")
    assert curvilinear_fused_available(model)
    # rectilinear without fold: the cheaper rectilinear tiers own it
    rect = csi.RectilinearGrid(size=(16, 16), x=(0, 10 * km), y=(0, 10 * km),
                               halo=4, dtype="float32",
                               topology=("periodic", "bounded"))
    assert not curvilinear_fused_available(model.evolve(grid=rect))
    # float64 → jnp path
    g64 = csi.TripolarGrid((16, 16), southernmost_latitude=40.0, halo=4)
    assert not curvilinear_fused_available(_model(g64, "always"))


def test_latlon_bounded_matches_jnp():
    def build(fused):
        grid = csi.LatitudeLongitudeGrid((24, 16), longitude=(0, 360),
                                         latitude=(55.0, 75.0), halo=5,
                                         dtype="float32",
                                         topology=("periodic", "bounded"))
        model = _model(grid, fused)

        def h0(lon_i, lat_j):
            return 0.5 + 0.2 * np.sin(2 * np.pi * lon_i / 360.0)

        state = csi.initial_state(model, h=0.5 + 0.2 * np.sin(
            2 * np.pi * np.arange(24) / 24.0)[:, None] * np.ones((1, 16)),
            a=1.0, u=0.02)
        return model, state

    mf, sf = build("always")
    mj, sj = build("never")
    assert curvilinear_fused_available(mf)
    _compare(mf, mj, sf, sj)


def test_rectilinear_north_fold_matches_jnp():
    """Isolates the in-kernel Zipper fill: uniform metrics, fold on top."""
    def build(fused):
        grid = csi.RectilinearGrid(size=(32, 24), x=(0, 100 * km),
                                   y=(0, 80 * km), halo=5, dtype="float32",
                                   topology=("periodic", "bounded"),
                                   north_fold=True)
        model = _model(grid, fused)

        def h0(x, y):
            return 0.5 + 0.1 * np.sin(2 * np.pi * x / (100 * km)) \
                + 0.05 * np.cos(np.pi * y / (80 * km))

        state = csi.initial_state(model, h=h0, a=1.0, v=0.02)
        return model, state

    mf, sf = build("always")
    mj, sj = build("never")
    assert curvilinear_fused_available(mf)
    _compare(mf, mj, sf, sj)


@pytest.mark.parametrize("with_drag", [False, True])
def test_tripolar_immersed_matches_jnp(with_drag):
    """Full tripolar: conformal cap metrics, fold, masked poles + coast."""
    Nx, Ny = 32, 24

    def build(fused):
        grid = csi.TripolarGrid((Nx, Ny), southernmost_latitude=40.0,
                                transition_latitude=62.0, halo=5,
                                dtype="float32")
        mask = np.zeros((Nx, Ny), bool)
        mask[[0, 1, Nx - 1], Ny - 1] = True
        mask[Nx // 2 - 1:Nx // 2 + 2, Ny - 1] = True
        mask[5:9, 3:7] = True           # a coastal block in the lat-lon zone
        grid = csi.ImmersedBoundaryGrid(grid, mask)
        drag = csi.ImmersedDrag(coefficient=3e-3) if with_drag else None
        model = _model(grid, fused, drag=drag)
        rng = np.random.default_rng(7)
        state = csi.initial_state(model, h=0.8 + 0.1 * rng.random((Nx, Ny)),
                                  a=1.0, u=0.02)
        return model, state

    mf, sf = build("always")
    mj, sj = build("never")
    assert curvilinear_fused_available(mf)
    sf, sj = _compare(mf, mj, sf, sj)
    # land stays at rest through the fused path too
    I = mf.grid.interior
    land = np.asarray(I(mf.grid.solid_cc))
    assert (np.asarray(I(sf.h))[land] == 0).all()
