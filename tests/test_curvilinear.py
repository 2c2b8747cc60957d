"""CurvilinearGrid (orthogonal-spherical-shell machinery) tests: SBP energy
identity and full EVP stepping on a warped 2-D-metric grid."""

import numpy as np
import pytest

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.grids import CurvilinearGrid
from climaseaice_jl_tpu.state import ModelFields
from climaseaice_jl_tpu.dynamics.rheologies import (
    stress_divergence, strain_rate_xx, strain_rate_yy, strain_rate_xy,
    ElastoViscoPlasticRheology)


def _warped_corners(Nx=24, Ny=20):
    """A smoothly warped spherical patch: lat-lon nodes with a sinusoidal
    shear so every metric array is genuinely 2-D."""
    i = np.arange(Nx + 1)[:, None]
    j = np.arange(Ny + 1)[None, :]
    lam = 360.0 * i / Nx + 4.0 * np.sin(2 * np.pi * j / Ny)
    phi = 30.0 + 40.0 * j / Ny + 3.0 * np.sin(2 * np.pi * i / Nx) * (j / Ny)
    # close the periodic seam: the last column is the first shifted by 360°
    lam[-1] = lam[0] + 360.0
    phi[-1] = phi[0]
    return lam, phi


def test_curvilinear_metrics_positive():
    lam, phi = _warped_corners()
    grid = CurvilinearGrid(lam, phi)
    for name in ("dx_cc", "dx_fc", "dx_cf", "dx_ff",
                 "dy_cc", "dy_fc", "dy_cf", "dy_ff",
                 "az_cc", "az_fc", "az_cf", "az_ff"):
        m = np.asarray(getattr(grid, name))
        assert m.shape == grid.shape
        assert (m > 0).all(), name


def test_sbp_adjointness_on_warped_grid():
    """The invariant-form stress divergence is the exact discrete adjoint of
    the strain-rate operator for ANY positive metric set — verify on fully
    2-D curvilinear metrics (extends test_rheology_energy_budget.py)."""
    lam, phi = _warped_corners(32, 28)
    grid = CurvilinearGrid(lam, phi)
    H, Nx, Ny = grid.Hx, grid.Nx, grid.Ny
    rng = np.random.default_rng(3)

    def interior_only(margin=3):
        q = np.zeros(grid.shape)
        q[H + margin:H + Nx - margin, H + margin:H + Ny - margin] = rng.random(
            (Nx - 2 * margin, Ny - 2 * margin))
        return q

    u, v = interior_only(), interior_only()
    s11, s22, s12 = interior_only(), interior_only(), interior_only()

    fields = ModelFields(u=u, v=v, sig11=s11, sig22=s22, sig12=s12)
    div_x, div_y = stress_divergence(ElastoViscoPlasticRheology(), grid, fields)

    I = grid.interior
    bc = lambda name: np.broadcast_to(np.asarray(getattr(grid, name)), grid.shape)
    W = float((I(u) * I(np.asarray(div_x)) * I(bc("az_fc"))).sum()
              + (I(v) * I(np.asarray(div_y)) * I(bc("az_cf"))).sum())
    e11 = np.asarray(strain_rate_xx(grid, u, v))
    e22 = np.asarray(strain_rate_yy(grid, u, v))
    e12 = np.asarray(strain_rate_xy(grid, u, v))
    D = float((I(s11) * I(e11) * I(bc("az_cc"))).sum()
              + (I(s22) * I(e22) * I(bc("az_cc"))).sum()
              + 2 * (I(s12) * I(e12) * I(bc("az_ff"))).sum())
    assert abs(W + D) / max(abs(W), abs(D)) < 1e-12


def test_evp_steps_on_curvilinear_grid():
    lam, phi = _warped_corners()
    grid = CurvilinearGrid(lam, phi, halo=4)
    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(),
        top_momentum_stress={"u": 0.05, "v": 0.0},
        bottom_momentum_stress=csi.SemiImplicitStress(),
        solver=csi.SplitExplicitSolver(substeps=8))
    model = csi.sea_ice_model(grid, dynamics=dynamics,
                              ice_thermodynamics=csi.sea_ice_slab_thermodynamics(),
                              top_heat_flux=-20.0, bottom_heat_flux=-5.0,
                              advection=csi.WENO(order=5))
    state = csi.initial_state(model, h=1.0, a=1.0)
    for _ in range(5):
        state = csi.step(model, state, 300.0)
    I = grid.interior
    for name in ("u", "v", "h", "a"):
        assert np.isfinite(np.asarray(I(getattr(state, name)))).all(), name
    assert np.abs(np.asarray(I(state.u))).max() < 1.0
