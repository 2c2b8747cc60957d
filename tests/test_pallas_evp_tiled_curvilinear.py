"""Tiled curvilinear fused EVP kernel vs the jnp path (interpret mode, CPU).

The tier that runs the flagship north-star workload (large land-masked
tripolar grids, serial or wide-halo-meshed).  Unlike the whole-array
curvilinear kernel it does not re-impose the Zipper fold per substep: the
fold halo *self-evolves* (exact mirror arithmetic), so these tests are the
guard on that invariant — any fold-asymmetric input shows up as a
seam-adjacent mismatch vs the jnp path.
"""

import numpy as np
import pytest

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.grids import CurvilinearGrid
from climaseaice_jl_tpu.dynamics.momentum import split_explicit_momentum_step
from climaseaice_jl_tpu.dynamics.pallas_evp_tiled_curvilinear import (
    tiled_curvilinear_available, tiled_curvilinear_momentum_step)

km = 1000.0


def _dynamics(substeps, drag=None, fused="never"):
    return csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=27.5),
        coriolis=csi.FPlane(f=1.2e-4),
        top_momentum_stress={"u": 0.05, "v": 0.02},
        bottom_momentum_stress=csi.SemiImplicitStress(ue=0.08, ve=-0.04),
        immersed_drag=drag,
        solver=csi.SplitExplicitSolver(substeps=substeps, fused=fused))


def _tripolar_grid(N=24, land=True):
    grid = csi.TripolarGrid((N, N), southernmost_latitude=-70.0, halo=5,
                            dtype="float32")
    if land:
        Nx, Ny = grid.Nx, grid.Ny
        mask = np.zeros((Nx, Ny), bool)
        mask[:, :2] = True
        mask[N // 3:N // 2, 3 * N // 4:] = True  # landmass into the fold
        grid = csi.ImmersedBoundaryGrid(grid, mask)
    return grid


def _rect_fold_grid(N=24):
    return csi.RectilinearGrid(size=(N, N), x=(0, 100 * km), y=(0, 100 * km),
                               halo=5, topology=("periodic", "bounded"),
                               north_fold=True, dtype="float32")


def _warped_grid(N=24):
    i = np.arange(N + 1)[:, None]
    j = np.arange(N + 1)[None, :]
    lam = 360.0 * i / N + 4.0 * np.sin(2 * np.pi * j / N)
    phi = 20.0 + 40.0 * j / N + 3.0 * np.sin(2 * np.pi * i / N) * (j / N)
    lam[-1] = lam[0] + 360.0
    phi[-1] = phi[0]
    return CurvilinearGrid(lam, phi, halo=5, dtype="float32")


def _compare_momentum(grid, substeps, drag=None,
                      tols=(("u", 2e-4), ("v", 2e-4),
                            ("sig11", 2e-3), ("sig12", 2e-3),
                            ("alpha", 2e-3))):
    model = csi.sea_ice_model(grid, dynamics=_dynamics(substeps, drag),
                              ice_thermodynamics=None,
                              advection=csi.WENO(order=5),
                              timestepper="ForwardEuler")
    assert tiled_curvilinear_available(model)
    rng = np.random.default_rng(3)
    state = csi.initial_state(model, h=0.5 + 0.1 * rng.random((grid.Nx, grid.Ny)),
                              a=1.0, u=0.05)
    upd_j = split_explicit_momentum_step(model, state, 60.0, state.u, state.v)
    upd_t = tiled_curvilinear_momentum_step(model, state, 60.0,
                                            state.u, state.v, interpret=True)
    I = grid.interior
    for name, tol in tols:
        a = np.asarray(I(upd_t[name]))
        b = np.asarray(I(upd_j[name]))
        assert np.isfinite(a).all(), name
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-8)
        assert err < tol, (name, err)


def test_availability_gates():
    model = csi.sea_ice_model(_tripolar_grid(), dynamics=_dynamics(12),
                              ice_thermodynamics=None,
                              advection=csi.WENO(order=5),
                              timestepper="ForwardEuler")
    assert tiled_curvilinear_available(model)
    # plain rectilinear: the rectilinear tiers own it
    rect = csi.RectilinearGrid(size=(16, 16), x=(0, 1e5), y=(0, 1e5),
                               halo=5, dtype="float32")
    m2 = csi.sea_ice_model(rect, dynamics=_dynamics(12),
                           ice_thermodynamics=None,
                           advection=csi.WENO(order=5),
                           timestepper="ForwardEuler")
    assert not tiled_curvilinear_available(m2)
    # prime substep count beyond the chunk cap (_CHUNK_CAP = 24): no K
    m3 = csi.sea_ice_model(_tripolar_grid(), dynamics=_dynamics(29),
                           ice_thermodynamics=None,
                           advection=csi.WENO(order=5),
                           timestepper="ForwardEuler")
    assert not tiled_curvilinear_available(m3)


@pytest.mark.parametrize("substeps", [12, 24])
def test_tripolar_immersed_matches_jnp(substeps):
    """Fold self-evolution across one and several chunks (K=12)."""
    _compare_momentum(_tripolar_grid(), substeps)


def test_tripolar_immersed_drag_matches_jnp():
    _compare_momentum(_tripolar_grid(), 12, drag=csi.ImmersedDrag(3e-3))


def test_rect_fold_matches_jnp():
    """Uniform metrics isolate the fold machinery from metric symmetry."""
    _compare_momentum(_rect_fold_grid(), 12)


@pytest.mark.parametrize("substeps", [9, 27])
def test_odd_chunk_parity(substeps):
    """Odd K (9): alternating chunk-base parity, incl. a trailing chunk."""
    _compare_momentum(_rect_fold_grid(), substeps)


def test_warped_curvilinear_matches_jnp():
    """Array metrics without a fold: bounded-y walls re-imposed in-kernel."""
    _compare_momentum(_warped_grid(), 12)


def test_solid_row_crop_matches_jnp():
    """Deep fully-solid southern band ⇒ the tiler crops those rows outright
    (the flagship basin's 45–58°N closure is 468/960 such rows).  Equality
    vs the jnp path must hold INCLUDING the cropped rows, whose outputs are
    reconstructed as u = v = 0, σ = carry, α = a_max (frozen-land
    invariant, _solid_crop_rows docstring)."""
    from climaseaice_jl_tpu.dynamics.pallas_evp_tiled_curvilinear import (
        _solid_crop_rows, _crop_y_lo)

    N = 32
    grid = csi.TripolarGrid((N, N), southernmost_latitude=-70.0, halo=5,
                            dtype="float32")
    mask = np.zeros((N, N), bool)
    mask[:, :12] = True                      # deep fully-solid south band
    mask[N // 3:N // 2, 3 * N // 4:] = True  # landmass into the fold
    grid = csi.ImmersedBoundaryGrid(grid, mask)
    model = csi.sea_ice_model(grid, dynamics=_dynamics(12),
                              ice_thermodynamics=None,
                              advection=csi.WENO(order=5),
                              timestepper="ForwardEuler")
    assert _solid_crop_rows(model) == 12
    assert _crop_y_lo(grid.Hy, 12) == grid.Hy + 8  # 4 margin rows kept
    _compare_momentum(grid, 12)
    # drag config exercises the wall_ff south gate under the crop
    _compare_momentum(grid, 12, drag=csi.ImmersedDrag(3e-3))


def test_latitude_coriolis_matches_jnp():
    """Real f(φ) = 2Ω sin(lat): the fused tier streams an f(φ) const plane
    and interpolates to velocity points in VMEM with the same ℑx/ℑy forms
    as coriolis.x_f_cross_U/y_f_cross_U (the reference's momentum kernels
    take any Coriolis, `momentum_tendencies_kernel_functions.jl:31,64`)."""
    grid = _tripolar_grid()
    dyn = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=27.5),
        coriolis=csi.LatitudeCoriolis(),
        top_momentum_stress={"u": 0.05, "v": 0.02},
        bottom_momentum_stress=csi.SemiImplicitStress(ue=0.08, ve=-0.04),
        solver=csi.SplitExplicitSolver(substeps=12, fused="never"))
    model = csi.sea_ice_model(grid, dynamics=dyn, ice_thermodynamics=None,
                              advection=csi.WENO(order=5),
                              timestepper="ForwardEuler")
    assert tiled_curvilinear_available(model)
    rng = np.random.default_rng(3)
    state = csi.initial_state(model,
                              h=0.5 + 0.1 * rng.random((grid.Nx, grid.Ny)),
                              a=1.0, u=0.05)
    upd_j = split_explicit_momentum_step(model, state, 60.0, state.u, state.v)
    upd_t = tiled_curvilinear_momentum_step(model, state, 60.0,
                                            state.u, state.v, interpret=True)
    I = grid.interior
    # f(φ) must actually matter: a wrong-f run (FPlane at the mean f) must
    # differ from the LatitudeCoriolis jnp result by more than the kernel tol
    for name, tol in (("u", 2e-4), ("v", 2e-4), ("sig11", 2e-3),
                      ("sig12", 2e-3), ("alpha", 2e-3)):
        a = np.asarray(I(upd_t[name]))
        b = np.asarray(I(upd_j[name]))
        assert np.isfinite(a).all(), name
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-8)
        assert err < tol, (name, err)


def test_distributed_wide_tripolar_fused_equals_serial():
    """The flagship distributed configuration: (1, 4) mesh, wide-halo EVP,
    immersed tripolar — per-shard tiled curvilinear kernels reproduce the
    serial jnp run (`distributed_tests_utils.jl:170-259` analog, fused)."""
    from climaseaice_jl_tpu.parallel import make_distributed_step
    from climaseaice_jl_tpu.parallel.stepper import strip_halos, unstrip_halos

    grid = csi.TripolarGrid((16, 64), southernmost_latitude=-70.0, halo=5,
                            dtype="float32")
    land = np.zeros((16, 64), bool)
    land[:, :2] = True
    land[5:9, 58:] = True
    grid = csi.ImmersedBoundaryGrid(grid, land)

    def build(fused, wide):
        dyn = csi.SeaIceMomentumEquation(
            rheology=csi.ElastoViscoPlasticRheology(
                ice_compressive_strength=27.5),
            top_momentum_stress={"u": 0.02, "v": 0.01},
            bottom_momentum_stress=csi.SemiImplicitStress(ue=0.05, ve=-0.02),
            solver=csi.SplitExplicitSolver(
                substeps=6, fused=fused,
                halo_exchange="wide" if wide else "per_substep"))
        model = csi.sea_ice_model(grid, dynamics=dyn, ice_thermodynamics=None,
                                  advection=csi.WENO(order=5),
                                  timestepper="ForwardEuler")
        rng = np.random.default_rng(7)
        state = csi.initial_state(model, h=0.5 + 0.1 * rng.random((16, 64)),
                                  a=1.0, u=0.05)
        return model, state

    model_j, state = build("never", wide=False)
    serial = state
    for _ in range(3):
        serial = csi.step(model_j, serial, 60.0)

    model_f, state_f = build("always", wide=True)
    dstep, _ = make_distributed_step(model_f, (1, 4))
    s = strip_halos(model_f, state_f)
    for _ in range(3):
        s = dstep(s, 60.0)
    dist = unstrip_halos(model_f, s)

    I = grid.interior
    for name, tol in (("u", 5e-4), ("v", 5e-4), ("h", 1e-5), ("a", 1e-5)):
        a = np.asarray(I(getattr(dist, name)))
        b = np.asarray(I(getattr(serial, name)))
        assert np.isfinite(a).all(), name
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-8)
        assert err < tol, (name, err)


def test_distributed_wide_xmeshed_fold_fused_equals_serial():
    """x-meshed fold, fused: on a (2, 2) mesh the Zipper fold is split
    across the x axis — no local fill can refresh it mid-loop, so the fold
    halo self-evolves through the full 2N+3 wide halo across ALL chunks
    (reference x-splitting tripolar partitions,
    `distributed_tests_utils.jl:231-257`)."""
    from climaseaice_jl_tpu.parallel import make_distributed_step
    from climaseaice_jl_tpu.parallel.stepper import strip_halos, unstrip_halos

    grid = csi.TripolarGrid((32, 64), southernmost_latitude=-70.0, halo=5,
                            dtype="float32")
    land = np.zeros((32, 64), bool)
    land[:, :2] = True
    land[10:18, 58:] = True   # landmass straddling the x-shard seam and fold
    grid = csi.ImmersedBoundaryGrid(grid, land)

    def build(fused, wide):
        dyn = csi.SeaIceMomentumEquation(
            rheology=csi.ElastoViscoPlasticRheology(
                ice_compressive_strength=27.5),
            top_momentum_stress={"u": 0.02, "v": 0.01},
            bottom_momentum_stress=csi.SemiImplicitStress(ue=0.05, ve=-0.02),
            solver=csi.SplitExplicitSolver(
                substeps=6, fused=fused,
                halo_exchange="wide" if wide else "per_substep"))
        model = csi.sea_ice_model(grid, dynamics=dyn, ice_thermodynamics=None,
                                  advection=csi.WENO(order=5),
                                  timestepper="ForwardEuler")
        rng = np.random.default_rng(7)
        state = csi.initial_state(model, h=0.5 + 0.1 * rng.random((32, 64)),
                                  a=1.0, u=0.05)
        return model, state

    model_j, state = build("never", wide=False)
    serial = state
    for _ in range(3):
        serial = csi.step(model_j, serial, 60.0)

    model_f, state_f = build("always", wide=True)
    dstep, _ = make_distributed_step(model_f, (2, 2))
    s = strip_halos(model_f, state_f)
    for _ in range(3):
        s = dstep(s, 60.0)
    dist = unstrip_halos(model_f, s)

    I = grid.interior
    for name, tol in (("u", 5e-4), ("v", 5e-4), ("h", 1e-5), ("a", 1e-5)):
        a = np.asarray(I(getattr(dist, name)))
        b = np.asarray(I(getattr(serial, name)))
        assert np.isfinite(a).all(), name
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-8)
        assert err < tol, (name, err)
