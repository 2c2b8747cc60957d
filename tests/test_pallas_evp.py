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
    # σ/α tolerances are looser than u/v: the kernel's transcendental-lean
    # algebra (rsqrt reciprocals, 1/Δτ-form update — pallas_evp.py) agrees
    # with the jnp path to ulps per substep, but σ relaxes by 1/γ per substep
    # so ulp seeds accumulate there first (measured ≤ 1.2e-3 here).
    for name, tol in (("u", 1e-4), ("v", 1e-4), ("h", 1e-5), ("a", 1e-5),
                      ("sig11", 4e-3), ("sig12", 4e-3), ("alpha", 4e-3)):
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


def _build_square(fused, substeps=8, N=128):
    km = 1000.0
    grid = csi.RectilinearGrid(size=(N, N), x=(0, 100 * km), y=(0, 100 * km),
                               halo=5, dtype="float32",
                               topology=("periodic", "periodic"))
    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=27.5),
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


def test_tiled_kernel_bitwise_cross_plan(monkeypatch):
    """The tiled substep-chunked kernel's results are independent of the tile
    decomposition, bit for bit (same per-point ops on the same inputs; only
    the HBM staging and validity-shrinking overlap differ — they must not
    change a single bit).  One whole-array slab vs four x-slabs."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import climaseaice_jl_tpu.dynamics.pallas_evp as pe
    import climaseaice_jl_tpu.dynamics.pallas_evp_tiled as pt

    rng = np.random.default_rng(0)
    N = ny = 128
    f32 = jnp.float32
    mk = lambda s=1.0, o=0.0: jnp.asarray(rng.random((N, ny)), f32) * s + o
    m, a, P = mk(500., 100.), mk(0.5, 0.5), mk(1000., 10.)
    un, vn = mk(0.02), mk(0.02)
    u, v = un, vn
    s11, s22, s12, al = mk(0.), mk(0.), mk(0.), mk(0., 300.)
    params = (jnp.zeros(18, f32)
              .at[pe._P_DT].set(60.).at[pe._P_DX].set(1000.).at[pe._P_DY].set(1000.)
              .at[pe._P_F].set(1e-4).at[pe._P_TAUU].set(0.05).at[pe._P_TAUV].set(0.02)
              .at[pe._P_RC].set(5.0).at[pe._P_UE].set(0.1).at[pe._P_VE].set(-0.05)
              .at[pe._P_EINV2].set(0.25).at[pe._P_AMIN].set(50.).at[pe._P_AMAX].set(300.)
              .at[pe._P_CALPHA].set(9.87).at[pe._P_DMIN].set(2e-9)
              .at[pe._P_MASSMIN].set(1.0).at[pe._P_CONCMIN].set(1e-3)
              .at[pe._P_REPL].set(1.0))

    nsub = 16  # two chunks
    monkeypatch.setattr(pt, "_plan_chunks", lambda N_, ny_, ns: (8, 128, 128, 0))
    whole = pt.tiled_chunked_evp(nsub, params, m, a, P, un, vn,
                                 u, v, s11, s22, s12, al, interpret=True)
    monkeypatch.setattr(pt, "_plan_chunks", lambda N_, ny_, ns: (8, 32, 128, 0))
    tiled = pt.tiled_chunked_evp(nsub, params, m, a, P, un, vn,
                                 u, v, s11, s22, s12, al, interpret=True)
    for name, x, y in zip(("u", "v", "s11", "s22", "s12", "alpha"), whole, tiled):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)


def test_tiled_2d_kernel_bitwise_matches_slabs(monkeypatch):
    """The 2-D tiled path (y-overlap tiles, used for ny > 1024) is
    bit-identical to the full-y x-slab path on the same inputs."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import climaseaice_jl_tpu.dynamics.pallas_evp as pe
    import climaseaice_jl_tpu.dynamics.pallas_evp_tiled as pt


    rng = np.random.default_rng(1)
    N, ny = 128, 256   # → 2×2 grid of (64+2W, 128+2·64) tiles
    f32 = jnp.float32
    mk = lambda s=1.0, o=0.0: jnp.asarray(rng.random((N, ny)), f32) * s + o
    m, a, P = mk(500., 100.), mk(0.5, 0.5), mk(1000., 10.)
    un, vn = mk(0.02), mk(0.02)
    u, v = un, vn
    s11, s22, s12, al = mk(0.), mk(0.), mk(0.), mk(0., 300.)
    params = (jnp.zeros(18, f32)
              .at[pe._P_DT].set(60.).at[pe._P_DX].set(1000.).at[pe._P_DY].set(1000.)
              .at[pe._P_F].set(1e-4).at[pe._P_TAUU].set(0.05).at[pe._P_TAUV].set(0.02)
              .at[pe._P_RC].set(5.0).at[pe._P_UE].set(0.1).at[pe._P_VE].set(-0.05)
              .at[pe._P_EINV2].set(0.25).at[pe._P_AMIN].set(50.).at[pe._P_AMAX].set(300.)
              .at[pe._P_CALPHA].set(9.87).at[pe._P_DMIN].set(2e-9)
              .at[pe._P_MASSMIN].set(1.0).at[pe._P_CONCMIN].set(1e-3)
              .at[pe._P_REPL].set(1.0))

    nsub = 16
    monkeypatch.setattr(pt, "_plan_chunks", lambda N_, ny_, ns: (8, 128, 256, 0))
    slabs = pt.tiled_chunked_evp(nsub, params, m, a, P, un, vn,
                                 u, v, s11, s22, s12, al, interpret=True)
    monkeypatch.setattr(pt, "_plan_chunks", lambda N_, ny_, ns: (8, 64, 128, 64))
    tiled = pt.tiled_chunked_evp(nsub, params, m, a, P, un, vn,
                                 u, v, s11, s22, s12, al, interpret=True)
    for name, x, y in zip(("u", "v", "s11", "s22", "s12", "alpha"), slabs, tiled):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)


def test_tiled_dispatch_stays_physical(monkeypatch):
    """Tiled dispatch through the model: finite and physically close to the
    rich whole-loop kernel.  (Tight agreement is impossible: near-uniform
    flow puts Δ ≈ sum of cancelling strain terms, so the γ(1/Δ) relaxation
    amplifies the two kernels' f32 formula-grouping differences.)"""
    import climaseaice_jl_tpu.dynamics.pallas_evp as pe

    import jax

    model_r, state_r = _build_square("always", substeps=8)
    s_r = csi.step(model_r, state_r, 60.0)

    monkeypatch.setattr(pe, "_MAX_POINTS_RICH", 0)  # force tiled dispatch
    jax.clear_caches()  # identical treedef/shapes would reuse the rich executable
    model_l, state_l = _build_square("always", substeps=8)
    s_l = csi.step(model_l, state_l, 60.0)

    I = model_r.grid.interior
    vel_scale = max(np.abs(np.asarray(I(s_r.u))).max(),
                    np.abs(np.asarray(I(s_r.v))).max())
    for name, tol in (("u", 5e-3), ("v", 5e-3), ("h", 1e-6)):
        a = np.asarray(I(getattr(s_r, name)))
        b = np.asarray(I(getattr(s_l, name)))
        assert np.isfinite(b).all()
        scale = vel_scale if name in ("u", "v") else max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() / scale < tol, name


def _build_bounded(fused, substeps=10, immersed=False, P_star=27.5):
    km = 1000.0
    grid = csi.RectilinearGrid(size=(24, 24), x=(0, 100 * km), y=(0, 100 * km),
                               halo=5, dtype="float32",
                               topology=("periodic", "bounded"))
    if immersed:
        mask = np.zeros((24, 24), bool)
        mask[8:12, 10:14] = True
        grid = csi.ImmersedBoundaryGrid(grid, mask)
    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=P_star),
        coriolis=csi.FPlane(f=1e-4),
        top_momentum_stress={"u": 0.05, "v": 0.02},
        bottom_momentum_stress=csi.SemiImplicitStress(ue=0.1, ve=-0.05),
        immersed_drag=csi.ImmersedDrag(coefficient=3e-3) if immersed else None,
        solver=csi.SplitExplicitSolver(substeps=substeps, fused=fused))
    model = csi.sea_ice_model(grid, dynamics=dynamics, ice_thermodynamics=None,
                              advection=csi.WENO(order=5),
                              timestepper="ForwardEuler")

    def h0(x, y):
        return 0.5 + 0.2 * np.sin(2 * np.pi * x / (100 * km)) * np.cos(np.pi * y / (100 * km))

    state = csi.initial_state(model, h=h0, a=1.0, u=0.02)
    return model, state


@pytest.mark.parametrize("immersed", [False, True], ids=["walls", "immersed"])
def test_padded_fused_matches_jnp(immersed):
    """Bounded/immersed padded fused kernel vs the jnp path (soft-ice
    contractive regime, interpret mode)."""
    from climaseaice_jl_tpu.dynamics.pallas_evp_padded import padded_fused_available

    model_f, state_f = _build_bounded("always", immersed=immersed)
    assert padded_fused_available(model_f)
    model_j, state_j = _build_bounded("never", immersed=immersed)

    for _ in range(3):
        state_f = csi.step(model_f, state_f, 60.0)
        state_j = csi.step(model_j, state_j, 60.0)

    I = model_f.grid.interior
    vel_scale = max(np.abs(np.asarray(I(state_j.u))).max(),
                    np.abs(np.asarray(I(state_j.v))).max(), 1e-8)
    for name, tol in (("u", 2e-4), ("v", 2e-4), ("h", 1e-5), ("a", 1e-5)):
        a = np.asarray(I(getattr(state_f, name)))
        b = np.asarray(I(getattr(state_j, name)))
        assert np.isfinite(a).all(), name
        scale = vel_scale if name in ("u", "v") else max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() / scale < tol, \
            f"{name}: {np.abs(a - b).max() / scale}"


def test_padded_fused_array_stresses_match_jnp():
    """Array-valued wind stress + ocean velocities (the anticyclone-class
    forcing) through the padded fused kernel vs the jnp path."""
    km = 1000.0
    N = 24
    grid = csi.RectilinearGrid(size=(N, N), x=(0, 100 * km), y=(0, 100 * km),
                               halo=5, dtype="float32",
                               topology=("bounded", "bounded"))
    rng = np.random.default_rng(5)
    tau_u = np.asarray(0.05 * rng.standard_normal(grid.shape), np.float32)
    tau_v = np.asarray(0.05 * rng.standard_normal(grid.shape), np.float32)
    ue = np.asarray(0.1 * rng.standard_normal(grid.shape), np.float32)
    ve = np.asarray(0.1 * rng.standard_normal(grid.shape), np.float32)

    def build(fused):
        dynamics = csi.SeaIceMomentumEquation(
            rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=27.5),
            coriolis=csi.FPlane(f=1e-4),
            top_momentum_stress={"u": tau_u, "v": tau_v},
            bottom_momentum_stress=csi.SemiImplicitStress(ue=ue, ve=ve),
            solver=csi.SplitExplicitSolver(substeps=10, fused=fused))
        model = csi.sea_ice_model(grid, dynamics=dynamics, ice_thermodynamics=None,
                                  advection=csi.WENO(order=5),
                                  timestepper="ForwardEuler")
        return model, csi.initial_state(model, h=0.5, a=1.0)

    from climaseaice_jl_tpu.dynamics.pallas_evp_padded import padded_fused_available
    model_f, state_f = build("always")
    assert padded_fused_available(model_f)
    model_j, state_j = build("never")
    for _ in range(3):
        state_f = csi.step(model_f, state_f, 60.0)
        state_j = csi.step(model_j, state_j, 60.0)
    I = grid.interior
    vel_scale = max(np.abs(np.asarray(I(state_j.u))).max(),
                    np.abs(np.asarray(I(state_j.v))).max(), 1e-8)
    for name in ("u", "v", "h"):
        a = np.asarray(I(getattr(state_f, name)))
        b = np.asarray(I(getattr(state_j, name)))
        assert np.isfinite(a).all(), name
        scale = vel_scale if name in ("u", "v") else max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() / scale < 5e-4, \
            f"{name}: {np.abs(a - b).max() / scale}"


@pytest.mark.parametrize("topo", [("bounded", "bounded"), ("periodic", "bounded")],
                         ids=["bounded-x", "periodic-x"])
def test_tiled_padded_matches_whole_padded(topo, monkeypatch):
    """The substep-chunked tiled padded kernel (large bounded/immersed grids)
    vs the whole-array padded kernel, forced tiling at small size, to
    shape-dependent-FMA tolerance (see comment at the assertions)."""
    import climaseaice_jl_tpu.dynamics.pallas_evp_padded as pp
    import climaseaice_jl_tpu.dynamics.pallas_evp_tiled_padded as tpd
    from climaseaice_jl_tpu.model import update_state

    km = 1000.0
    grid = csi.RectilinearGrid(size=(32, 24), x=(0, 100 * km), y=(0, 100 * km),
                               halo=5, dtype="float32", topology=topo)
    mask = np.zeros((32, 24), bool)
    mask[10:14, 8:12] = True
    grid = csi.ImmersedBoundaryGrid(grid, mask)
    dyn = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=27.5),
        coriolis=csi.FPlane(f=1e-4),
        top_momentum_stress={"u": 0.05, "v": 0.02},
        bottom_momentum_stress=csi.SemiImplicitStress(ue=0.1, ve=-0.05),
        immersed_drag=csi.ImmersedDrag(coefficient=3e-3),
        solver=csi.SplitExplicitSolver(substeps=16, fused="never"))
    model = csi.sea_ice_model(grid, dynamics=dyn, ice_thermodynamics=None,
                              advection=csi.WENO(order=5),
                              timestepper="ForwardEuler")

    def h0(x, y):
        return 0.5 + 0.2 * np.sin(2 * np.pi * x / (100 * km)) * np.cos(np.pi * y / (100 * km))

    state = update_state(model, csi.initial_state(model, h=h0, a=1.0, u=0.0))
    whole = pp.padded_fused_momentum_step(model, state, 60.0, state.u, state.v,
                                          interpret=True)
    monkeypatch.setattr(tpd, "_pick_tile_rows", lambda Nx, nyp, K, p=False, m=0, **kw: 8)
    tiled = tpd.tiled_padded_momentum_step(model, state, 60.0, state.u, state.v,
                                           interpret=True)
    I = model.grid.interior
    # Cross-kernel agreement is shape-dependent-FMA-limited (the two kernels
    # compile at different block shapes, so XLA contracts a·b+c differently);
    # bounded-x stays within a few ulp, periodic-x a bit wider (the wrap slab
    # compiles differently from the halo array).  The *bitwise* contract —
    # serial ≡ distributed — lives within one kernel via fixed_tiles and is
    # enforced in tests/test_distributed.py::test_fixed_tiles_*.
    tight = topo[0] == "bounded"
    for name, tol in (("u", 1e-5), ("v", 1e-5),
                      ("sig11", 2e-5), ("sig22", 2e-5), ("sig12", 2e-5),
                      ("alpha", 1e-5)):
        a = np.asarray(I(whole[name]))
        b = np.asarray(I(tiled[name]))
        assert np.isfinite(b).all(), name
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() / scale < (1e-5 if tight else tol), name


@pytest.mark.parametrize("topo", [("bounded", "bounded"), ("periodic", "periodic")],
                         ids=["bounded", "periodic"])
def test_tiled_padded_2d_matches_whole_padded(topo, monkeypatch):
    """The 2-D tiled branch (both dims stripped, conditional fills in x and y)
    vs the whole-array padded kernel, forced on at small size."""
    import climaseaice_jl_tpu.dynamics.pallas_evp_padded as pp
    import climaseaice_jl_tpu.dynamics.pallas_evp_tiled_padded as tpd
    from climaseaice_jl_tpu.model import update_state

    km = 1000.0
    grid = csi.RectilinearGrid(size=(32, 24), x=(0, 100 * km), y=(0, 100 * km),
                               halo=5, dtype="float32", topology=topo)
    mask = np.zeros((32, 24), bool)
    mask[10:14, 8:12] = True
    grid = csi.ImmersedBoundaryGrid(grid, mask)
    dyn = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=27.5),
        coriolis=csi.FPlane(f=1e-4),
        top_momentum_stress={"u": 0.05, "v": 0.02},
        bottom_momentum_stress=csi.SemiImplicitStress(ue=0.1, ve=-0.05),
        immersed_drag=csi.ImmersedDrag(coefficient=3e-3),
        solver=csi.SplitExplicitSolver(substeps=16, fused="never"))
    model = csi.sea_ice_model(grid, dynamics=dyn, ice_thermodynamics=None,
                              advection=csi.WENO(order=5),
                              timestepper="ForwardEuler")

    def h0(x, y):
        return 0.5 + 0.2 * np.sin(2 * np.pi * x / (100 * km)) * np.cos(np.pi * y / (100 * km))

    state = update_state(model, csi.initial_state(model, h=h0, a=1.0, u=0.0))
    whole = pp.padded_fused_momentum_step(model, state, 60.0, state.u, state.v,
                                          interpret=True)
    monkeypatch.setattr(tpd, "_pick_tile_rows", lambda Nx, nyp, K, p=False, m=0, **kw: None)
    monkeypatch.setattr(tpd, "_pick_tiles_2d", lambda Nx, Ny, K, p=False, m=0, **kw: (8, 12))
    monkeypatch.setattr(tpd, "WY", 8)
    tiled = tpd.tiled_padded_momentum_step(model, state, 60.0, state.u, state.v,
                                           interpret=True)
    I = model.grid.interior
    for name, tol in (("u", 1e-6), ("v", 1e-6),
                      ("sig11", 2e-5), ("sig22", 2e-5), ("sig12", 2e-5),
                      ("alpha", 1e-6)):
        a = np.asarray(I(whole[name]))
        b = np.asarray(I(tiled[name]))
        assert np.isfinite(b).all(), name
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() / scale < tol, \
            f"{name}: {np.abs(a - b).max() / scale}"


def test_tiled_padded_dispatch_through_step(monkeypatch):
    """model.momentum_step routes to the tiled padded kernel when the
    whole-array padded kernel is VMEM-ineligible."""
    import jax
    import climaseaice_jl_tpu.model as M
    import climaseaice_jl_tpu.dynamics.pallas_evp_padded as pp
    import climaseaice_jl_tpu.dynamics.pallas_evp_tiled_padded as tpd

    called = {}
    real = tpd.tiled_padded_momentum_step

    def spy(*a, **k):
        called["yes"] = True
        return real(*a, **k)

    monkeypatch.setattr(pp, "padded_fused_available", lambda m: False)
    monkeypatch.setattr(tpd, "tiled_padded_momentum_step", spy)
    monkeypatch.setattr(tpd, "_pick_tile_rows", lambda Nx, nyp, K, p=False, m=0, **kw: 8)
    jax.clear_caches()

    model_f, state_f = _build_bounded("always", substeps=16)
    s = csi.step(model_f, state_f, 60.0)
    assert called.get("yes"), "tiled padded kernel was not dispatched"
    assert bool(np.isfinite(np.asarray(model_f.grid.interior(s.u))).all())


def test_padded_fused_stress_function_matches_jnp():
    """A clock-only StressFunction through the padded fused kernel equals the
    jnp path exactly in semantics: both evaluate at the step-start clock
    (the jnp path re-evaluates per substep, but clock is fixed within a
    step), mirroring `update_external_stress!` once-per-step refresh."""
    from climaseaice_jl_tpu.dynamics.pallas_evp_padded import padded_fused_available

    km = 1000.0
    N = 24
    grid = csi.RectilinearGrid(size=(N, N), x=(0, 100 * km), y=(0, 100 * km),
                               halo=5, dtype="float32",
                               topology=("bounded", "bounded"))

    import jax.numpy as jnp

    def wind_u(grid, clock, fields):
        t = clock.time
        x = jnp.arange(grid.nxp, dtype=grid.np_dtype)[:, None]
        return 0.05 * jnp.sin(2 * np.pi * x / N + t / 3600.0) * jnp.ones(grid.shape, grid.np_dtype)

    def build(fused):
        dyn = csi.SeaIceMomentumEquation(
            rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=27.5),
            coriolis=csi.FPlane(f=1e-4),
            top_momentum_stress={"u": csi.StressFunction(func=wind_u), "v": 0.02},
            bottom_momentum_stress=csi.SemiImplicitStress(ue=0.1, ve=-0.05),
            solver=csi.SplitExplicitSolver(substeps=10, fused=fused))
        model = csi.sea_ice_model(grid, dynamics=dyn, ice_thermodynamics=None,
                                  advection=csi.WENO(order=5),
                                  timestepper="ForwardEuler")
        def h0(x, y):
            return 0.5 + 0.2 * np.sin(2 * np.pi * x / (100 * km)) * np.cos(np.pi * y / (100 * km))
        return model, csi.initial_state(model, h=h0, a=1.0, u=0.02)

    model_f, state_f = build("always")
    assert padded_fused_available(model_f)
    model_j, state_j = build("never")
    for _ in range(3):
        state_f = csi.step(model_f, state_f, 60.0)
        state_j = csi.step(model_j, state_j, 60.0)
    I = model_f.grid.interior
    vel_scale = max(np.abs(np.asarray(I(state_j.u))).max(),
                    np.abs(np.asarray(I(state_j.v))).max(), 1e-8)
    for name, tol in (("u", 2e-4), ("v", 2e-4), ("h", 1e-5)):
        a = np.asarray(I(getattr(state_f, name)))
        b = np.asarray(I(getattr(state_j, name)))
        assert np.isfinite(a).all(), name
        scale = vel_scale if name in ("u", "v") else max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() / scale < tol, \
            f"{name}: {np.abs(a - b).max() / scale}"


def test_chunk_and_tile_planner():
    """Adaptive substep chunking (any nsub with a divisor in [2, 15] is
    fused-eligible — notably the reference production value 150 and small
    test values like 8) and ratio-based slab/2-D layout competition (at
    2048² a full-y slab only fits at TX = 64, redundancy ≈ 2.1; the planner
    must prefer a 2-D tiling instead)."""
    from climaseaice_jl_tpu.dynamics.pallas_evp_tiled import (
        _plan_tiles, _block_x, pick_chunk, WY)

    assert pick_chunk(120) == 15
    assert pick_chunk(150) == 15
    assert pick_chunk(8) == 8
    assert pick_chunk(100) == 10
    assert pick_chunk(97) is None  # prime > cap: caller falls back

    for N in (1024, 2048, 4096, 8192):
        plan = _plan_tiles(N, N, 15)
        assert plan is not None, N
        _, TX, TY, Wy = plan
        assert N % TX == 0 and N % TY == 0
        ratio = (_block_x(TX, 15) / TX) * ((TY + 2 * Wy) / TY)
        assert ratio < 1.6, f"{N}: redundancy {ratio}"


def test_plan_chunks_competition():
    """Round-4 planner: K competes jointly with the layout (cost = padded
    ratio × (1 + 4/K)), the chosen K always divides nsub, and Mosaic lane
    padding is priced (a 1030-lane slab really costs 1152 lanes)."""
    from climaseaice_jl_tpu.dynamics.pallas_evp_tiled import (
        _plan_chunks, _plan_tiles)

    for nsub in (120, 150, 8, 100):
        plan = _plan_chunks(1024, 1024, nsub)
        assert plan is not None
        K, TX, TY, Wy = plan
        assert nsub % K == 0 and 2 <= K <= 15
        assert 1024 % TX == 0

    # hidden lane padding must be priced: same layout family, ny=1030
    # (pads to 1152) must cost more than ny=1024 (no padding)
    c_aligned = _plan_tiles(1024, 1024, 15)[0]
    c_padded = _plan_tiles(1024, 1030, 15)[0]
    assert c_padded > c_aligned
