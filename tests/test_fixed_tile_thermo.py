"""Fixed-tile (decomposition-invariant) thermodynamics.

With ``fixed_tiles`` pinned on the solver, the whole slab/snow column chain
runs on pinned Pallas tiles (thermodynamics/pallas_thermo.py), closing the
last shape-dependently-compiled term of the step — so FULL-physics runs
(dynamics + advection + thermo) gate bitwise serial ≡ distributed, the
reference's whole-model parity bar (`test/distributed_tests_utils.jl:83-86`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.forcing_utils import FieldTimeSeries
from climaseaice_jl_tpu.grids import TripolarGrid
from climaseaice_jl_tpu.model import make_fields
from climaseaice_jl_tpu.parallel import make_distributed_step
from climaseaice_jl_tpu.parallel.stepper import strip_halos, unstrip_halos
from climaseaice_jl_tpu.thermodynamics.pallas_thermo import (
    fixed_tile_thermo_step)

day = 86400.0


def _seasonal_fluxes():
    # f32 tables: the suite enables x64, and f64 series would promote the
    # f32 jnp reference path (the fixed-tile path casts to f32 regardless)
    fts = FieldTimeSeries(times=(np.arange(12) * 30 * day).astype(np.float32),
                          data=(np.sin(np.arange(12)) * 60.0 - 20.0
                                ).astype(np.float32),
                          cyclical=True)

    def solar(grid_, Tu, clock, fields, p):
        lat = jnp.asarray(grid_.lat_cc, jnp.float32)
        sw = jnp.clip(jnp.cos(lat * np.pi / 180.0) / 0.5, 0.3, 1.6)
        albedo = jnp.where(Tu < -0.1, 0.75, 0.64)
        return p.at_time(clock.time) * sw * (1 - albedo)

    return (csi.FluxFunction(func=solar, parameters=fts,
                             top_temperature_dependent=True),
            csi.RadiativeEmission(), -15.0)


def _build(fixed=(8, 128)):
    grid = TripolarGrid((48, 96), southernmost_latitude=-70.0, halo=5,
                        dtype="float32")
    Nx, Ny = grid.Nx, grid.Ny
    land = np.zeros((Nx, Ny), bool)
    land[:, :3] = True
    land[18:30, 80:] = True
    grid = csi.ImmersedBoundaryGrid(grid, land)

    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(),  # α⁺ = 300 (reference)
        top_momentum_stress={"u": 0.02, "v": 0.01},
        bottom_momentum_stress=csi.SemiImplicitStress(),
        solver=csi.SplitExplicitSolver(substeps=8, halo_exchange="wide",
                                       fused="always", fixed_tiles=fixed))
    model = csi.sea_ice_model(
        grid, dynamics=dynamics,
        ice_thermodynamics=csi.sea_ice_slab_thermodynamics(),
        snow_thermodynamics=csi.snow_slab_thermodynamics(),
        snowfall=3.2e-6,
        top_heat_flux=_seasonal_fluxes(), bottom_heat_flux=-2.0,
        advection=csi.WENO(order=7), timestepper="ForwardEuler")
    rng = np.random.default_rng(7)
    state = csi.initial_state(model, h=0.5 + 0.5 * rng.random((Nx, Ny)),
                              a=0.9, hs=0.05, u=0.02)
    return model, state


def test_fixed_tile_thermo_matches_jnp_path():
    """The pinned-tile column chain reproduces the traced jnp chain to f32
    roundoff (different compilations of the same math)."""
    from climaseaice_jl_tpu.thermodynamics.slab import (
        layered_thermodynamic_step)
    model, state = _build()
    fields = make_fields(model, state)
    h1, a1, hs1, Tu, Tus, _ = layered_thermodynamic_step(
        model, state, fields, 600.0)
    s2 = fixed_tile_thermo_step(model, state, 600.0, (8, 128))
    for name, ref in (("h", h1), ("a", a1), ("hs", hs1), ("Tus", Tus)):
        got = np.asarray(getattr(s2, name))
        assert np.isfinite(got).all(), name
        np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5,
                                   atol=2e-5, err_msg=name)


def test_full_physics_bitwise_serial_vs_distributed():
    """FULL-physics (EVP + WENO-7 + slab ice + snow + seasonal FluxFunction
    + secant solve) bitwise serial ≡ distributed at α⁺ = 300 on an immersed
    tripolar grid — the reference's whole-model decomposition-invariance
    contract (`distributed_tests_utils.jl:83-86`), met exactly."""
    model, state = _build()
    from climaseaice_jl_tpu.dynamics.pallas_evp_tiled_curvilinear import (
        tiled_curvilinear_available)
    assert tiled_curvilinear_available(model)

    serial = state
    for _ in range(3):
        serial = csi.step(model, serial, 600.0)

    I = model.grid.interior
    for mesh_shape in ((1, 4), (2, 2)):
        dstep, _ = make_distributed_step(model, mesh_shape)
        s = strip_halos(model, state)
        for _ in range(3):
            s = dstep(s, 600.0)
        dist = unstrip_halos(model, s)
        for name in ("u", "v", "h", "a", "hs", "Tu", "Tus"):
            a = np.asarray(I(getattr(serial, name)))
            b = np.asarray(I(getattr(dist, name)))
            assert np.isfinite(b).all(), name
            assert np.array_equal(a, b), \
                f"full-physics {name} {mesh_shape} not bitwise: " \
                f"max abs diff {np.abs(a - b).max()}"
