"""Output writers: scheduled snapshots of model fields to NPZ or NetCDF.

Replaces the reference's Oceananigans `JLD2Writer` / `NetCDFWriter` usage
(`src/ClimaSeaIce.jl:78-100` default attributes; `test/test_netcdf_writer.jl`).
Data moves device→host once per scheduled write; everything else stays on
device.
"""

from __future__ import annotations

import os

import numpy as np

# Default output attributes per field (`src/ClimaSeaIce.jl:78-100`)
DEFAULT_ATTRIBUTES = {
    "h": {"long_name": "sea ice thickness", "units": "m"},
    "a": {"long_name": "sea ice concentration", "units": ""},
    "hs": {"long_name": "snow thickness", "units": "m"},
    "u": {"long_name": "sea ice x-velocity", "units": "m s-1"},
    "v": {"long_name": "sea ice y-velocity", "units": "m s-1"},
    "S": {"long_name": "sea ice salinity", "units": "psu"},
    "Tu": {"long_name": "sea ice top surface temperature", "units": "degrees_Celsius"},
}


def _gather_fields(sim, outputs):
    grid = sim.model.grid
    out = {}
    for name in outputs:
        q = getattr(sim.state, name, None)
        if q is None and sim.state.tracers:
            q = sim.state.tracers.get(name)
        if q is not None:
            out[name] = np.asarray(grid.interior(q))
    return out


class NPZWriter:
    """Append-style snapshot writer: one ``<prefix>_<iteration>.npz`` per write
    (JLD2Writer analog)."""

    def __init__(self, outputs, prefix, schedule, overwrite=True):
        self.outputs = outputs
        self.prefix = prefix
        self.schedule = schedule
        self.times = []
        if overwrite:
            d = os.path.dirname(prefix) or "."
            base = os.path.basename(prefix)
            if os.path.isdir(d):
                for f in os.listdir(d):
                    if f.startswith(base) and f.endswith(".npz"):
                        os.remove(os.path.join(d, f))

    def maybe_write(self, sim):
        if not self.schedule(sim):
            return
        data = _gather_fields(sim, self.outputs)
        data["time"] = np.asarray(sim.time)
        data["iteration"] = np.asarray(sim.iteration)
        np.savez(f"{self.prefix}_{sim.iteration:08d}.npz", **data)
        self.times.append(sim.time)


class NetCDFWriter:
    """NetCDF3 time-series writer via scipy (no extra deps).

    Produces a time dimension plus one (time, x, y) variable per output with
    the reference's default attributes (`src/ClimaSeaIce.jl:78-100`).
    """

    def __init__(self, outputs, filename, schedule):
        self.outputs = outputs
        self.filename = filename
        self.schedule = schedule
        self._snapshots = []
        self._times = []

    def maybe_write(self, sim):
        if not self.schedule(sim):
            return
        self._snapshots.append(_gather_fields(sim, self.outputs))
        self._times.append(sim.time)
        self.flush(sim)

    def flush(self, sim):
        try:
            from scipy.io import netcdf_file
        except ImportError:  # no scipy: silently fall back to npz alongside
            np.savez(self.filename + ".npz",
                     time=np.asarray(self._times),
                     **{k: np.stack([s[k] for s in self._snapshots])
                        for k in self._snapshots[0]})
            return
        grid = sim.model.grid
        with netcdf_file(self.filename, "w") as f:
            f.createDimension("time", None)
            f.createDimension("x", grid.Nx)
            f.createDimension("y", grid.Ny)
            tvar = f.createVariable("time", "d", ("time",))
            tvar[:] = np.asarray(self._times)
            tvar.units = "seconds"
            for name in self._snapshots[0]:
                var = f.createVariable(name, "d", ("time", "x", "y"))
                var[:] = np.stack([s[name] for s in self._snapshots])
                for k, v in DEFAULT_ATTRIBUTES.get(name, {}).items():
                    setattr(var, k, v)


class FieldTimeSeriesAccumulator:
    """In-memory (time, field) series collector, FieldTimeSeries analog for
    examples/tests."""

    def __init__(self, outputs, schedule):
        self.outputs = outputs
        self.schedule = schedule
        self.times = []
        self.series = {name: [] for name in outputs}

    def maybe_write(self, sim):
        if not self.schedule(sim):
            return
        self.times.append(sim.time)
        for name, arr in _gather_fields(sim, self.outputs).items():
            self.series[name].append(arr)
