"""Fixed-tile (decomposition-invariant) slab/snow thermodynamics.

With ``SplitExplicitSolver(fixed_tiles=(TX, TY))`` the dynamics+advection
path already computes bit-identical values under any domain decomposition
(pinned-tile Mosaic EVP + in-kernel coefficient derivation + fixed-tile WENO
+ Pallas-evaluated winds, see dynamics/pallas_pointwise.py).  This module
closes the LAST shape-dependently-compiled term: the slab/snow column chain
(FluxFunction evaluation, flux-table interpolation, the fixed-iteration
secant surface solve, volume/concentration updates, flooding) — reference
full-model parity bar `test/distributed_tests_utils.jl:83-86`, which the
reference meets for free because its per-point MPI arithmetic is inherently
shape-independent.

Mechanism: the *entire* existing column step (`slab.bare_ice_thermodynamic_
step` / `slab.layered_thermodynamic_step`, transcribed from the reference's
`thermodynamic_time_step.jl:75-298`) is re-traced inside a Pallas kernel on
pinned (TX, TY) tiles.  Every grid-shaped array the chain touches (state
fields, grid latitude/longitude, array-valued fluxes) enters as a tile
operand; every traced scalar (clock time, dt, FieldTimeSeries values
resolved at the current time) enters through SMEM — forcing them to
materialize as standalone scalar programs, which XLA compiles
shape-independently.  Mosaic codegen then depends only on the (TX, TY)
block shape, so the serial run and every shard decomposition compute
bit-identical per-point results.

The lift is performed once per trace by :func:`_lift`, which rewrites the
flux-specification pytrees (tuples, FluxFunction, RadiativeEmission,
conductive-flux configs, FieldTimeSeries) into templates whose array/scalar
leaves are placeholders, and :func:`_bind` re-materializes them from the
kernel operands at tile-trace time.  User ``FluxFunction`` callables work
unchanged as long as they only read ``grid.lat_cc`` / ``grid.lon_cc``,
``Tu``, ``clock.time``, ``fields.<state>`` and scalar/time-series
parameters — the same contract the fixed-tile wind evaluation documents.
"""

from __future__ import annotations

import dataclasses
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from ..dynamics.pallas_pointwise import fixed_tile_pointwise_multi
from .heat_bcs import FluxFunction


class _ArrRef:
    """Placeholder for a grid-shaped array operand (tile at bind time)."""
    __slots__ = ("i",)

    def __init__(self, i):
        self.i = i


class _ScalRef:
    """Placeholder for an SMEM scalar operand."""
    __slots__ = ("i",)

    def __init__(self, i):
        self.i = i


class _FrozenSeries:
    """A FieldTimeSeries resolved at the current clock time: ``at_time``
    (and direct flux-spec ``__call__``) return the pre-evaluated value."""
    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def at_time(self, t):
        return self.value

    def __call__(self, grid, Tu, clock, fields):
        return self.value


class _Lifter:
    def __init__(self, grid, clock_time):
        self.grid = grid
        self.clock_time = clock_time
        self.arrays = []
        self.scalars = []

    def arr(self, x):
        self.arrays.append(jnp.asarray(x, jnp.float32))
        return _ArrRef(len(self.arrays) - 1)

    def scal(self, x):
        self.scalars.append(jnp.asarray(x, jnp.float32))
        return _ScalRef(len(self.scalars) - 1)

    def lift(self, obj):
        """Rewrite a flux/config spec into a placeholder template."""
        grid = self.grid
        if obj is None or isinstance(obj, (bool, str)):
            return obj
        if isinstance(obj, (int, np.integer)):
            return int(obj)  # static (loop counts, flags): stays compile-time
        if isinstance(obj, (float, np.floating)):
            # Lift python floats to SMEM too: a jitted caller traces the
            # model's config floats into 0-d tracers while a closure-captured
            # model leaves them as inline constants — two DIFFERENT kernels
            # (different roundings) unless both routes produce the same SMEM
            # layout.  Uniform lifting keeps the Mosaic kernel identical
            # across serial/jitted/shard_map call sites.
            return self.scal(float(obj))
        if isinstance(obj, tuple):
            return tuple(self.lift(o) for o in obj)
        if hasattr(obj, "at_time") and callable(obj.at_time):
            # FieldTimeSeries(-like): resolve at the current clock time into
            # a standalone scalar program (shape-independent), pass via SMEM
            val = jnp.asarray(obj.at_time(self.clock_time))
            if val.ndim != 0:
                raise ValueError(
                    "fixed-tile thermodynamics supports scalar-valued "
                    f"time series only; got shape {val.shape}")
            return _FrozenSeries(self.scal(val))
        if isinstance(obj, FluxFunction):
            return FluxFunction(func=obj.func,
                                parameters=self.lift(obj.parameters),
                                top_temperature_dependent=obj.top_temperature_dependent)
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            kw = {f.name: self.lift(getattr(obj, f.name))
                  for f in dataclasses.fields(obj)}
            return type(obj)(**kw)
        if not isinstance(obj, (np.ndarray, np.generic, jnp.ndarray)):
            # plain config object (markers, callables, ...): pass through
            return obj
        x = jnp.asarray(obj)
        if x.ndim == 0:
            if isinstance(obj, (np.floating, np.integer)):
                return float(obj)
            return self.scal(x)
        if x.ndim == 2 and x.shape == grid.shape:
            return self.arr(x)
        if x.ndim == 2 and x.shape == grid.interior_shape:
            return self.arr(grid.set_interior(grid.new_field(), x))
        raise ValueError(
            f"fixed-tile thermodynamics cannot lift array of shape {x.shape}")


def _bind(obj, tiles, scals):
    """Re-materialize a lifted template from kernel operands."""
    if isinstance(obj, _ArrRef):
        return tiles[obj.i]
    if isinstance(obj, _ScalRef):
        return scals[obj.i]
    if isinstance(obj, _FrozenSeries):
        return _FrozenSeries(_bind(obj.value, tiles, scals))
    if isinstance(obj, tuple):
        return tuple(_bind(o, tiles, scals) for o in obj)
    if isinstance(obj, FluxFunction):
        return FluxFunction(func=obj.func,
                            parameters=_bind(obj.parameters, tiles, scals),
                            top_temperature_dependent=obj.top_temperature_dependent)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        kw = {f.name: _bind(getattr(obj, f.name), tiles, scals)
              for f in dataclasses.fields(obj)}
        return type(obj)(**kw)
    return obj


# State/fields entries the column chain may read, in a pinned order.
_STATE_NAMES = ("h", "a", "hs", "S", "Tu", "Tus")


def fixed_tile_thermo_step(model, state, dt, fixed, interpret=None):
    """Run the slab (or layered snow+ice) thermodynamic step on pinned
    ``fixed = (TX, TY)`` Pallas tiles.  Returns the updated state, exactly
    like :func:`model.thermodynamic_step`'s jnp path but decomposition-
    invariant (bitwise-equal under any shard decomposition)."""
    from .slab import (bare_ice_thermodynamic_step,
                       layered_thermodynamic_step)

    grid = model.grid
    layered = model.snow_thermodynamics is not None
    lifter = _Lifter(grid, state.clock.time)

    # --- state arrays (tile operands) -------------------------------------
    st_refs = {}
    for name in _STATE_NAMES:
        q = getattr(state, name)
        st_refs[name] = None if q is None else lifter.arr(q)

    # --- grid coordinate planes user flux functions may read ---------------
    grid_extra = {}
    for attr in ("lat_cc", "lon_cc"):
        v = getattr(grid, attr, None)
        if v is not None:
            v = jnp.asarray(v)
            if v.shape == grid.shape:
                grid_extra[attr] = lifter.arr(v)

    # --- config / flux templates -------------------------------------------
    tmpl = dict(
        ice_thermodynamics=lifter.lift(model.ice_thermodynamics),
        snow_thermodynamics=lifter.lift(model.snow_thermodynamics),
        phase_transitions=lifter.lift(model.phase_transitions),
        ice_consolidation_thickness=lifter.lift(
            model.ice_consolidation_thickness),
        sea_ice_density=lifter.lift(model.sea_ice_density),
        snow_density=lifter.lift(model.snow_density),
        top_heat_flux=lifter.lift(model.top_heat_flux),
        bottom_heat_flux=lifter.lift(model.bottom_heat_flux),
        snowfall=lifter.lift(model.snowfall),
    )
    t_scal = lifter.scal(state.clock.time)
    dt_scal = lifter.scal(dt)

    bare_names = ("h", "a", "Tu", "mf_ice", "mf_snow", "mf_snowfall",
                  "Qtop", "Qbot")
    layered_names = ("h", "a", "hs", "Tu", "Tus", "mf_ice", "mf_snow",
                     "mf_snowfall", "Qtop", "Qbot")
    out_names = layered_names if layered else bare_names

    def fn(*ops):
        tiles = ops[:len(lifter.arrays)]
        scals = ops[len(lifter.arrays):]
        TXY = tiles[0].shape
        g = SimpleNamespace(shape=TXY, np_dtype=np.float32,
                            interior_shape=(-1, -1),
                            **{k: _bind(v, tiles, scals)
                               for k, v in grid_extra.items()})
        clock = SimpleNamespace(time=_bind(t_scal, tiles, scals),
                                iteration=0)
        stv = {k: (None if r is None else _bind(r, tiles, scals))
               for k, r in st_refs.items()}
        s = SimpleNamespace(clock=clock, **stv)
        flds = SimpleNamespace(tracers=None, u=None, v=None, rho=None,
                               **stv)
        m = SimpleNamespace(
            grid=g, **{k: _bind(v, tiles, scals) for k, v in tmpl.items()})
        dts = _bind(dt_scal, tiles, scals)
        if layered:
            h1, a1, hs1, Tu, Tus, d = layered_thermodynamic_step(
                m, s, flds, dts)
            outs = dict(h=h1, a=a1, hs=hs1, Tu=Tu, Tus=Tus, **d)
        else:
            h1, a1, Tu, d = bare_ice_thermodynamic_step(m, s, flds, dts)
            outs = dict(h=h1, a=a1, Tu=Tu, **d)
        return tuple(jnp.broadcast_to(outs[k], TXY) for k in out_names)

    res = fixed_tile_pointwise_multi(fn, fixed, lifter.arrays,
                                     scalars=lifter.scalars,
                                     interpret=interpret)
    updates = dict(zip(out_names, res))
    return state.evolve(**updates)
