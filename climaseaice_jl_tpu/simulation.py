"""Simulation driver: run loop, callbacks, schedules, NaN guard.

Host-side replacement for the Oceananigans `Simulation`/`run!`/`Callback`
machinery the reference leans on (`examples/freezing_bucket.jl:99-118`,
SURVEY.md §2.3).  The driver owns the (model, state) pair, calls the jitted
step, and fires host callbacks / writers on schedule.
"""

from __future__ import annotations

import time as _time

import numpy as np
import jax

from .model import step as _jitted_step, step_donated as _donated_step


class IterationInterval:
    def __init__(self, n):
        self.n = n

    def __call__(self, sim):
        return sim.iteration % self.n == 0


class TimeInterval:
    def __init__(self, interval):
        self.interval = interval
        self._next = 0.0

    def __call__(self, sim):
        if sim.time + 1e-12 >= self._next:
            self._next = (np.floor(sim.time / self.interval) + 1) * self.interval
            return True
        return False


class Callback:
    def __init__(self, func, schedule=None):
        self.func = func
        self.schedule = schedule or IterationInterval(1)

    def maybe_fire(self, sim):
        if self.schedule(sim):
            self.func(sim)


class Simulation:
    """Drive a model forward: ``Simulation(model, state, dt, stop_time=...)``.

    ``sim.run()`` loops the jitted step, firing callbacks and output writers.
    The state pytree after each step is stored on ``sim.state``.
    """

    def __init__(self, model, state, dt, stop_time=None, stop_iteration=None,
                 check_nans=True):
        self.model = model
        self.state = state
        self.dt = float(dt)
        self.stop_time = stop_time
        self.stop_iteration = stop_iteration
        self.callbacks = {}
        self.output_writers = {}
        self.check_nans = check_nans
        self.wall_seconds = 0.0

    @property
    def time(self):
        return float(self.state.clock.time)

    @property
    def iteration(self):
        return int(self.state.clock.iteration)

    def should_stop(self):
        if self.stop_time is not None and self.time >= self.stop_time - 1e-9:
            return True
        if self.stop_iteration is not None and self.iteration >= self.stop_iteration:
            return True
        return False

    def _fire(self):
        for cb in self.callbacks.values():
            cb.maybe_fire(self)
        for w in self.output_writers.values():
            w.maybe_write(self)

    def run(self, pickup=None, profile_dir=None):
        """Run to the stop condition.

        ``pickup``: a checkpoint path, True to resume from the latest
        checkpoint of a registered Checkpointer, or an iteration number to
        resume from that specific checkpoint (`run!(sim, pickup=…)` analog,
        `test/test_checkpointing.jl:104`).  ``profile_dir``: wrap the loop in
        a `jax.profiler.trace` writing a TensorBoard-compatible device trace
        there (the profiling instrumentation the reference lacks;
        SURVEY.md §5).
        """
        if profile_dir is not None:
            with jax.profiler.trace(profile_dir):
                return self.run(pickup=pickup, profile_dir=None)
        if pickup is not None and pickup is not False:
            from .io.checkpoint import restore_state, Checkpointer
            path = pickup
            if pickup is True or isinstance(pickup, int):
                ckp = next((w for w in self.output_writers.values()
                            if isinstance(w, Checkpointer)), None)
                if ckp is None:
                    raise ValueError(
                        f"pickup={pickup!r} requires a Checkpointer output "
                        "writer")
                if pickup is True:
                    path = ckp.latest()
                    if path is None:
                        raise ValueError("pickup=True requires existing "
                                         "checkpoints")
                else:  # pickup by iteration number
                    path = f"{ckp.prefix}_iteration{int(pickup)}.npz"
            self.state = restore_state(self.state, path)

        t0 = _time.perf_counter()
        steps0 = self.iteration
        first_step_done = False
        self._fire()
        use_donated = jax.default_backend() not in ("cpu",)
        stepper = _donated_step if use_donated else _jitted_step
        while not self.should_stop():
            self.state = stepper(self.model, self.state, self.dt)
            if not first_step_done:
                # exclude the first (compile-bearing) step from the rate
                jax.block_until_ready(self.state.h)
                t0 = _time.perf_counter()
                steps0 = self.iteration
                first_step_done = True
            if self.check_nans and self.iteration % 100 == 0:
                h = np.asarray(self.model.grid.interior(self.state.h))
                if np.any(np.isnan(h)):
                    raise FloatingPointError(
                        f"NaN ice thickness at iteration {self.iteration}")
            self._fire()
        jax.block_until_ready(self.state.h)
        elapsed = _time.perf_counter() - t0
        self.wall_seconds += elapsed
        steps = self.iteration - steps0
        if steps > 0 and elapsed > 0:
            g = self.model.grid
            self.points_per_second = g.Nx * g.Ny * steps / elapsed
        return self.state


def time_step(model, state, dt, steps=1):
    """Convenience: advance ``steps`` jitted steps."""
    for _ in range(steps):
        state = _jitted_step(model, state, dt)
    return state
