"""Decompose large-grid step time: momentum-only vs full step (TPU).

Separates the EVP substep loop's cost from advection+thermo at a given size
to target optimization. Usage: [N=4096] [BOUNDED=0] python validation/perf_decompose.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "validation"))

from perf_sweep import build, tier_of


def timeit(model, state, steps=10, dt=120.0):
    import jax
    from climaseaice_jl_tpu.model import _step
    step = jax.jit(lambda s, dt: _step(model, s, dt), donate_argnums=(0,))
    state = step(state, dt)
    # block on u, not h: momentum-only configs never touch h, whose donated
    # buffer aliases straight through and becomes ready before the EVP kernel
    # finishes
    jax.block_until_ready(state.u)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state, dt)
    jax.block_until_ready(state.u)
    return (time.perf_counter() - t0) / steps


def main():
    N = int(os.environ.get("N", 4096))
    bounded = os.environ.get("BOUNDED", "0") == "1"
    model, state = build(N, bounded=bounded)
    tier = tier_of(model)
    t_full = timeit(model, state)
    # momentum only: no thermo, no advection (fresh state: timeit donates)
    model, state = build(N, bounded=bounded)
    m2 = model.evolve(ice_thermodynamics=None, snow_thermodynamics=None,
                      advection=None)
    t_mom = timeit(m2, state)
    # jnp momentum for comparison
    model, state = build(N, bounded=bounded)
    m3 = model.evolve(ice_thermodynamics=None, snow_thermodynamics=None,
                      advection=None)
    m3 = m3.evolve(dynamics=m3.dynamics.evolve(
        solver=m3.dynamics.solver.__class__(substeps=120, fused="never")))
    t_jnp = timeit(m3, state, steps=3)
    pts = N * N
    print(f"N={N} bounded={bounded} tier={tier}")
    print(f"full step:      {t_full*1e3:8.1f} ms  ({pts/t_full/1e6:6.2f}M pts/s)")
    print(f"momentum only:  {t_mom*1e3:8.1f} ms  ({pts/t_mom/1e6:6.2f}M pts/s)")
    print(f"adv+thermo:     {(t_full-t_mom)*1e3:8.1f} ms")
    print(f"jnp momentum:   {t_jnp*1e3:8.1f} ms  ({pts/t_jnp/1e6:6.2f}M pts/s)")


if __name__ == "__main__":
    main()
