"""Scratch: where does the 89 ms tripolar step go? (round-4 perf triage)"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_tripolar_basin import build  # noqa: E402

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    Nx, Ny = 1152, 960
    model, state = build(Nx, Ny, substeps=120)
    from climaseaice_jl_tpu.model import _step, momentum_step, update_state
    from climaseaice_jl_tpu.dynamics.pallas_evp_tiled_curvilinear import (
        tiled_curvilinear_momentum_step)

    dt = 300.0
    state = jax.jit(lambda s: update_state(model, s))(state)

    # 1. full step
    step = jax.jit(lambda s: _step(model, s, dt))
    t_full = timeit(step, state)
    print(json.dumps({"full_step_ms": round(t_full * 1e3, 2)}), flush=True)

    # 2. momentum only (one EVP-120, not x3 RK)
    mom = jax.jit(lambda s: momentum_step(model, s, dt))
    t_mom = timeit(mom, state)
    print(json.dumps({"momentum_ms": round(t_mom * 1e3, 2)}), flush=True)

    # 3. fused tiled curvilinear step directly
    f = jax.jit(lambda s: tiled_curvilinear_momentum_step(
        model, s, dt, s.u, s.v))
    t_tc = timeit(f, state)
    print(json.dumps({"tiled_curv_ms": round(t_tc * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
