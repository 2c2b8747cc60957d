"""Timing comparison: whole-grid padded kernel (concat halo fills) vs the
tiled-padded kernel (coordinate-gated where fills) on bounded+immersed grids
small enough that both are eligible.  Informs the dispatcher's preference
order.  `N=512 python validation/perf_padded_tiers.py` on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf_sweep import build  # noqa: E402


def timeit(model, state, steps=10):
    import jax
    from climaseaice_jl_tpu.model import _step
    step = jax.jit(lambda s, dt: _step(model, s, dt), donate_argnums=(0,))
    state = step(state, 120.0)
    jax.block_until_ready(state.h)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state, 120.0)
    jax.block_until_ready(state.h)
    return (time.perf_counter() - t0) / steps


def main():
    N = int(os.environ.get("N", 512))
    from climaseaice_jl_tpu import model as model_mod
    from climaseaice_jl_tpu.dynamics import pallas_evp_padded as pep

    model, state = build(N, bounded=True)
    t_padded = timeit(model, state)
    print(f"N={N} whole-grid padded: {t_padded*1e3:8.1f} ms "
          f"({N*N/t_padded/1e6:6.2f}M pts/s)")

    real = pep.padded_fused_available
    pep.padded_fused_available = lambda m: False
    try:
        model, state = build(N, bounded=True)
        t_tiled = timeit(model, state)
    finally:
        pep.padded_fused_available = real
    print(f"N={N} tiled-padded:     {t_tiled*1e3:8.1f} ms "
          f"({N*N/t_tiled/1e6:6.2f}M pts/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
