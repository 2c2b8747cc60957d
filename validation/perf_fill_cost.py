"""Timing experiment: how much of the bounded/immersed (padded-kernel) step
is spent in the per-substep in-kernel boundary fills?

Monkeypatches the padded kernels' fill closures to identity (numerically
WRONG — timing only) and compares step time against the real kernel at the
same size.  Run on the TPU: `python validation/perf_fill_cost.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf_sweep import build, tier_of  # noqa: E402


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
    N = int(os.environ.get("N", 1024))
    model, state = build(N, bounded=True)
    print(f"N={N} tier={tier_of(model)}")
    t_real = timeit(model, state)
    print(f"real fills:     {t_real*1e3:8.1f} ms  ({N*N/t_real/1e6:6.2f}M pts/s)")

    # identity fills (timing only)
    from climaseaice_jl_tpu.dynamics import pallas_evp_padded as pep
    from climaseaice_jl_tpu.dynamics import pallas_evp_tiled_padded as petp

    def no_fillers(grid):
        return (lambda q: q), (lambda q: q)

    pep._make_fillers = no_fillers
    if hasattr(petp, "_make_slab_fillers"):
        real_slab = petp._make_slab_fillers

        def no_slab_fillers(*a, **k):
            fills = real_slab(*a, **k)
            if isinstance(fills, tuple):
                return tuple((lambda q: q) for _ in fills)
            return fills
        petp._make_slab_fillers = no_slab_fillers

    model, state = build(N, bounded=True)
    t_nofill = timeit(model, state)
    print(f"identity fills: {t_nofill*1e3:8.1f} ms  ({N*N/t_nofill/1e6:6.2f}M pts/s)")
    print(f"fill share:     {100*(t_real-t_nofill)/t_real:5.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
