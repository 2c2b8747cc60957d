"""Scratch: decompose the (2,2) virtual-mesh distributed step cost.

Separates: per-substep cost (substeps sweep), fixed per-step cost
(extrapolation to 0 substeps), and raw ppermute rendezvous cost (N
sequential exchange rounds on halo-sized strips).
"""
import os, sys, time

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

import climaseaice_jl_tpu as csi
from climaseaice_jl_tpu.parallel import make_distributed_step
from climaseaice_jl_tpu.parallel.stepper import strip_halos, shard_map
from weak_scaling import build


def timeit(fn, *args, n=5, warm=1):
    out = None
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def step_time(mesh_shape, substeps, halo_exchange, tile=96):
    import dataclasses
    model, state = build(tile * mesh_shape[0], tile * mesh_shape[1],
                         halo_exchange)
    solver = dataclasses.replace(model.dynamics.solver, substeps=substeps)
    model = model.evolve(dynamics=dataclasses.replace(model.dynamics,
                                                      solver=solver))
    if mesh_shape == (1, 1):
        stepf = jax.jit(lambda s, dt: csi.step(model, s, dt))
        return timeit(stepf, state, 60.0)
    dstep, _ = make_distributed_step(model, mesh_shape)
    s = strip_halos(model, state)
    return timeit(dstep, s, 60.0)


def permute_cost(rounds, strip_shape=(96, 19)):
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    fwd = [(i, (i + 1) % 2) for i in range(2)]

    def body(q):
        def f(q):
            for _ in range(rounds):
                q = lax.ppermute(q, "y", fwd) + 1.0
            return q
        return shard_map(f, mesh, in_specs=P(None, None),
                         out_specs=P(None, None))(q)

    q = jnp.ones(strip_shape, jnp.float32)
    return timeit(jax.jit(body), q, n=10, warm=2)


if __name__ == "__main__":
    print("ppermute rounds cost: 1r", round(permute_cost(1) * 1e3, 3), "ms;",
          "40r", round(permute_cost(40) * 1e3, 3), "ms;",
          "200r", round(permute_cost(200) * 1e3, 3), "ms", flush=True)
    for he in ("per_substep", "wide"):
        for sub in (2, 8, 16):
            t11 = step_time((1, 1), sub, he)
            t22 = step_time((2, 2), sub, he)
            print(f"halo={he} substeps={sub}: serial {t11*1e3:7.1f} ms, "
                  f"(2,2) {t22*1e3:7.1f} ms, eff {t11/t22*100:5.1f}%",
                  flush=True)
