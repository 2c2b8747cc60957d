"""Pointwise fixed-tile Pallas evaluation: decomposition-invariant forcing.

Grid-evaluated forcing (e.g. a `StressFunction` wind computed from
``grid.lon_cc``/``lat_cc``) is traced into the step graph, where XLA fuses
and FMA-contracts it *shape-dependently* — the serial compilation and each
shard compilation produce ulp-different values from identical inputs, and
α-EVP at the reference default α⁺ = 300 amplifies those seeds ~30×/substep
(see docs/design.md "Engineered f32 reproducibility").  Evaluating the
forcing on pinned (TX, TY) Pallas tiles removes the shape dependence: Mosaic
codegen depends only on the block shape, so every decomposition computes
bit-identical per-point values — the forcing-side completion of the
``fixed_tiles`` mechanism (EVP kernel + coefficient derivation +
advection), closing the last decomposition-variant term of the dynamics
path (reference parity bar `distributed_tests_utils.jl:83-86`; the
reference gets this for free from per-point MPI arithmetic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_evp import vmem_compiler_params


def fixed_tile_pointwise(fn, fixed, arrays, scalars=(), interpret=None):
    """Evaluate the elementwise function ``fn(*arrays, *scalars)`` on pinned
    ``fixed = (TX, TY)`` Pallas tiles.

    ``arrays``: same-shape 2-D f32 inputs (edge-padded up to the tile grid —
    pure data movement, cropped back after).  ``scalars``: float scalars
    (e.g. ``clock.time``) passed through SMEM.  ``interpret`` defaults to
    True off-TPU (CPU validation runs the same kernel in interpret mode).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    TX, TY = fixed
    arrays = [jnp.asarray(a, jnp.float32) for a in arrays]
    nxp, nyp = arrays[0].shape
    ntx, nty = -(-nxp // TX), -(-nyp // TY)
    pad = ((0, ntx * TX - nxp), (0, nty * TY - nyp))
    padded = [jnp.pad(a, pad, mode="edge") for a in arrays]
    n_sc = len(scalars)
    params = (jnp.stack([jnp.asarray(s, jnp.float32) for s in scalars])
              if n_sc else jnp.zeros((1,), jnp.float32))
    n_arr = len(arrays)

    def kernel(params_ref, *refs):
        ins = [r[:] for r in refs[:n_arr]]
        sc = [params_ref[i] for i in range(n_sc)]
        refs[n_arr][:] = fn(*ins, *sc)

    blk = pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(ntx, nty),
        out_shape=jax.ShapeDtypeStruct((ntx * TX, nty * TY), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk] * n_arr,
        out_specs=blk,
        interpret=interpret,
        **vmem_compiler_params(interpret),
    )(params, *padded)
    return out[:nxp, :nyp]


def fixed_tile_pointwise_multi(fn, fixed, arrays, scalars=(), interpret=None):
    """Multi-output :func:`fixed_tile_pointwise`: ``fn(*tiles, *scalars)``
    returns a TUPLE of same-shape tiles; each output is evaluated on the same
    pinned (TX, TY) Pallas tile grid and cropped back.  Used by the
    fixed-tile thermodynamics step (full-state column physics on pinned
    tiles → decomposition-invariant full-physics runs)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    TX, TY = fixed
    arrays = [jnp.asarray(a, jnp.float32) for a in arrays]
    nxp, nyp = arrays[0].shape
    ntx, nty = -(-nxp // TX), -(-nyp // TY)
    pad = ((0, ntx * TX - nxp), (0, nty * TY - nyp))
    padded = [jnp.pad(a, pad, mode="edge") for a in arrays]
    n_sc = len(scalars)
    params = (jnp.stack([jnp.asarray(s, jnp.float32) for s in scalars])
              if n_sc else jnp.zeros((1,), jnp.float32))
    n_arr = len(arrays)

    # discover the output arity by abstract evaluation at tile shape
    tile_shape = jax.ShapeDtypeStruct((TX, TY), jnp.float32)
    sc_shape = [jax.ShapeDtypeStruct((), jnp.float32)] * n_sc
    n_out = len(jax.eval_shape(fn, *([tile_shape] * n_arr), *sc_shape))

    if interpret:
        # Interpret mode inlines the kernel body into the enclosing jit,
        # where XLA may fuse it with differently-shaped producers/consumers
        # (serial vs shard graphs) and contract FMAs differently — breaking
        # the decomposition invariance Mosaic gives for free.  Barriers pin
        # the body subgraph to be identical in both graphs.
        padded = list(jax.lax.optimization_barrier(tuple(padded)))
        params = jax.lax.optimization_barrier(params)

    def kernel(params_ref, *refs):
        ins = [r[:] for r in refs[:n_arr]]
        sc = [params_ref[i] for i in range(n_sc)]
        outs = fn(*ins, *sc)
        for o_ref, o in zip(refs[n_arr:], outs):
            o_ref[:] = o.astype(jnp.float32)

    blk = pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(ntx, nty),
        out_shape=[jax.ShapeDtypeStruct((ntx * TX, nty * TY), jnp.float32)
                   ] * n_out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk] * n_arr,
        out_specs=[blk] * n_out,
        interpret=interpret,
        **vmem_compiler_params(interpret),
    )(params, *padded)
    if interpret:
        outs = jax.lax.optimization_barrier(tuple(outs))
    return tuple(o[:nxp, :nyp] for o in outs)
