"""Test configuration: CPU backend with 8 virtual devices + float64.

The reference's conservation bars (energy closure rtol 1e-15, mass 1e-12;
`test/test_energy_conservation.jl:87`) require float64, so the parity/test
suite runs on CPU-JAX with x64 enabled, while the perf path runs f32/bf16 on
TPU (SURVEY.md §7 "hard parts" #6).  The 8 virtual CPU devices mirror the
reference's mpiexec-based distributed tests on one machine
(`test/test_distributed_sea_ice.jl:41`).

NOTE: in this container a sitecustomize hook registers the remote-TPU (axon)
PJRT plugin in every interpreter; `jax.config.update("jax_platforms", "cpu")`
below overrides it after the fact (env vars alone are too late by conftest
time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
