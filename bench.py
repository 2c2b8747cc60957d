"""Benchmark: grid-points/s/chip on the EVP + advection step (the BASELINE.md
north-star metric).

Runs the flagship configuration — split-explicit αEVP (120 substeps, the
reference's default, `split_explicit_momentum_equations.jl:31`) + WENO-7
advection + slab thermodynamics, float32 — on the default JAX device (the
real TPU chip under axon; CPU fallback) and prints ONE JSON line.

The reference publishes no benchmark numbers (BASELINE.md), so vs_baseline
is reported against this repo's recorded best (bench_baseline.json) when
present, else 1.0.
"""

import json
import os
import sys
import time

import numpy as np


def build(N, substeps, dtype="float32"):
    import climaseaice_jl_tpu as csi

    km = 1000.0
    grid = csi.RectilinearGrid(size=(N, N), x=(0, 512 * km), y=(0, 512 * km),
                               halo=5, dtype=dtype,
                               topology=("periodic", "periodic"))
    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(),
        coriolis=csi.FPlane(f=1.4e-4),
        top_momentum_stress={"u": 0.1, "v": 0.05},
        bottom_momentum_stress=csi.SemiImplicitStress(),
        solver=csi.SplitExplicitSolver(substeps=substeps))
    model = csi.sea_ice_model(
        grid, dynamics=dynamics,
        ice_thermodynamics=csi.sea_ice_slab_thermodynamics(),
        top_heat_flux=-20.0, bottom_heat_flux=-5.0,
        advection=csi.WENO(order=7), timestepper="SplitRungeKutta3")

    def h0(x, y):
        return 1.0 + 0.25 * np.sin(2 * np.pi * x / (512 * km)) * np.sin(2 * np.pi * y / (512 * km))

    state = csi.initial_state(model, h=h0, a=1.0)
    return model, state


# --- Roofline accounting -----------------------------------------------------
# Arithmetic per grid point per EVP substep, counted from the fused kernel
# body (pallas_evp.py): strain invariants (~30), cc/ff interpolations (~20),
# Δ + ζ (~13), αEVP stress relaxation incl. γ sqrt/clamp (~45), two
# semi-implicit velocity half-updates incl. stress divergence, Coriolis,
# quadratic drag (~100).  Rolls/selects are data movement, not counted.
FLOPS_PER_PT_SUBSTEP = 210
# Non-EVP work per point per outer RK3 step: 3 RK substeps × (WENO-7 tracer
# advection ~3×250 + thermo column ~150 + clipping/ridging ~30).
FLOPS_PER_PT_STEP_OTHER = 2800
# Minimum HBM traffic per point per outer step for the fused tiers: the EVP
# state round-trips once per K-substep chunk (11 loads + 6 stores, ≥1
# chunk), plus ~30 array passes for advection/thermo/housekeeping.
BYTES_PER_PT_STEP_MIN = 4 * (17 * 3 + 30)
# TPU v5e public peaks: 819 GB/s HBM; VPU f32 ≈ 8×128 lanes × 4 ALUs ×
# ~1.7 GHz ≈ 7e12 op/s (FMA counted as 1 — conservative).
HBM_PEAK = 819e9
VPU_PEAK_EST = 7.0e12
# Measured VPU issue ceiling (round-5 recalibration, VERDICT r4 item 3):
# an *independent* microbenchmark bound, not the kernel's own rate.
# Three legs on this chip (validation/scratch_vpu_peak{3,4,5}.py):
#   - looped accumulator streams (per-step VMEM round trips, the shape of
#     unfused stencil code): saturates at 7.9e11 lane-ops/s and is
#     ILP-insensitive from 2 to 16 streams;
#   - unrolled FMA chains with block-shaped operands: ~6.6-8e11 marginal;
#   - unrolled nonlinear chains with scalar constants only (pure in-vreg,
#     zero per-step VMEM operand traffic): 1.09e12 marginal rate,
#     ILP-saturated at <=4 chains (4 and 8 chains agree to 0.5%).
# No construction we could write issues faster than ~1.1e12 lane-ops/s, so
# that is the envelope.  (Round 4's 2.4e12 figure was the fused kernel's
# *counted source-level op rate* — above the measured ceiling, i.e. Mosaic
# folds/fuses ~2x of the counted ops; it was never an independent bound.
# Round 4's multi-stream "peak" harness was also invalidated: its affine
# update chain was strength-reduced by the compiler to 1.5e14 "ops/s",
# 20x over nominal peak — see scratch_vpu_peak3.py's non-affine redesign.)
VPU_ENVELOPE_MEASURED = 1.1e12


def main():
    import jax
    from climaseaice_jl_tpu.model import _step

    N = int(os.environ.get("BENCH_N", 512))
    substeps = int(os.environ.get("BENCH_SUBSTEPS", 120))
    steps = int(os.environ.get("BENCH_STEPS", 10))

    model, state = build(N, substeps)
    step = jax.jit(lambda s, dt: _step(model, s, dt), donate_argnums=(0,))

    dt = 120.0
    # warmup / compile
    state = step(state, dt)
    jax.block_until_ready(state.h)

    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state, dt)
    jax.block_until_ready(state.h)
    elapsed = time.perf_counter() - t0

    pts_per_s = N * N * steps / elapsed

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                prev = json.load(f).get("value")
            if prev:
                vs = pts_per_s / prev
        except Exception:
            pass

    flops_per_pt = FLOPS_PER_PT_SUBSTEP * substeps * 3 + FLOPS_PER_PT_STEP_OTHER
    achieved_flops = flops_per_pt * pts_per_s
    achieved_bytes = BYTES_PER_PT_STEP_MIN * pts_per_s

    print(json.dumps({
        "metric": f"grid-points/s/chip (EVP{substeps}+WENO7+thermo step, {N}x{N} f32, RK3, fused-VMEM EVP)",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(vs, 3),
        "roofline": {
            "flops_per_pt": flops_per_pt,
            "bytes_per_pt_min": BYTES_PER_PT_STEP_MIN,
            "achieved_gflops": round(achieved_flops / 1e9, 1),
            "vpu_frac_est": round(achieved_flops / VPU_PEAK_EST, 3),
            "counted_ops_over_measured_ceiling": round(
                achieved_flops / VPU_ENVELOPE_MEASURED, 3),
            "achieved_hbm_gbps_min": round(achieved_bytes / 1e9, 1),
            "hbm_frac_min": round(achieved_bytes / HBM_PEAK, 4),
            "note": "flops counted from the fused kernel body (see bench.py); "
                    "bytes = fused-tier minimum HBM traffic; peaks: v5e 819 GB/s "
                    "HBM, VPU ~7e12 f32 op/s nominal (FMA=1). ceiling = 1.1e12 "
                    "lane-ops/s, the ILP-saturated in-vreg issue rate measured "
                    "by independent microbenchmarks (scratch_vpu_peak{3,4,5}.py "
                    "— NOT the kernel's own rate). counted/ceiling > 1 means "
                    "the source-level op count overstates issued ops (Mosaic "
                    "FMA-fusion/CSE); since no elementwise code measures above "
                    "the ceiling, a ratio >= 1 is direct evidence the kernel "
                    "is issue-saturated, with zero headroom left in op "
                    "scheduling (headroom, if any, is in issuing FEWER ops)",
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
