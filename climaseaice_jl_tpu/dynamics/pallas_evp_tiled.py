"""Tiled, substep-chunked Pallas EVP kernel for grids too large for the
VMEM-resident whole-loop kernel (pallas_evp.py).

Strategy — the reference's communication-avoiding wide-halo trick
(`split_explicit_momentum_equations.jl:51-64`) applied to the HBM↔VMEM
boundary instead of the network: the domain is split into x-slabs; each slab
is loaded once per K-substep *chunk* with a W = 2K+3-row overlap, runs K
substeps entirely in VMEM (validity shrinking ~2 rows/substep), and stores
its TX interior rows.  HBM traffic drops from ~24 array-passes/substep (jnp
path) to ~(11 reads + 6 writes + overlap-assembly)/K, at the cost of
(TX+2W)/TX redundant compute.

Same supported configuration as the lean whole-loop kernel: uniform
doubly-periodic f32 rectilinear grid, scalar stresses.  The x overlap
(including the periodic wrap) is assembled *outside* the kernel into a
contiguous (n_tiles·(TX+2W), ny) slab array, so BlockSpec's non-overlapping
blocks each see exactly one halo-extended slab; y shifts remain exact
circular rolls.

For ``ny > 1024`` (a slab spanning the full y extent no longer fits VMEM)
the same trick is applied in y: blocks carry a Wy = 64-column wrap overlap
(64 keeps the lane dimension a multiple of 128 and bounds validity shrink
for K ≤ 30), giving a 2-D (n_tiles_x × n_tiles_y) grid of halo-extended
tiles.  Redundant-compute factor at 2048²: ~1.7× — far cheaper than the
jnp path's ~24 HBM array-passes per substep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_evp import (_P_DT, _P_DX, _P_DY, _P_F, _P_TAUU, _P_TAUV, _P_RC,
                         _P_UE, _P_VE, _P_EINV2, _P_AMIN, _P_AMAX, _P_CALPHA,
                         _P_DMIN, _P_MASSMIN, _P_CONCMIN, _P_REPL,
                         VMEM_LIMIT_MB, vmem_compiler_params)


CHUNK_SUBSTEPS = 15          # K cap: max substeps per chunk (see pick_chunk)


def pick_chunk(nsub):
    """Chunk length K for ``nsub`` substeps: the largest divisor of nsub
    ≤ CHUNK_SUBSTEPS (amortizes the per-chunk HBM round-trip and the hoisted
    loop-invariants over as many substeps as possible), or None when nsub has
    no divisor in [2, CHUNK_SUBSTEPS] (prime substep counts > cap: caller
    falls back).  K only affects scheduling — interior results are exact for
    any K with W ≥ 2K+3 — so serial and per-shard runs agree whenever they
    share nsub."""
    for K in range(min(CHUNK_SUBSTEPS, nsub), 1, -1):
        if nsub % K == 0:
            return K
    return None
TILE_ROWS = 512              # TX: max interior rows per slab
WY = 64                      # y-overlap for 2-D tiling (lane-aligned, ≥ 2K+3)
_Y_SLAB_MAX = 2048           # widest full-y slab; beyond this, tile y too
# Pickers budget against the raised Mosaic scoped-VMEM limit (the v5e has
# 128 MB VMEM; see pallas_evp.VMEM_LIMIT_MB), minus headroom for Mosaic
# scratch that doesn't scale with the tile.
_VMEM_BUDGET = (VMEM_LIMIT_MB - 6) * 2 ** 20

_TX_CHOICES = (1024, 768, 512, 384, 256, 192, 128, 96, 64, 32, 16, 8)


def _block_x(TX, K):
    """Halo-extended block rows: TX + 2W rounded up to the sublane rule."""
    bx = TX + 2 * (2 * K + 3)
    return bx + (-bx) % 8


def _slab_vmem(bx, TX, TYb):
    """Affine Mosaic occupancy model for one (bx, TYb) block, calibrated
    on-device: double-buffered 11 input blocks + 6 output blocks plus
    block-sized temporaries — including the ~7 extra mass/strength
    coefficients now hoisted out of the substep body (the pre-hoist
    coefficient was 55)."""
    return (70 * bx + 12 * TX) * TYb * 4


def _pick_tile_rows(N, ny, K):
    """Largest TX dividing N whose slab working set fits the VMEM budget."""
    for TX in _TX_CHOICES:
        if TX > TILE_ROWS or N % TX:
            continue
        if _slab_vmem(_block_x(TX, K), TX, ny) <= _VMEM_BUDGET:
            return TX
    return 8


def _plan_tiles(N, ny, K):
    """Best (TX, TY, Wy) layout for the chunked kernel at a given K: the
    full-y x-slab and the 2-D tiling compete on modeled redundant-compute
    ratio (with Mosaic lane padding priced in).  At ny = 2048 a full-y slab
    still fits VMEM but only at TX = 64 (ratio ≈ 2.1 with K = 15), where the
    2-D (256, 1024) tiling costs ≈ 1.44 — measured 12.8 vs ≈ 16 M pts/s.
    Returns (cost, TX, TY, Wy) or None when nothing fits."""
    options = []
    if ny <= _Y_SLAB_MAX:
        TX = _pick_tile_rows(N, ny, K)
        if TX is not None:
            ny_eff = -(-ny // 128) * 128
            options.append(((_block_x(TX, K) / TX) * (ny_eff / ny),
                            TX, ny, 0))
    t2 = _pick_tiles_2d(N, ny, K)
    if t2 is not None:
        TX, TY = t2
        options.append(((_block_x(TX, K) / TX) * ((TY + 2 * WY) / TY),
                        TX, TY, WY))
    if not options:
        return None
    return min(options, key=lambda o: o[0])


def _plan_chunks(N, ny, nsub):
    """Joint (K, layout) competition: cost = layout ratio × (1 + 4/K) —
    the per-chunk overhead weight calibrated by the round-4 on-chip sweeps
    (pallas_evp_tiled_curvilinear._plan_tiles), where K=12's smaller overlap
    beat K=15's fewer chunks at production sizes.  Returns
    (K, TX, TY, Wy).

    ``CSI_T_PLAN=K,TX,TY,Wy`` overrides the search (perf sweeps on real
    hardware without code edits; correctness is plan-independent — the
    cross-plan bitwise tests in tests/test_pallas_evp.py pin it)."""
    import os
    override = os.environ.get("CSI_T_PLAN")
    if override:
        K, TX, TY, Wy = map(int, override.split(","))
        # A bad override must fail loudly, not silently change the physics
        # (ADVICE r4): K must divide nsub (n_chunks = nsub // K executes
        # exactly nsub substeps only then), tiles must divide the grid, and
        # 2-D blocks must obey the Mosaic %128 lane rule.
        if nsub % K:
            raise ValueError(
                f"CSI_T_PLAN: K={K} does not divide substeps={nsub}")
        if N % TX:
            raise ValueError(f"CSI_T_PLAN: TX={TX} does not divide Nx={N}")
        if Wy == 0:
            if TY != ny:
                raise ValueError(
                    f"CSI_T_PLAN: slab plan (Wy=0) needs TY == Ny ({ny})")
        else:
            if ny % TY:
                raise ValueError(
                    f"CSI_T_PLAN: TY={TY} does not divide Ny={ny}")
            if (TY + 2 * Wy) % 128:
                raise ValueError(
                    f"CSI_T_PLAN: block TY+2*Wy={TY + 2 * Wy} violates the "
                    "Mosaic %128 lane rule")
        return K, TX, TY, Wy
    best = None
    for K in range(min(CHUNK_SUBSTEPS, nsub), 1, -1):
        if nsub % K:
            continue
        plan = _plan_tiles(N, ny, K)
        if plan is None:
            continue
        cost = plan[0] * (1 + 4.0 / K)
        if best is None or cost < best[0]:
            best = (cost, K) + plan[1:]
    if best is None:
        return None
    return best[1:]


def _pick_tiles_2d(N, ny, K):
    """(TX, TY) for the 2-D tiled path: minimize the
    redundant-compute ratio over divisors with lane/sublane-aligned blocks."""
    best = None
    for TY in (2048, 1920, 1792, 1536, 1280, 1024, 896, 768, 640, 512, 384,
               256, 128):
        if ny % TY or (TY + 2 * WY) % 128:
            continue
        for TX in _TX_CHOICES:
            if N % TX:
                continue
            bx = _block_x(TX, K)
            if _slab_vmem(bx, TX, TY + 2 * WY) > _VMEM_BUDGET:
                continue
            ratio = (bx / TX) * ((TY + 2 * WY) / TY)
            if best is None or ratio < best[0]:
                best = (ratio, TX, TY)
            break  # larger TX under the same TY always has a lower ratio
    if best is None:
        return None
    return best[1], best[2]


def _tiled_kernel(K, TX, W, TY, Wy, base_even, repl_on, params_ref,
                  m_ref, a_ref, P_ref, un_ref, vn_ref,
                  u_ref, v_ref, s11_ref, s22_ref, s12_ref, al_ref,
                  o_u_ref, o_v_ref, o_s11_ref, o_s22_ref, o_s12_ref, o_al_ref):
    """One chunk of K substeps on one halo-extended tile
    ((TX+2W) × (TY+2Wy) when 2-D tiled; Wy = 0 → x-slabs spanning full y)."""
    p = params_ref
    dt = p[_P_DT]
    inv_dx = 1.0 / p[_P_DX]
    inv_dy = 1.0 / p[_P_DY]
    inv_az = inv_dx * inv_dy
    f_cor = p[_P_F]
    tau_u_top = p[_P_TAUU]
    tau_v_top = p[_P_TAUV]
    rC = p[_P_RC]
    ue = p[_P_UE]
    ve = p[_P_VE]
    e_inv2 = p[_P_EINV2]
    a_min = p[_P_AMIN]
    a_max = p[_P_AMAX]
    c_alpha = p[_P_CALPHA]
    d_min = p[_P_DMIN]
    mass_min = p[_P_MASSMIN]
    conc_min = p[_P_CONCMIN]

    roll = pltpu.roll

    def sp(q, axis):
        return roll(q, 1, axis)

    def sm(q, axis):
        return roll(q, q.shape[axis] - 1, axis)

    def ixf_(q):
        return 0.5 * (q + sp(q, 0))

    def iyf_(q):
        return 0.5 * (q + sp(q, 1))

    def ixc_(q):
        return 0.5 * (q + sm(q, 0))

    def iyc_(q):
        return 0.5 * (q + sm(q, 1))

    def ixyf_(q):
        t = q + sp(q, 1)
        return 0.25 * (t + sp(t, 0))

    def ixyc_(q):
        t = q + sm(q, 1)
        return 0.25 * (t + sm(t, 0))

    def ixf_yc_(q):
        t = q + sm(q, 1)
        return 0.25 * (t + sp(t, 0))

    def ixc_yf_(q):
        t = q + sp(q, 1)
        return 0.25 * (t + sm(t, 0))

    un = un_ref[:]
    vn = vn_ref[:]

    # Loop-invariant mass/strength-derived coefficients, hoisted out of the
    # substep body: under the original ~16 MB scoped-VMEM limit these were
    # recomputed per substep to keep the live set minimal (the `+ guard`
    # trick blocked hoisting); with the raised 128 MB limit the ~30 % of
    # per-substep VPU work they represent is better spent once per chunk.
    m = m_ref[:]
    a = a_ref[:]
    P = P_ref[:]
    m_fc = ixf_(m)
    a_fc = ixf_(a)
    m_cf = iyf_(m)
    a_cf = iyf_(a)
    ok_u = m_fc > 0
    ok_v = m_cf > 0
    invm_u = jnp.where(ok_u, 1.0 / jnp.where(ok_u, m_fc, 1.0), 0.0)
    invm_v = jnp.where(ok_v, 1.0 / jnp.where(ok_v, m_cf, 1.0), 0.0)
    drag_u = invm_u * a_fc
    drag_v = invm_v * a_cf
    act_u = jnp.where((m_fc >= mass_min) & (a_fc >= conc_min), 1.0, 0.0)
    act_v = jnp.where((m_cf >= mass_min) & (a_cf >= conc_min), 1.0, 0.0)
    m_ff = ixyf_(m)
    Pff = ixyf_(P)
    ok_cc = m > 0
    ok_ff = m_ff > 0
    gcc = jnp.where(ok_cc, c_alpha * dt * inv_az / jnp.where(ok_cc, m, 1.0), -1.0)
    gff = jnp.where(ok_ff, c_alpha * dt * inv_az / jnp.where(ok_ff, m_ff, 1.0), -1.0)

    # Transcendental-lean substep algebra (see pallas_evp._evp_kernel and
    # validation/perf_kernel_surgery.py: ~1.3x, agreement to ulps/substep)
    inv_dt = 1.0 / dt
    inv_dmin = 1.0 / d_min
    amin2 = a_min * a_min
    amax2 = a_max * a_max
    rsqrt = lax.rsqrt
    Ph = 0.5 * P
    Pffh = 0.5 * Pff

    def substep_(carry, even):
        u, v, s11, s22, s12, alpha = carry

        e11 = (sm(u, 0) - u) * inv_dx
        e22 = (sm(v, 1) - v) * inv_dy
        # r5 op diet (FP identities of the r3 forms): eS = 2*e12 carried
        # (4*(eS/2)^2 == eS^2, 2*eta*(eS/2) == eta*eS), fused double
        # interpolations, hoisted halved strengths, static repl branch.
        eS = (u - sp(u, 1)) * inv_dy + (v - sp(v, 0)) * inv_dx
        d_cc = e11 + e22
        t_cc = e11 - e22
        d_ff = ixyf_(d_cc)
        t_ff = ixyf_(t_cc)
        eSc = ixyc_(eS)
        dd_cc = d_cc * d_cc + (t_cc * t_cc + eSc * eSc) * e_inv2
        dd_ff = d_ff * d_ff + (t_ff * t_ff + eS * eS) * e_inv2
        rD_cc = jnp.minimum(rsqrt(dd_cc), inv_dmin)
        rD_ff = jnp.minimum(rsqrt(dd_ff), inv_dmin)
        zcc = Ph * rD_cc
        zff = Pffh * rD_ff
        if repl_on:
            Dcc = jnp.maximum(dd_cc * rD_cc, d_min)
            Prh = Ph * Dcc / (Dcc + d_min)
        else:
            Prh = Ph
        eta_cc = zcc * e_inv2
        eta_ff = zff * e_inv2
        iso = (zcc - eta_cc) * d_cc - Prh
        s11_t = 2 * eta_cc * e11 + iso
        s22_t = 2 * eta_cc * e22 + iso
        s12_t = eta_ff * eS
        g2cc = jnp.clip(zcc * gcc, amin2, amax2)
        g2ff = jnp.clip(zff * gff, amin2, amax2)
        rg_cc = rsqrt(g2cc)
        rg_ff = rsqrt(g2ff)
        ok_g = gcc > 0
        gamma_cc = jnp.where(ok_g, g2cc * rg_cc, a_max)
        s11 = s11 + jnp.where(ok_g, (s11_t - s11) * rg_cc, 0.0)
        s22 = s22 + jnp.where(ok_g, (s22_t - s22) * rg_cc, 0.0)
        s12 = s12 + jnp.where(gff > 0, (s12_t - s12) * rg_ff, 0.0)
        alpha = gamma_cc

        def u_update(u, v):
            div_x = (s11 - sp(s11, 0)) * inv_dx + (sm(s12, 1) - s12) * inv_dy
            v_fc = ixf_yc_(v)
            du = ue - u
            dv = ve - v_fc
            speed = jnp.sqrt(du * du + dv * dv)
            Gu = (f_cor * v_fc - tau_u_top * drag_u + rC * speed * ue * drag_u
                  + div_x * invm_u + (un - u) * inv_dt)
            Gu = jnp.where(ok_u, Gu, 0.0)
            idtau = ixf_(alpha) * inv_dt
            return (u * idtau + Gu) / (idtau + rC * speed * drag_u) * act_u

        def v_update(u, v):
            div_y = (s22 - sp(s22, 1)) * inv_dy + (sm(s12, 0) - s12) * inv_dx
            u_cf = ixc_yf_(u)
            dv = ve - v
            du = ue - u_cf
            speed = jnp.sqrt(du * du + dv * dv)
            Gv = (-f_cor * u_cf - tau_v_top * drag_v + rC * speed * ve * drag_v
                  + div_y * invm_v + (vn - v) * inv_dt)
            Gv = jnp.where(ok_v, Gv, 0.0)
            idtau = iyf_(alpha) * inv_dt
            return (v * idtau + Gv) / (idtau + rC * speed * drag_v) * act_v

        if even:
            u = u_update(u, v)
            v = v_update(u, v)
        else:
            v = v_update(u, v)
            u = u_update(u, v)
        return (u, v, s11, s22, s12, alpha)

    # The kernel is compiled per static chunk-base parity (``base_even``), so
    # every substep's Oceananigans-alternating update order (odd substep:
    # v then u; even: u then v) is statically known — run odd/even pairs with
    # the order unrolled, branch-free (bit-identical to the per-substep
    # `lax.cond` dispatch it replaces; measured ~16 % of kernel time).
    # Substep numbers in this chunk are base+1 … base+K, so the first (and,
    # for odd K, the trailing) substep is even iff the base is odd.
    first_even = not base_even

    def pair(j, carry):
        return substep_(substep_(carry, first_even), not first_even)

    init = (u_ref[:], v_ref[:], s11_ref[:], s22_ref[:], s12_ref[:], al_ref[:])
    carry = lax.fori_loop(0, K // 2, pair, init)
    if K % 2:  # trailing substep of an odd-length chunk
        carry = substep_(carry, first_even)
    u, v, s11, s22, s12, alpha = carry

    sl = slice(W, W + TX)
    sy = slice(Wy, Wy + TY)
    o_u_ref[:] = u[sl, sy]
    o_v_ref[:] = v[sl, sy]
    o_s11_ref[:] = s11[sl, sy]
    o_s22_ref[:] = s22[sl, sy]
    o_s12_ref[:] = s12[sl, sy]
    o_al_ref[:] = alpha[sl, sy]


import numpy as _np


def _slab_indices(N, n_tiles, TX, W):
    """Static row-gather indices building all halo-extended slabs at once."""
    rows = []
    for i in range(n_tiles):
        rows.append((_np.arange(i * TX - W, i * TX + TX + W)) % N)
    return _np.concatenate(rows)


def _index_runs(idx):
    """Decompose a static gather index vector into maximal unit-stride and
    constant runs: ``[(kind, start, length)]`` with kind "u" (idx, idx+1,
    …) or "c" (idx repeated)."""
    runs, i, n = [], 0, len(idx)
    while i < n:
        j = i + 1
        if j < n and idx[j] == idx[i] + 1:
            while j < n and idx[j] == idx[j - 1] + 1:
                j += 1
            runs.append(("u", int(idx[i]), j - i))
        elif j < n and idx[j] == idx[i]:
            while j < n and idx[j] == idx[i]:
                j += 1
            runs.append(("c", int(idx[i]), j - i))
        else:
            runs.append(("u", int(idx[i]), 1))
        i = j
    return runs


def gather_as_slices(q, idx, axis):
    """``jnp.take(q, idx, axis)`` for piecewise unit-stride/constant static
    index vectors, lowered as slices + broadcasts + one concat.

    The overlapped-tile gathers of every tiled EVP tier are of this form
    (each tile window is contiguous modulo a periodic wrap or edge clamp),
    and XLA lowers slice+concat to plain DMA while a general take() at
    slab size compiled to a gather loop costing ~1.3 ms/chunk on a v5e —
    the dominant per-chunk fixed cost (r5 measurement; the fix took the
    tripolar flagship 14.1 → 15.5 M pts/s).  Bitwise-identical data."""
    runs = _index_runs(idx)
    if len(runs) == 1 and runs[0] == ("u", 0, q.shape[axis]):
        return q
    parts = []
    for kind, s, L in runs:
        sl = [slice(None)] * q.ndim
        sl[axis] = slice(s, s + (L if kind == "u" else 1))
        piece = q[tuple(sl)]
        if kind == "c" and L > 1:
            shp = list(piece.shape)
            shp[axis] = L
            piece = jnp.broadcast_to(piece, shp)
        parts.append(piece)
    return jnp.concatenate(parts, axis)


def _slabs(q, n_tiles, TX, W, nty=1, TY=None, Wy=0):
    """(N, ny) doubly-periodic array → contiguous halo-extended tiles
    ((n_tiles·(TX+2W), nty·(TY+2Wy))): one static slices+concat gather per
    dim, so non-overlapping BlockSpec blocks each get one."""
    idx = _slab_indices(q.shape[0], n_tiles, TX, W)
    q = gather_as_slices(q, idx, 0)
    if nty > 1 or Wy:
        idy = _slab_indices(q.shape[1], nty, TY, Wy)
        q = gather_as_slices(q, idy, 1)
    return q


def tiled_chunked_evp(nsub, params, m, a, P, un, vn,
                      u, v, s11, s22, s12, alpha, interpret=False,
                      repl_on=True):
    """Run ``nsub`` substeps in chunks of CHUNK_SUBSTEPS over TILE_ROWS-row
    x-slabs.  Operands are interior-only (N, ny) f32 arrays; returns the six
    updated carry arrays.  Requires N % TILE_ROWS == 0 and a chunkable nsub
    (checked by the caller via pick_chunk)."""
    N, ny = u.shape
    K, TX, TY, Wy = _plan_chunks(N, ny, nsub)
    n_tiles = N // TX
    nty = ny // TY
    W = 2 * K + 3
    while (TX + 2 * W) % 8:  # Mosaic needs sublane-divisible block rows
        W += 1
    n_chunks = nsub // K

    blk_in = pl.BlockSpec((TX + 2 * W, TY + 2 * Wy), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)

    const_slabs = [_slabs(q, n_tiles, TX, W, nty, TY, Wy)
                   for q in (m, a, P, un, vn)]

    def run_chunk(base_even, carry):
        u, v, s11, s22, s12, alpha = carry
        kernel = functools.partial(_tiled_kernel, K, TX, W, TY, Wy, base_even,
                                   repl_on)
        carry_slabs = [_slabs(q, n_tiles, TX, W, nty, TY, Wy)
                       for q in (u, v, s11, s22, s12, alpha)]
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles, nty),
            out_shape=[jax.ShapeDtypeStruct((N, ny), jnp.float32)] * 6,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [blk_in] * 11,
            out_specs=[blk_out] * 6,
            interpret=interpret,
            **vmem_compiler_params(interpret),
        )(params, *const_slabs, *carry_slabs)
        return tuple(outs)

    # Chunk k covers substeps k·K+1 … (k+1)·K; the kernel bakes the base
    # parity in statically (branch-free substep order).  Even K: every base
    # is even — one kernel, scanned.  Odd K: base parity alternates per
    # chunk — scan even/odd chunk *pairs* (two compiled variants), plus a
    # trailing even-base chunk when the chunk count is odd.
    carry = (u, v, s11, s22, s12, alpha)
    if K % 2 == 0:
        def chunk(carry, _):
            return run_chunk(True, carry), None

        carry, _ = lax.scan(chunk, carry, None, length=n_chunks)
    else:
        def chunk2(carry, _):
            return run_chunk(False, run_chunk(True, carry)), None

        carry, _ = lax.scan(chunk2, carry, None, length=n_chunks // 2)
        if n_chunks % 2:
            carry = run_chunk(True, carry)
    return carry
