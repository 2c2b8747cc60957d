"""Flux-form tracer advection: Centered, UpwindBiased and WENO schemes.

TPU-native replacement for the Oceananigans advection subsystem used by the
reference (`src/sea_ice_advection.jl`, delegating to `WENO(order≤9)`,
`UpwindBiased(order=5)`, `FluxFormAdvection`; see SURVEY.md §2.3).

The tracer divergence mirrors `horizontal_div_Uc`
(`src/sea_ice_advection.jl:51-58`):

    ∇·(U c) = [ δx( Δy_fc · u · ĉˣ ) + δy( Δx_cf · v · ĉʸ ) ] / Az_cc

with ĉ the upwind-biased face reconstruction selected by the sign of the
transporting velocity.  Everything is whole-array shifted-slice arithmetic;
XLA fuses each flux+divergence into one stencil loop.

Reconstruction coefficient sets are the standard ones (UpwindBiased 1/3/5/7,
Jiang–Shu WENO-5, Balsara–Shu WENO-7), written against the face convention
``face I sits between centers I-1 (upwind-left) and I (downwind-right)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .utils import pytree_dataclass, static_field
from .ops import dxc, dyc

# stencil-halo requirements per scheme (cells on each side of a face)
_REQUIRED_HALO = {1: 1, 2: 1, 3: 2, 5: 3, 7: 4, 9: 5}


@pytree_dataclass
class Centered:
    order: int = static_field(default=2)


@pytree_dataclass
class UpwindBiased:
    order: int = static_field(default=3)


@pytree_dataclass
class WENO:
    order: int = static_field(default=5)
    epsilon: float = static_field(default=1e-8)


@pytree_dataclass
class FluxFormAdvection:
    """Direction-split advection: independent schemes for x and y fluxes
    (`src/sea_ice_advection.jl:47-49,56-58`)."""
    x: object = static_field()
    y: object = static_field()


def required_halo(scheme):
    if scheme is None:
        return 1
    if isinstance(scheme, FluxFormAdvection):
        return max(required_halo(scheme.x), required_halo(scheme.y))
    return _REQUIRED_HALO[scheme.order]


# --- shift helpers -----------------------------------------------------------

def _cm(c, axis, k):
    """c[I-k] along axis."""
    return jnp.roll(c, k, axis)


def _cp(c, axis, k):
    """c[I+k] along axis."""
    return jnp.roll(c, -k, axis)


# --- biased reconstructions at face I ----------------------------------------

def _upwind_faces(c, axis, order):
    """(left_biased, right_biased) reconstructions at face I."""
    m = lambda k: _cm(c, axis, k)
    p = lambda k: _cp(c, axis, k)
    if order == 1:
        return m(1), c
    if order == 3:
        left = (-m(2) + 5 * m(1) + 2 * c) / 6
        right = (2 * m(1) + 5 * c - p(1)) / 6
        return left, right
    if order == 5:
        left = (2 * m(3) - 13 * m(2) + 47 * m(1) + 27 * c - 3 * p(1)) / 60
        right = (2 * p(2) - 13 * p(1) + 47 * c + 27 * m(1) - 3 * m(2)) / 60
        return left, right
    if order == 7:
        left = (-3 * m(4) + 25 * m(3) - 101 * m(2) + 319 * m(1)
                + 214 * c - 38 * p(1) + 4 * p(2)) / 420
        right = (-3 * p(3) + 25 * p(2) - 101 * p(1) + 319 * c
                 + 214 * m(1) - 38 * m(2) + 4 * m(3)) / 420
        return left, right
    raise ValueError(f"unsupported UpwindBiased order {order}")


def _centered_face(c, axis, order):
    m = lambda k: _cm(c, axis, k)
    p = lambda k: _cp(c, axis, k)
    if order == 2:
        return 0.5 * (m(1) + c)
    if order == 4:
        return (-m(2) + 7 * m(1) + 7 * c - p(1)) / 12
    raise ValueError(f"unsupported Centered order {order}")


def _weno5_side(s, eps_):
    """One-sided WENO-5 from the 5-point stencil ``s`` listed upwind→downwind:
    s = (c[I-3], c[I-2], c[I-1], c[I], c[I+1]) for the left-biased value."""
    a, b, cc, d, e = s
    v0 = (2 * a - 7 * b + 11 * cc) / 6
    v1 = (-b + 5 * cc + 2 * d) / 6
    v2 = (2 * cc + 5 * d - e) / 6
    b0 = 13 / 12 * (a - 2 * b + cc) ** 2 + 0.25 * (a - 4 * b + 3 * cc) ** 2
    b1 = 13 / 12 * (b - 2 * cc + d) ** 2 + 0.25 * (b - d) ** 2
    b2 = 13 / 12 * (cc - 2 * d + e) ** 2 + 0.25 * (3 * cc - 4 * d + e) ** 2
    w0 = 0.1 / (eps_ + b0) ** 2
    w1 = 0.6 / (eps_ + b1) ** 2
    w2 = 0.3 / (eps_ + b2) ** 2
    ws = w0 + w1 + w2
    return (w0 * v0 + w1 * v1 + w2 * v2) / ws


def _weno7_side(s, eps_):
    """One-sided WENO-7 (Balsara & Shu 2000) from the 7-point stencil listed
    upwind→downwind: (c[I-4], ..., c[I+2]) for the left-biased value."""
    u1, u2, u3, u4, u5, u6, u7 = s
    q0 = (-3 * u1 + 13 * u2 - 23 * u3 + 25 * u4) / 12
    q1 = (u2 - 5 * u3 + 13 * u4 + 3 * u5) / 12
    q2 = (-u3 + 7 * u4 + 7 * u5 - u6) / 12
    q3 = (3 * u4 + 13 * u5 - 5 * u6 + u7) / 12

    b0 = (u1 * (547 * u1 - 3882 * u2 + 4642 * u3 - 1854 * u4)
          + u2 * (7043 * u2 - 17246 * u3 + 7042 * u4)
          + u3 * (11003 * u3 - 9402 * u4) + 2107 * u4 ** 2)
    b1 = (u2 * (267 * u2 - 1642 * u3 + 1602 * u4 - 494 * u5)
          + u3 * (2843 * u3 - 5966 * u4 + 1922 * u5)
          + u4 * (3443 * u4 - 2522 * u5) + 547 * u5 ** 2)
    b2 = (u3 * (547 * u3 - 2522 * u4 + 1922 * u5 - 494 * u6)
          + u4 * (3443 * u4 - 5966 * u5 + 1602 * u6)
          + u5 * (2843 * u5 - 1642 * u6) + 267 * u6 ** 2)
    b3 = (u4 * (2107 * u4 - 9402 * u5 + 7042 * u6 - 1854 * u7)
          + u5 * (11003 * u5 - 17246 * u6 + 4642 * u7)
          + u6 * (7043 * u6 - 3882 * u7) + 547 * u7 ** 2)

    g = (1 / 35, 12 / 35, 18 / 35, 4 / 35)
    w0 = g[0] / (eps_ + b0) ** 2
    w1 = g[1] / (eps_ + b1) ** 2
    w2 = g[2] / (eps_ + b2) ** 2
    w3 = g[3] / (eps_ + b3) ** 2
    ws = w0 + w1 + w2 + w3
    return (w0 * q0 + w1 * q1 + w2 * q2 + w3 * q3) / ws


def _weno_faces(c, axis, order, eps_):
    m = lambda k: _cm(c, axis, k)
    p = lambda k: _cp(c, axis, k)
    if order == 5:
        left = _weno5_side((m(3), m(2), m(1), c, p(1)), eps_)
        right = _weno5_side((p(2), p(1), c, m(1), m(2)), eps_)
        return left, right
    if order == 7:
        left = _weno7_side((m(4), m(3), m(2), m(1), c, p(1), p(2)), eps_)
        right = _weno7_side((p(3), p(2), p(1), c, m(1), m(2), m(3)), eps_)
        return left, right
    raise ValueError(f"unsupported WENO order {order}")


def reconstruct_face(scheme, c, axis):
    """(left_biased, right_biased) face reconstructions of a centered field."""
    if isinstance(scheme, Centered):
        f = _centered_face(c, axis, scheme.order)
        return f, f
    if isinstance(scheme, UpwindBiased):
        return _upwind_faces(c, axis, scheme.order)
    if isinstance(scheme, WENO):
        return _weno_faces(c, axis, scheme.order, scheme.epsilon)
    raise TypeError(f"unsupported advection scheme {scheme!r}")


# --- fluxes and divergence ---------------------------------------------------

def advective_tracer_flux_x(grid, scheme, u, c, immersed_mask_fc=None):
    """Ax·u·ĉ at (f,c) with upwind selection by sign(u)."""
    left, right = reconstruct_face(scheme, c, 0)
    chat = jnp.where(u > 0, left, jnp.where(u < 0, right, 0.5 * (left + right)))
    flux = grid.dy_fc * u * chat
    if immersed_mask_fc is not None:
        flux = jnp.where(immersed_mask_fc, 0.0, flux)
    return flux


def advective_tracer_flux_y(grid, scheme, v, c, immersed_mask_cf=None):
    left, right = reconstruct_face(scheme, c, 1)
    chat = jnp.where(v > 0, left, jnp.where(v < 0, right, 0.5 * (left + right)))
    flux = grid.dx_cf * v * chat
    if immersed_mask_cf is not None:
        flux = jnp.where(immersed_mask_cf, 0.0, flux)
    return flux


def horizontal_div_Uc(grid, scheme, u, v, c, masks=None):
    """∇·(U c) at cell centers (`src/sea_ice_advection.jl:51-58`).

    ``masks``: optional (peripheral_fc, peripheral_cf) boolean pair killing
    fluxes through immersed/bounded faces (conditional_flux analog)."""
    if scheme is None:
        return jnp.zeros(grid.shape, grid.np_dtype)
    if isinstance(scheme, FluxFormAdvection):
        sx, sy = scheme.x, scheme.y
    else:
        sx = sy = scheme
    m_fc = masks[0] if masks is not None else None
    m_cf = masks[1] if masks is not None else None
    fx = advective_tracer_flux_x(grid, sx, u, c, m_fc)
    fy = advective_tracer_flux_y(grid, sy, v, c, m_cf)
    return (dxc(fx) + dyc(fy)) / grid.az_cc


def div_Uah(grid, scheme, u, v, a, h, masks=None):
    """Concentration-weighted thickness divergence ∇·(U ℵ h) / (flux-ratio
    form), mirroring `div_Uℵh` (`src/sea_ice_advection.jl:39-49`).  Defined
    for API parity; the reference's tendency kernel does not call it."""
    if scheme is None:
        return jnp.zeros(grid.shape, grid.np_dtype)
    if isinstance(scheme, FluxFormAdvection):
        sx, sy = scheme.x, scheme.y
    else:
        sx = sy = scheme
    m_fc = masks[0] if masks is not None else None
    m_cf = masks[1] if masks is not None else None

    fa_x = advective_tracer_flux_x(grid, sx, u, a) / grid.dy_fc
    fh_x = advective_tracer_flux_x(grid, sx, u, h)
    fx = jnp.where(u == 0, 0.0, fa_x * fh_x / jnp.where(u == 0, 1.0, u))
    if m_fc is not None:
        fx = jnp.where(m_fc, 0.0, fx)

    fa_y = advective_tracer_flux_y(grid, sy, v, a) / grid.dx_cf
    fh_y = advective_tracer_flux_y(grid, sy, v, h)
    fy = jnp.where(v == 0, 0.0, fa_y * fh_y / jnp.where(v == 0, 1.0, v))
    if m_cf is not None:
        fy = jnp.where(m_cf, 0.0, fy)

    return (dxc(fx) + dyc(fy)) / grid.az_cc
