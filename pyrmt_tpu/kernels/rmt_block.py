"""Pallas TPU kernel: the whole RMT solid pipeline in one VMEM-resident pass.

Per step the reference-map machinery runs, per solid:

    phi   = phi_init(X1, X2)                 (compatibility rebuild)
    mask  = phi <= 0
    X1a, X2a = advect(X1, X2; u, v, dt)      (shared gather-free SL-RK4)
    X1e, X2e = extrapolate(X1a*mask, X2a*mask, phi)   (num_layers sweeps)
    phi2  = phi_init(X1e, X2e)               (rebuild from the advected map)
    sigma, J = solid_cauchy_stress(X1e, X2e, phi2)
    H     = smoothed_heaviside(phi2, w_t)

followed by the n-fluid mixture sums. Each stage is cheap VPU work but the
XLA path round-trips every intermediate through HBM; this kernel keeps one
row tile resident and runs the whole chain, reading (u, v, X1, X2) and
writing (X1e, X2e, phi2, sigma stacks, J, Hf, rho) once.

Halo: the stress needs +-1 of the extrapolated map, extrapolation grows
the valid region inward by 4 rows per sweep, and the advection samples
within +-1 cell of a +-1-cell backtrace (CFL < 1) — so
halo = 2 + 4*num_layers + 1, rounded up to 4*num_layers + 4. Out-of-domain
halo rows are masked exactly like the standalone kernels.

Numerical parity with the composed XLA ops is pinned in tests/test_pallas.py
(f64 interpret mode). Capability parity: pyRMT/functions.py:194-227 (SL-RK4),
:48-163 (extrapolation), :480-592 (stress + Heaviside), :1287-1288 (rebuild).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyrmt_tpu.ops.extrapolate import _WIN, _kernels_1d
from pyrmt_tpu.kernels.extrapolate_fused import (
    _corr_x,
    _corr_y,
    _fit_const_coeff,
    _shz_x,
    _shz_y,
)


def _trim_schedule(num_layers):
    """Stage row-window trim schedule, in whole (8, 128) VPU sublane tiles.

    The per-stage stencil margin is 4 rows (9-tap extrapolation reads +-4),
    but Mosaic cannot concatenate vectors whose sublane offsets differ (the
    x-shift edge closures crash with "result/input offset mismatch on
    non-concat dimension" when fed a value sliced by 4 rows), so cumulative
    trims are floored to multiples of 8: before extrapolation layer ``l``
    the window has shrunk by 8*(l//2) <= 4*l rows per side, and the post
    (rebuild/stress/blend) window by 8*(num_layers//2) <= 4*num_layers.

    Returns (cumulative trim before layer l for l in 0..L-1, post trim)."""
    cums = [8 * (l // 2) for l in range(num_layers)]
    return cums, 8 * (num_layers // 2)


def _sh_edge_x(f, k):
    """f[:, i+k] edge-padded (parity with ops.fd._shift_x)."""
    if k == 0:
        return f
    if k > 0:
        return jnp.concatenate(
            [f[:, k:], jnp.repeat(f[:, -1:], k, axis=1)], axis=1)
    return jnp.concatenate(
        [jnp.repeat(f[:, :1], -k, axis=1), f[:, :k]], axis=1)


def _sh_edge_y(f, k):
    if k == 0:
        return f
    if k > 0:
        return jnp.concatenate(
            [f[k:, :], jnp.repeat(f[-1:, :], k, axis=0)], axis=0)
    return jnp.concatenate(
        [jnp.repeat(f[:1, :], -k, axis=0), f[:k, :]], axis=0)


def _bilinear_local(fields, sx, sy, gx, gy, Nx, Ny):
    """Gather-free bilinear sampling of ``fields`` (list of (R, Nx) arrays)
    at (i + sx, j + sy), |s| < 1 — the in-kernel twin of
    ops.interp.gather_bilinear_local with GLOBAL coordinates (gx, gy).
    """
    dtype = fields[0].dtype
    finite = jnp.isfinite(sx) & jnp.isfinite(sy)
    sx = jnp.where(finite, sx, 0.0)
    sy = jnp.where(finite, sy, 0.0)
    eps = 1e-6
    sx = jnp.clip(sx, -1.0 + eps, 1.0 - eps)
    sy = jnp.clip(sy, -1.0 + eps, 1.0 - eps)
    x = jnp.clip(gx + sx, 0.0, Nx - 1.0)
    y = jnp.clip(gy + sy, 0.0, Ny - 1.0)
    sx = x - gx
    sy = y - gy

    neg_x = sx < 0.0
    neg_y = sy < 0.0
    fx = jnp.where(neg_x, sx + 1.0, sx).astype(dtype)
    fy = jnp.where(neg_y, sy + 1.0, sy).astype(dtype)
    at_right = (gx >= Nx - 1.0) & ~neg_x
    neg_x = neg_x | at_right
    fx = jnp.where(at_right, 1.0, fx)
    at_top = (gy >= Ny - 1.0) & ~neg_y
    neg_y = neg_y | at_top
    fy = jnp.where(at_top, 1.0, fy)

    w00 = (1.0 - fx) * (1.0 - fy)
    w10 = fx * (1.0 - fy)
    w01 = (1.0 - fx) * fy
    w11 = fx * fy

    out = []
    for f in fields:
        # 9 static shifts per field, corners selected per-cell by the signs
        # AT THE OUTPUT CELL (exactly ops.interp.gather_bilinear_local —
        # selecting before shifting would read the neighbour's sign).
        f_xm1 = _sh_edge_x(f, -1)
        f_xp1 = _sh_edge_x(f, 1)
        f_ym1 = _sh_edge_y(f, -1)
        f_yp1 = _sh_edge_y(f, 1)
        f_xm1_ym1 = _sh_edge_y(f_xm1, -1)
        f_xp1_ym1 = _sh_edge_y(f_xp1, -1)
        f_xm1_yp1 = _sh_edge_y(f_xm1, 1)
        f_xp1_yp1 = _sh_edge_y(f_xp1, 1)
        v00 = jnp.where(
            neg_x, jnp.where(neg_y, f_xm1_ym1, f_xm1),
            jnp.where(neg_y, f_ym1, f),
        )
        v10 = jnp.where(
            neg_x, jnp.where(neg_y, f_ym1, f),
            jnp.where(neg_y, f_xp1_ym1, f_xp1),
        )
        v01 = jnp.where(
            neg_x, jnp.where(neg_y, f_xm1, f_xm1_yp1),
            jnp.where(neg_y, f, f_yp1),
        )
        v11 = jnp.where(
            neg_x, jnp.where(neg_y, f, f_yp1),
            jnp.where(neg_y, f_xp1, f_xp1_yp1),
        )
        val = w00 * v00 + w10 * v10 + w01 * v01 + w11 * v11
        out.append(jnp.where(finite, val, jnp.nan))
    return out


def _bicubic_local(fields, masks, sx, sy, gx, gy, Nx, Ny):
    """Gather-free bicubic (Catmull-Rom) sampling of ``fields`` at
    (i + sx, j + sy), |s| < 1 — the in-kernel twin of
    ops.interp.gather_bicubic_local with GLOBAL coordinates (gx, gy).

    The XLA twin realizes the gather path's per-index clipping through
    edge-replicating pads of the FULL grid; here the slab/panel edge is not
    (in general) the domain edge — under the shard_map wrapper the slab
    edge can even hold zero halos — so every stencil tap is clipped into
    the global domain explicitly: a tap at global index g+k with g+k
    outside [0, N-1] selects the shift that lands on the boundary
    row/column instead. On a single device those selects reproduce the
    edge-pad replication bitwise. ``masks`` (aligned with ``fields``;
    entries may be None) selects the BILINEAR sample where False — the
    reference-map band guard (sim.RMTConfig.sl_band_guard).
    """
    from pyrmt_tpu.ops.interp import cubic_convolution

    dtype = fields[0].dtype
    finite = jnp.isfinite(sx) & jnp.isfinite(sy)
    sx = jnp.where(finite, sx, 0.0)
    sy = jnp.where(finite, sy, 0.0)
    eps = 1e-6
    sx = jnp.clip(sx, -1.0 + eps, 1.0 - eps)
    sy = jnp.clip(sy, -1.0 + eps, 1.0 - eps)
    x = jnp.clip(gx + sx, 0.0, Nx - 1.0)
    y = jnp.clip(gy + sy, 0.0, Ny - 1.0)
    sx = x - gx
    sy = y - gy
    neg_x = sx < 0.0
    neg_y = sy < 0.0
    fx = jnp.where(neg_x, sx + 1.0, sx).astype(dtype)
    fy = jnp.where(neg_y, sy + 1.0, sy).astype(dtype)

    # bilinear fallback for band-guarded cells: gather_bicubic_local calls
    # its fallback with the already-clamped displacements; the re-clamp
    # inside _bilinear_local is idempotent, so this matches bitwise. Elided
    # entirely when no field carries a guard mask (raw bicubic).
    if any(m is not None for m in masks):
        bilin = _bilinear_local(fields, sx, sy, gx, gy, Nx, Ny)
    else:
        bilin = [None] * len(fields)

    out = []
    ks = (-2, -1, 0, 1, 2)
    for f, bl, mk in zip(fields, bilin, masks):
        shx = {k: _sh_edge_x(f, k) for k in ks}
        cx = {}
        for k in ks:
            v = shx[k]
            if k < 0:
                for m in range(0, -k):
                    v = jnp.where(gx == m, shx[-m], v)
            elif k > 0:
                for m in range(0, k):
                    v = jnp.where(gx == Nx - 1.0 - m, shx[m], v)
            cx[k] = v
        tap = {}
        for k in ks:
            shy_ = {m: _sh_edge_y(cx[k], m) for m in ks}
            for m in ks:
                v = shy_[m]
                if m < 0:
                    for r in range(0, -m):
                        v = jnp.where(gy == r, shy_[-r], v)
                elif m > 0:
                    for r in range(0, m):
                        v = jnp.where(gy == Ny - 1.0 - r, shy_[r], v)
                tap[(m, k)] = v
        local_min = None
        local_max = None
        rows_v = []
        for m_ in range(4):
            cols = []
            for n_ in range(4):
                v = jnp.where(
                    neg_y,
                    jnp.where(neg_x, tap[(m_ - 2, n_ - 2)],
                              tap[(m_ - 2, n_ - 1)]),
                    jnp.where(neg_x, tap[(m_ - 1, n_ - 2)],
                              tap[(m_ - 1, n_ - 1)]),
                )
                cols.append(v)
                local_min = (v if local_min is None
                             else jnp.minimum(local_min, v))
                local_max = (v if local_max is None
                             else jnp.maximum(local_max, v))
            rows_v.append(
                cubic_convolution(cols[0], cols[1], cols[2], cols[3], fx))
        o = cubic_convolution(rows_v[0], rows_v[1], rows_v[2], rows_v[3], fy)
        o = jnp.clip(o, local_min, local_max)
        if mk is not None:
            o = jnp.where(mk, o, bl)
        out.append(jnp.where(finite, o, jnp.nan))
    return out


def _advect_sl_rk4(qs, u, v, dt, dx, dy, gx, gy, Nx, Ny,
                   interp="bilinear", masks=None):
    """Shared-backtrace gather-free SL-RK4 (twin of
    ops.advect.advect_semilagrangian_rk4_local). ``interp`` selects the
    FINAL gather of ``qs`` ('bilinear' | 'bicubic'); the stage velocity
    samples stay bilinear either way (parity with the XLA path)."""
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    k1x, k1y = u, v
    k2x, k2y = _bilinear_local(
        [u, v], -0.5 * dt * k1x * inv_dx, -0.5 * dt * k1y * inv_dy,
        gx, gy, Nx, Ny)
    k3x, k3y = _bilinear_local(
        [u, v], -0.5 * dt * k2x * inv_dx, -0.5 * dt * k2y * inv_dy,
        gx, gy, Nx, Ny)
    k4x, k4y = _bilinear_local(
        [u, v], -dt * k3x * inv_dx, -dt * k3y * inv_dy, gx, gy, Nx, Ny)
    sx = -(dt / 6.0) * (k1x + 2 * k2x + 2 * k3x + k4x) * inv_dx
    sy = -(dt / 6.0) * (k1y + 2 * k2y + 2 * k3y + k4y) * inv_dy
    if interp == "bicubic":
        return _bicubic_local(
            qs, masks if masks is not None else [None] * len(qs),
            sx, sy, gx, gy, Nx, Ny)
    return _bilinear_local(qs, sx, sy, gx, gy, Nx, Ny)


def _extrap_sweeps(X1b, X2b, known0, fx, fy, interiors, max_layers,
                   cum_trims=None):
    """In-block extrapolation sweeps (same body as extrapolate_fused).

    ``interiors`` is a per-layer list of interior masks. ``cum_trims`` (from
    ``_trim_schedule``) gives the cumulative rows trimmed per side before
    each layer: layer ``l``'s output is only ever consumed within 4 rows per
    remaining stage of the slab core (the kernel halo argument), so rows
    outside that window — trimmed in whole VPU sublane tiles — are dead
    work. The zero-padded stencil taps at the new window edges read exactly
    the kf == 0 (unknown) weights that out-of-domain rows read, so every
    row a later stage consumes is bitwise identical to the untrimmed
    computation. Each ``interiors[l]`` must match layer ``l``'s window
    (masks are REBUILT per window by the caller, outside the scf.if
    regions — slicing an iota-derived mask crashes Mosaic's vector-layout
    pass; trims must stay multiples of 8 or the x-shift concats crash, see
    ``_trim_schedule``).

    Returns (X1e, X2e, row_offset): row_offset is the total rows trimmed
    from the top (``cum_trims[-1]``).
    """
    kf = known0
    one = jnp.ones((), X1b.dtype)
    off = 0
    for layer in range(max_layers):
        trim = 0 if cum_trims is None else cum_trims[layer] - off
        if trim:
            X1b = X1b[trim:-trim, :]
            X2b = X2b[trim:-trim, :]
            kf = kf[trim:-trim, :]
            off += trim
        interior = interiors[layer]
        row_max = jnp.maximum(jnp.maximum(_shz_x(kf, -1), kf), _shz_x(kf, 1))
        neigh = jnp.maximum(
            jnp.maximum(_shz_y(row_max, -1), row_max), _shz_y(row_max, 1))
        frontier = (kf == 0.0) & (neigh > 0.0) & interior

        kX1 = kf * X1b
        kX2 = kf * X2b
        k_1, k_wx, k_wxd, k_wxd2 = _corr_x(
            kf, [fx["1"], fx["wx"], fx["wxd"], fx["wxd2"]])
        x1_wx, x1_wxd = _corr_x(kX1, [fx["wx"], fx["wxd"]])
        x2_wx, x2_wxd = _corr_x(kX2, [fx["wx"], fx["wxd"]])
        count = _corr_y(k_1, [fy["1"]])[0]
        s00, s02, s22 = _corr_y(k_wx, [fy["wy"], fy["wyd"], fy["wyd2"]])
        s01, s12 = _corr_y(k_wxd, [fy["wy"], fy["wyd"]])
        s11 = _corr_y(k_wxd2, [fy["wy"]])[0]
        b1_0, b1_2 = _corr_y(x1_wx, [fy["wy"], fy["wyd"]])
        b1_1 = _corr_y(x1_wxd, [fy["wy"]])[0]
        b2_0, b2_2 = _corr_y(x2_wx, [fy["wy"], fy["wyd"]])
        b2_1 = _corr_y(x2_wxd, [fy["wy"]])[0]

        c1_0, ok = _fit_const_coeff(
            s00, s01, s02, s11, s12, s22, b1_0, b1_1, b1_2, det_eps=1e-10)
        c2_0, _ = _fit_const_coeff(
            s00, s01, s02, s11, s12, s22, b2_0, b2_1, b2_2, det_eps=1e-10)

        accept = frontier & (count >= 3.0) & ok
        X1b = jnp.where(accept, c1_0, X1b)
        X2b = jnp.where(accept, c2_0, X2b)
        kf = jnp.where(accept, one, kf)
    return X1b, X2b, off


def _stress(X1, X2, phi, dx, dy, mu_s, kappa, w_cut, detg_clamp, interior):
    """In-block twin of ops.stress.solid_cauchy_stress (both modes)."""
    inv_2dx = 1.0 / (2.0 * dx)
    inv_2dy = 1.0 / (2.0 * dy)
    X1_xp, X1_xm = _sh_edge_x(X1, 1), _sh_edge_x(X1, -1)
    X2_xp, X2_xm = _sh_edge_x(X2, 1), _sh_edge_x(X2, -1)
    X1_yp, X1_ym = _sh_edge_y(X1, 1), _sh_edge_y(X1, -1)
    X2_yp, X2_ym = _sh_edge_y(X2, 1), _sh_edge_y(X2, -1)

    if w_cut > 0.0:
        in_band = phi < w_cut
        g11 = (X1_xp - X1_xm) * inv_2dx
        g21 = (X2_xp - X2_xm) * inv_2dx
        g12 = (X1_yp - X1_ym) * inv_2dy
        g22 = (X2_yp - X2_ym) * inv_2dy
    else:
        in_band = phi <= 0.0
        phi_xp, phi_xm = _sh_edge_x(phi, 1), _sh_edge_x(phi, -1)
        phi_yp, phi_ym = _sh_edge_y(phi, 1), _sh_edge_y(phi, -1)
        lf = phi_xm > 0.0
        rf = phi_xp > 0.0
        g11 = jnp.where(lf & ~rf, (X1_xp - X1) / dx,
                        jnp.where(rf & ~lf, (X1 - X1_xm) / dx,
                                  (X1_xp - X1_xm) * inv_2dx))
        g21 = jnp.where(lf & ~rf, (X2_xp - X2) / dx,
                        jnp.where(rf & ~lf, (X2 - X2_xm) / dx,
                                  (X2_xp - X2_xm) * inv_2dx))
        bf = phi_ym > 0.0
        tf = phi_yp > 0.0
        g12 = jnp.where(bf & ~tf, (X1_yp - X1) / dy,
                        jnp.where(tf & ~bf, (X1 - X1_ym) / dy,
                                  (X1_yp - X1_ym) * inv_2dy))
        g22 = jnp.where(bf & ~tf, (X2_yp - X2) / dy,
                        jnp.where(tf & ~bf, (X2 - X2_ym) / dy,
                                  (X2_yp - X2_ym) * inv_2dy))

    detG = g11 * g22 - g12 * g21
    nonsingular = jnp.abs(detG) >= 1e-10
    if detg_clamp > 0.0:
        detG = jnp.clip(detG, 1.0 / detg_clamp, detg_clamp)
    active = in_band & nonsingular & interior
    safe_det = jnp.where(active, detG, 1.0)
    inv_det = 1.0 / safe_det
    f11, f12 = g22 * inv_det, -g12 * inv_det
    f21, f22 = -g21 * inv_det, g11 * inv_det
    b11 = f11 * f11 + f12 * f12
    b12 = f11 * f21 + f12 * f22
    b22 = f21 * f21 + f22 * f22
    vol = kappa * (inv_det - 1.0)
    zero = jnp.zeros_like(X1)
    sxx = jnp.where(active, mu_s * b11 + vol, zero)
    sxy = jnp.where(active, mu_s * b12, zero)
    syy = jnp.where(active, mu_s * b22 + vol, zero)
    J = jnp.where(active, inv_det, jnp.ones_like(X1))
    return sxx, sxy, syy, J


def _heaviside(x, w_t):
    inv_wt = 1.0 / w_t
    H = 0.5 * (1.0 + x * inv_wt + jnp.sin(jnp.pi * x * inv_wt) / jnp.pi)
    H = jnp.where(x > w_t, 1.0, H)
    H = jnp.where(x < -w_t, 0.0, H)
    return H


def _panel_width(Nx):
    """Column-panel width: full-width at Nx <= 1024, else the
    power-of-two-reduced width <= 512 dividing Nx.

    Bounds the per-branch temporaries of the tile_skip scf.if: full-width
    branches exceed XLA's 16 MB scoped-vmem stack above Nx = 1024
    (observed OOM at N = 2048; 1024-wide panels still landed 248 KB over
    inside the full-step program). Narrower panels also skip solid-free
    COLUMN ranges, not just rows."""
    if Nx <= 1024:
        return Nx
    pw = Nx
    while pw > 512 and pw % 2 == 0:
        pw //= 2
    return pw


def _make_kernel(phi_inits, dx, dy, Ny, Nx, Nxl, tile, halo, num_layers,
                 w_t, stress_w_cut, stress_clamp,
                 tile_skip, pw, slab_halo, sl_interp, sl_guard):
    """``Ny``/``Nx`` are the GLOBAL domain extents (masks, advection clamp);
    ``Nxl`` is the input slab width (== Nx single-device, local cols +
    2*halo under the 2D shard_map wrapper); ``pw`` the column-panel width.

    The physics scalars (mu_s, kappa, rho_s, rho_f) arrive as SMEM scalar
    operands (``sc_ref`` columns 1-4, dt in column 0) rather than baked
    constants, so TRACED values reach the fused kernel — this is what lets
    ``make_step(traced_params=...)`` differentiate w.r.t. physics scalars
    while keeping the fused forward (round 5; the VJP is still the XLA
    twin's, diff.make_diff_step)."""
    S = len(phi_inits)
    fx, fy = _kernels_1d(dx, dy)

    def kernel(sc_ref, off_ref, *refs):
        # each input field arrives as its OWN (tile, Nxl) prev/cur/next ref
        # triple instead of one stacked (C, tile, Nxl) ref: the stack
        # assembly cost ~27 us/step of HBM concat fusions at N=1024, while
        # separate refs alias the producers' buffers directly.
        C = 2 + 2 * S
        ins = refs[: 3 * C]
        (x1e_ref, x2e_ref, phi_ref, sxx_ref, sxy_ref, syy_ref, j_ref,
         hf_ref, rho_ref, sbxx_ref, sbxy_ref, sbyy_ref) = refs[3 * C :]
        t = pl.program_id(0)
        dt = sc_ref[0, 0]
        mu_s = sc_ref[0, 1]
        kappa = sc_ref[0, 2]
        rho_s = sc_ref[0, 3]
        rho_f = sc_ref[0, 4]

        def widen(k):
            prev, cur, nxt = ins[3 * k], ins[3 * k + 1], ins[3 * k + 2]
            if slab_halo:
                # prev/nxt are halo-row slab refs (input DMA tile + 2*halo
                # rows instead of 3*tile); clamped edge-slab rows differ
                # from the old clamped-neighbour rows but out-of-domain
                # halo rows are never consumed (global-row-index masks) —
                # parity pinned in tests/test_pallas.py.
                return jnp.concatenate(
                    [prev[...], cur[...], nxt[...]], axis=0)
            return jnp.concatenate(
                [prev[tile - halo :, :], cur[...], nxt[:halo, :]], axis=0)

        u, v = widen(0), widen(1)
        Fm = [widen(2 + j) for j in range(2 * S)]  # X1_0, X2_0, X1_1, ...
        dtype = u.dtype

        rows = tile + 2 * halo
        # off_ref holds the GLOBAL (row, col) index of the input's element
        # (0, 0): zeros on a single device, (shard_start - exchange_halo)
        # per split axis under the shard_map wrapper (parallel/sharding.py).
        # Ny/Nx stay the GLOBAL extents so the valid/interior masks and the
        # advection clamp see the true domain boundaries, not the shard's.
        grow = (
            off_ref[0, 0] + t * tile - halo
            + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        )
        coff = off_ref[0, 1]
        sl = tile

        # Column panels: each panel processes cols [c0, c1) from a slice
        # widened by the same halo on each side (the whole row slab is
        # VMEM-resident, so the x-halo is just a wider slice of exact
        # data; cols near the widened edge go progressively stale across
        # the in-panel sweeps exactly like rows near the slab edge, and
        # the core cols written out are > halo away). EVERYTHING beyond
        # the raw input channels is computed per panel at panel width:
        # full-width precomputed fields stay live across the whole panel
        # loop and blow XLA's 16 MB scoped-vmem stack above Nx = 1024
        # (observed at N = 2048).
        npan = max(1, Nxl // pw)

        for pidx in range(npan):
            pwl = Nxl // npan
            c0 = pidx * pwl
            c1 = c0 + pwl
            lo = max(c0 - halo, 0)
            hi = min(c1 + halo, Nxl)
            o0 = c0 - lo

            def slc(a):
                return a[:, lo:hi] if npan > 1 else a

            u_p, v_p = slc(u), slc(v)
            # coordinate/mask arrays at panel width, broadcast to 2D and
            # made DATA-dependent (+ u_p*0, and bool masks kept as full-2D
            # comparisons): Mosaic's scf.if layout pass (the tile_skip
            # branches below) crashes on (rows,1)/(1,w)-shaped vectors
            # inside the regions and on column slices of iota+splat
            # (partially replicated) values captured into them
            gcol_p = (coff + lo
                      + jax.lax.broadcasted_iota(jnp.int32, (1, hi - lo), 1))
            zf_p = u_p * 0.0
            gy_p = grow.astype(dtype) + zf_p
            gx_p = gcol_p.astype(dtype) + zf_p
            valid_p = ((grow >= 0) & (grow <= Ny - 1)
                       & (gcol_p >= 0) & (gcol_p <= Nx - 1))
            interior_p = ((grow > 0) & (grow < Ny - 1)
                          & (gcol_p > 0) & (gcol_p < Nx - 1))

            # Stage row-windows: extrapolation layer l (0-based) only
            # needs the slab trimmed by 4*l rows per side, and the post
            # stage (rebuild/stress/Heaviside/blend) only core +-4 — the
            # halo budget is 4 rows/stage, so everything outside a stage's
            # window is dead work. Trims follow _trim_schedule (whole VPU
            # sublane tiles only). Windowed interior masks are built HERE,
            # outside the scf.if regions: fresh (rows,1) iotas or slices of
            # iota-derived masks inside the branches crash Mosaic's
            # vector-layout pass.
            def row_interior(off, n):
                gr = (off_ref[0, 0] + t * tile - halo + off
                      + jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0))
                return ((gr > 0) & (gr < Ny - 1)
                        & (gcol_p > 0) & (gcol_p < Nx - 1))

            cum_trims, post_off = _trim_schedule(num_layers)
            extrap_interiors = [interior_p] + [
                row_interior(cum_trims[li], rows - 2 * cum_trims[li])
                for li in range(1, num_layers)
            ]
            interior_post = row_interior(post_off, rows - 2 * post_off)
            qs_p = []
            for i in range(S):
                X1_p = slc(Fm[2 * i])
                X2_p = slc(Fm[2 * i + 1])
                phi_p = phi_inits[i](X1_p, X2_p).astype(dtype)
                mask_p = (phi_p <= 0.0).astype(dtype)
                known_p = valid_p & (phi_p < 0.0)
                qs_p.append((X1_p, X2_p, phi_p, mask_p, known_p))

            def full_path(u_p=u_p, v_p=v_p, gx_p=gx_p, gy_p=gy_p,
                          extrap_interiors=extrap_interiors,
                          interior_post=interior_post, post_off=post_off,
                          cum_trims=cum_trims,
                          qs_p=qs_p, c0=c0, c1=c1, o0=o0, pw=pwl):
                # one RK4 backtrace, applied to every component
                comps = []
                cmasks = []
                for (X1, X2, phi, mask, known) in qs_p:
                    comps.extend([X1, X2])
                    if sl_interp == "bicubic" and sl_guard is not None:
                        # band guard at the TARGET cell's pre-advection phi
                        # (parity: sim.make_step's cubic_mask)
                        m = phi < -sl_guard
                        cmasks.extend([m, m])
                    else:
                        cmasks.extend([None, None])
                adv = _advect_sl_rk4(
                    comps, u_p, v_p, dt, dx, dy, gx_p, gy_p, Nx, Ny,
                    interp=sl_interp, masks=cmasks)

                def core(a, roff=0):
                    return a[halo - roff : halo - roff + sl, o0 : o0 + pw]

                Hf_acc = None
                one_mH_sum = None
                sb_xx = sb_xy = sb_yy = None
                for i, (X1, X2, phi, mask, known) in enumerate(qs_p):
                    X1a = adv[2 * i] * mask
                    X2a = adv[2 * i + 1] * mask
                    kf0 = jnp.where(
                        known, jnp.ones((), dtype), jnp.zeros((), dtype))
                    X1e, X2e, eoff = _extrap_sweeps(
                        X1a, X2a, kf0, fx, fy, extrap_interiors, num_layers,
                        cum_trims=cum_trims)
                    # post window: the rebuild/stress only read +-1 of the
                    # core, so trim to the post schedule (may be a no-op
                    # when the last layer already sits on the 8-row floor)
                    ptrim = post_off - eoff
                    if ptrim:
                        X1e = X1e[ptrim:-ptrim, :]
                        X2e = X2e[ptrim:-ptrim, :]
                        eoff = post_off
                    phi2 = phi_inits[i](X1e, X2e).astype(dtype)
                    sxx, sxy, syy, J = _stress(
                        X1e, X2e, phi2, dx, dy, mu_s, kappa,
                        stress_w_cut, stress_clamp, interior_post)
                    H = _heaviside(phi2, w_t)
                    one_mH = 1.0 - H

                    x1e_ref[i, :, c0:c1] = core(X1e, post_off)
                    x2e_ref[i, :, c0:c1] = core(X2e, post_off)
                    phi_ref[i, :, c0:c1] = core(phi2, post_off)
                    sxx_ref[i, :, c0:c1] = core(sxx, post_off)
                    sxy_ref[i, :, c0:c1] = core(sxy, post_off)
                    syy_ref[i, :, c0:c1] = core(syy, post_off)
                    j_ref[i, :, c0:c1] = core(J, post_off)

                    Hf_acc = H if Hf_acc is None else Hf_acc + H
                    one_mH_sum = (
                        one_mH if one_mH_sum is None else one_mH_sum + one_mH)
                    sb_xx = (one_mH * sxx if sb_xx is None
                             else sb_xx + one_mH * sxx)
                    sb_xy = (one_mH * sxy if sb_xy is None
                             else sb_xy + one_mH * sxy)
                    sb_yy = (one_mH * syy if sb_yy is None
                             else sb_yy + one_mH * syy)

                Hf = Hf_acc - (S - 1.0)
                rho_local = Hf * rho_f + one_mH_sum * rho_s
                hf_ref[:, c0:c1] = core(Hf, post_off)
                rho_ref[:, c0:c1] = core(rho_local, post_off)
                sbxx_ref[:, c0:c1] = core(sb_xx, post_off)
                sbxy_ref[:, c0:c1] = core(sb_xy, post_off)
                sbyy_ref[:, c0:c1] = core(sb_yy, post_off)

            if not tile_skip:
                full_path()
                continue

            # Tile-activity skip: when NO in-domain cell of the widened
            # panel has phi <= 0 for any solid, the full pipeline collapses
            # exactly — mask == 0 everywhere forces X1a = X2a = 0, the
            # extrapolation frontier is empty (no known cells), so
            # X1e = X2e = 0; the rebuild is phi_init(0, 0); the zero map
            # has detG = 0, so the stress is 0 and J = 1; the blends reduce
            # to H(phi_init(0,0)). The cheap branch below computes precisely
            # those values with the same ops on the same inputs, so the skip
            # is numerically EXACT, not approximate (pinned vs the XLA path
            # in tests/test_pallas.py with an off-center disc so both
            # branches execute).
            any_solid = None
            for (X1, X2, phi, mask, known) in qs_p:
                a = jnp.any(valid_p & (phi <= 0.0))
                any_solid = a if any_solid is None else (any_solid | a)

            pl.when(any_solid)(full_path)

            def skip_path(u_p=u_p, c0=c0, c1=c1, o0=o0, pw=pwl):
                # CORE-sized computation throughout: slicing a splat-derived
                # array (phi_init of a constant) inside the scf.if region
                # crashes Mosaic's vector-layout pass — and the panel rows
                # are constant here anyway. The zeros fed to phi_init are
                # made data-dependent (u * 0) so the rebuild runs the same
                # VPU ops as the full path instead of being constant-folded
                # at a different precision (observed 1-ulp phi drift
                # otherwise).
                ones_c = jnp.ones((sl, pw), dtype)
                zeros_c = u_p[halo : halo + sl, o0 : o0 + pw] * 0.0
                Hf_acc = None
                one_mH_sum = None
                for i in range(S):
                    phi2 = phi_inits[i](zeros_c, zeros_c).astype(dtype)
                    H = _heaviside(phi2, w_t)
                    x1e_ref[i, :, c0:c1] = zeros_c
                    x2e_ref[i, :, c0:c1] = zeros_c
                    phi_ref[i, :, c0:c1] = phi2
                    sxx_ref[i, :, c0:c1] = zeros_c
                    sxy_ref[i, :, c0:c1] = zeros_c
                    syy_ref[i, :, c0:c1] = zeros_c
                    j_ref[i, :, c0:c1] = ones_c
                    Hf_acc = H if Hf_acc is None else Hf_acc + H
                    one_mH = 1.0 - H
                    one_mH_sum = (
                        one_mH if one_mH_sum is None else one_mH_sum + one_mH)
                Hf = Hf_acc - (S - 1.0)
                rho_local = Hf * rho_f + one_mH_sum * rho_s
                hf_ref[:, c0:c1] = Hf
                rho_ref[:, c0:c1] = rho_local
                sbxx_ref[:, c0:c1] = zeros_c
                sbxy_ref[:, c0:c1] = zeros_c
                sbyy_ref[:, c0:c1] = zeros_c

            pl.when(jnp.logical_not(any_solid))(skip_path)

    return kernel


def rmt_block_supported(Ny, num_layers, S):
    t = 32 if Ny >= 32 else Ny
    while t >= 8 and Ny % t:
        t //= 2
    return S >= 1 and Ny % t == 0 and t >= 4 * num_layers + 4


@partial(
    jax.jit,
    static_argnames=("phi_inits", "dx", "dy", "num_layers", "w_t",
                     "stress_w_cut",
                     "stress_clamp", "tile", "interpret", "Ny_total",
                     "tile_skip", "Nx_total", "panel_width", "slab_halo",
                     "sl_interp", "sl_guard"),
)
def rmt_block_fused(
    u, v, X1s, X2s, dt, *, phi_inits, dx, dy, num_layers, w_t, mu_s, kappa,
    rho_s, rho_f, stress_w_cut=0.0, stress_clamp=0.0, tile=None,
    interpret=False, row_offset=None, Ny_total=None, tile_skip=True,
    col_offset=None, Nx_total=None, panel_width=None, slab_halo=False,
    sl_interp="bilinear", sl_guard=None,
):
    """Fused advect→extrapolate→rebuild→stress→blend pipeline.

    Returns (X1e, X2e, phis, sxx_s, sxy_s, syy_s, J_s, Hf, rho_local,
    sig_sxx_el, sig_sxy_el, sig_syy_el) — everything the momentum step and
    the projection need from the solid machinery. ``phi_inits`` must be a
    (hashable) tuple of jnp-traceable callables.

    ``row_offset`` / ``Ny_total`` (and ``col_offset`` / ``Nx_total`` for a
    column-split mesh axis) support the shard_map wrapper
    (parallel/sharding.py): the inputs are then one shard's rows/cols plus
    an exchanged halo, the offsets (dynamic, may be negative) are the global
    indices of input element (0, 0), and ``Ny_total``/``Nx_total`` the
    global extents. Rows/cols whose results depend on stale halo data lie
    > halo outside the shard core and are sliced away by the wrapper — the
    same staleness argument that makes the single-device prev/next block
    clamping exact.

    ``panel_width`` overrides the column-panel width (tests pin the
    multi-panel path in interpret mode with it; default ``_panel_width``).

    ``sl_interp`` selects the advection's FINAL gather ('bilinear' |
    'bicubic' — the Catmull-Rom variant the reference carries only as
    commented-out code, pyRMT/functions.py:200); ``sl_guard`` (physical phi
    units, or None for raw bicubic) is the band guard: cells with
    phi >= -sl_guard take the bilinear sample (sim.RMTConfig.sl_band_guard).
    The halo budget still closes: bicubic's ±2 stencil around the ±1-cell
    backtrace needs advection inputs within ±3 rows, and the deepest
    consumed advected row sits halo - (4*num_layers + 1) = 3 rows from the
    slab edge — exactly covered.
    """
    S = X1s.shape[0]
    Ny, Nx = u.shape
    if Ny_total is None:
        Ny_total = Ny
    if Nx_total is None:
        Nx_total = Nx
    if panel_width is None:
        panel_width = _panel_width(Nx)
    halo = 4 * num_layers + 4
    if tile is None:
        # 64-row tiles cut the halo-recompute fraction (rows/core 1.5x vs
        # 2.0x) but enlarge the scf.if branch temporaries; safe only on
        # multi-panel grids (panels <= 512 wide) — at full-width Nx <= 1024
        # the 96-row branches overflow the 16 MB scoped-vmem stack.
        tile = 64 if (panel_width < Nx and Ny % 64 == 0) else 32
    t = min(tile, Ny)
    while t >= 8 and Ny % t:
        t //= 2
    if Ny % t or t < halo:
        raise ValueError("grid does not tile; call rmt_block_supported")

    dtype = u.dtype
    fields = [u, v]
    for i in range(S):
        fields += [X1s[i], X2s[i]]
    # dt + physics scalars as ONE (1, 5) SMEM operand: traced values (from
    # make_step's traced_params mode) and Python floats both land here, so
    # the compiled kernel is shared across parameter values.
    sc_arr = jnp.stack([
        jnp.asarray(x, dtype).reshape(())
        for x in (dt, mu_s, kappa, rho_s, rho_f)
    ]).reshape(1, 5)
    roff = 0 if row_offset is None else row_offset
    coff = 0 if col_offset is None else col_offset
    off_arr = jnp.stack([
        jnp.asarray(roff, jnp.int32).reshape(()),
        jnp.asarray(coff, jnp.int32).reshape(()),
    ]).reshape(1, 2)
    grid = (Ny // t,)
    block = pl.BlockSpec((t, Nx), lambda i: (i, 0))
    # halo-row slab operands where the tiling allows (saves ~2x input DMA);
    # fall back to full neighbour blocks otherwise. Opt-in via the
    # ``slab_halo`` argument (cfg.kernel_slab_halo) until the slab
    # BlockSpecs have compiled on the real Mosaic toolchain — parity is
    # pinned in tests/test_pallas.py either way.
    slab_halo = slab_halo and (t % halo == 0) and (Ny % halo == 0)
    if slab_halo:
        hpt = t // halo
        nhb = Ny // halo
        block_prev = pl.BlockSpec(
            (halo, Nx), lambda i: (jnp.maximum(i * hpt - 1, 0), 0))
        block_next = pl.BlockSpec(
            (halo, Nx), lambda i: (jnp.minimum((i + 1) * hpt, nhb - 1), 0))
    else:
        block_prev = pl.BlockSpec(
            (t, Nx), lambda i: (jnp.maximum(i - 1, 0), 0))
        block_next = pl.BlockSpec(
            (t, Nx), lambda i: (jnp.minimum(i + 1, grid[0] - 1), 0))
    scalar_spec = pl.BlockSpec(
        (1, 5), lambda i: (0, 0),
        memory_space=pltpu.SMEM if not interpret else None,
    )
    off_spec = pl.BlockSpec(
        (1, 2), lambda i: (0, 0),
        memory_space=pltpu.SMEM if not interpret else None,
    )
    stack_spec = pl.BlockSpec((S, t, Nx), lambda i: (0, i, 0))
    field_spec = pl.BlockSpec((t, Nx), lambda i: (i, 0))

    kernel = _make_kernel(
        phi_inits, float(dx), float(dy), Ny_total, Nx_total, Nx, t, halo,
        num_layers,
        float(w_t),
        float(stress_w_cut), float(stress_clamp), bool(tile_skip),
        int(panel_width), slab_halo, str(sl_interp),
        None if sl_guard is None else float(sl_guard))
    stackS = jax.ShapeDtypeStruct((S, Ny, Nx), dtype)
    field = jax.ShapeDtypeStruct((Ny, Nx), dtype)
    in_specs = [scalar_spec, off_spec]
    operands = [sc_arr, off_arr]
    for f in fields:
        in_specs += [block_prev, block, block_next]
        operands += [f, f, f]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(stack_spec,) * 7 + (field_spec,) * 5,
        out_shape=(stackS,) * 7 + (field,) * 5,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    # fusion boundary for multi-panel grids only: without it XLA merges
    # downstream consumers (the momentum kernel's 11-channel input
    # stacking) into this custom call's fusion, and the combined
    # scoped-vmem stack overflows the 16 MB limit at N >= 2048 once the
    # tile_skip branches are present. At Nx <= 1024 the merged fusion
    # compiles fine and is ~0.1 ms/step faster — keep it.
    if panel_width < Nx:
        outs = jax.lax.optimization_barrier(outs)
    return outs


# ---------------------------------------------------------------------------
# Split-mode kernel A: fused advect + extrapolate with phi as an INPUT.
#
# The full rmt_block_fused bakes the analytic rebuild phi = phi_init(X1, X2)
# into the pipeline, which excludes every config that post-processes phi
# between the rebuild and its consumers (reinit_method != 'none',
# phi_area_fix, map rebasing's phis0 sampling — sim.rmt_block_fusible).
# This variant keeps the EXPENSIVE stages fused (the shared RK4 backtrace +
# all LSQ extrapolation sweeps — the bulk of the RMT twin's flops) while
# taking the pre-advection phi per solid as an ordinary input channel: the
# caller computes phi with whatever rebuild/reinit/area-fix chain the config
# needs (sim.make_step split mode) and the downstream rebuild/stress/blends
# run as the exact XLA ops. Numerical parity with the composed XLA path is
# pinned in tests/test_pallas.py (f64 interpret mode), same halo/trim
# machinery as the full kernel.
# ---------------------------------------------------------------------------


def _make_advext_kernel(dx, dy, Ny, Nx, Nxl, tile, halo, num_layers,
                        tile_skip, pw, slab_halo, sl_interp, sl_guard, S):
    fx, fy = _kernels_1d(dx, dy)

    def kernel(dt_ref, off_ref, *refs):
        C = 2 + 3 * S            # u, v, then (X1, X2, phi) per solid
        ins = refs[: 3 * C]
        x1e_ref, x2e_ref = refs[3 * C:]
        t = pl.program_id(0)
        dt = dt_ref[0, 0]

        def widen(k):
            prev, cur, nxt = ins[3 * k], ins[3 * k + 1], ins[3 * k + 2]
            if slab_halo:
                return jnp.concatenate(
                    [prev[...], cur[...], nxt[...]], axis=0)
            return jnp.concatenate(
                [prev[tile - halo :, :], cur[...], nxt[:halo, :]], axis=0)

        u, v = widen(0), widen(1)
        Fm = [widen(2 + j) for j in range(3 * S)]  # X1_0, X2_0, phi_0, ...
        dtype = u.dtype

        rows = tile + 2 * halo
        grow = (
            off_ref[0, 0] + t * tile - halo
            + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        )
        coff = off_ref[0, 1]
        sl = tile
        npan = max(1, Nxl // pw)

        for pidx in range(npan):
            pwl = Nxl // npan
            c0 = pidx * pwl
            c1 = c0 + pwl
            lo = max(c0 - halo, 0)
            hi = min(c1 + halo, Nxl)
            o0 = c0 - lo

            def slc(a):
                return a[:, lo:hi] if npan > 1 else a

            u_p, v_p = slc(u), slc(v)
            gcol_p = (coff + lo
                      + jax.lax.broadcasted_iota(jnp.int32, (1, hi - lo), 1))
            zf_p = u_p * 0.0
            gy_p = grow.astype(dtype) + zf_p
            gx_p = gcol_p.astype(dtype) + zf_p
            valid_p = ((grow >= 0) & (grow <= Ny - 1)
                       & (gcol_p >= 0) & (gcol_p <= Nx - 1))

            def row_interior(off, n):
                gr = (off_ref[0, 0] + t * tile - halo + off
                      + jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0))
                return ((gr > 0) & (gr < Ny - 1)
                        & (gcol_p > 0) & (gcol_p < Nx - 1))

            interior_p = row_interior(0, rows)
            cum_trims, post_off = _trim_schedule(num_layers)
            extrap_interiors = [interior_p] + [
                row_interior(cum_trims[li], rows - 2 * cum_trims[li])
                for li in range(1, num_layers)
            ]
            qs_p = []
            for i in range(S):
                X1_p = slc(Fm[3 * i])
                X2_p = slc(Fm[3 * i + 1])
                phi_p = slc(Fm[3 * i + 2])
                mask_p = (phi_p <= 0.0).astype(dtype)
                known_p = valid_p & (phi_p < 0.0)
                qs_p.append((X1_p, X2_p, phi_p, mask_p, known_p))

            def full_path(u_p=u_p, v_p=v_p, gx_p=gx_p, gy_p=gy_p,
                          extrap_interiors=extrap_interiors,
                          post_off=post_off, cum_trims=cum_trims,
                          qs_p=qs_p, c0=c0, c1=c1, o0=o0, pw=pwl):
                comps = []
                cmasks = []
                for (X1, X2, phi, mask, known) in qs_p:
                    comps.extend([X1, X2])
                    if sl_interp == "bicubic" and sl_guard is not None:
                        m = phi < -sl_guard
                        cmasks.extend([m, m])
                    else:
                        cmasks.extend([None, None])
                adv = _advect_sl_rk4(
                    comps, u_p, v_p, dt, dx, dy, gx_p, gy_p, Nx, Ny,
                    interp=sl_interp, masks=cmasks)

                def core(a, roff=0):
                    return a[halo - roff : halo - roff + sl, o0 : o0 + pw]

                for i, (X1, X2, phi, mask, known) in enumerate(qs_p):
                    X1a = adv[2 * i] * mask
                    X2a = adv[2 * i + 1] * mask
                    kf0 = jnp.where(
                        known, jnp.ones((), dtype), jnp.zeros((), dtype))
                    X1e, X2e, eoff = _extrap_sweeps(
                        X1a, X2a, kf0, fx, fy, extrap_interiors, num_layers,
                        cum_trims=cum_trims)
                    ptrim = post_off - eoff
                    if ptrim:
                        X1e = X1e[ptrim:-ptrim, :]
                        X2e = X2e[ptrim:-ptrim, :]
                    x1e_ref[i, :, c0:c1] = core(X1e, post_off)
                    x2e_ref[i, :, c0:c1] = core(X2e, post_off)

            if not tile_skip:
                full_path()
                continue

            # With no phi <= 0 cell anywhere in the widened panel the full
            # pipeline collapses exactly: mask == 0 forces X1a = X2a = 0 and
            # the extrapolation frontier is empty (no known cells), so
            # X1e = X2e = 0 (same argument as the full kernel's skip, pinned
            # vs the XLA path in tests/test_pallas.py).
            any_solid = None
            for (X1, X2, phi, mask, known) in qs_p:
                a = jnp.any(valid_p & (phi <= 0.0))
                any_solid = a if any_solid is None else (any_solid | a)

            pl.when(any_solid)(full_path)

            def skip_path(u_p=u_p, c0=c0, c1=c1, o0=o0, pw=pwl):
                zeros_c = u_p[halo : halo + sl, o0 : o0 + pw] * 0.0
                for i in range(S):
                    x1e_ref[i, :, c0:c1] = zeros_c
                    x2e_ref[i, :, c0:c1] = zeros_c

            pl.when(jnp.logical_not(any_solid))(skip_path)

    return kernel


@partial(
    jax.jit,
    static_argnames=("dx", "dy", "num_layers", "tile", "interpret",
                     "Ny_total", "tile_skip", "Nx_total", "panel_width",
                     "slab_halo", "sl_interp", "sl_guard"),
)
def advext_block_fused(
    u, v, X1s, X2s, phis, dt, *, dx, dy, num_layers, tile=None,
    interpret=False, row_offset=None, Ny_total=None, tile_skip=True,
    col_offset=None, Nx_total=None, panel_width=None, slab_halo=False,
    sl_interp="bilinear", sl_guard=None,
):
    """Fused advect→extrapolate pass with the pre-advection ``phis`` given.

    Split-mode kernel A (see module section comment): returns (X1e, X2e)
    stacks — the advected, masked, ``num_layers``-sweep-extrapolated
    reference maps, exactly what the XLA path's advection+extrapolation
    section produces (sim.make_step steps (3)); the caller supplies
    ``phis`` from whatever rebuild/reinit/area-fix chain the config uses
    and runs the downstream rebuild/stress/blends in XLA.
    Sharding offsets (`row_offset`/`Ny_total`/...) follow rmt_block_fused.
    """
    S = X1s.shape[0]
    Ny, Nx = u.shape
    if Ny_total is None:
        Ny_total = Ny
    if Nx_total is None:
        Nx_total = Nx
    if panel_width is None:
        panel_width = _panel_width(Nx)
    halo = 4 * num_layers + 4
    if tile is None:
        tile = 64 if (panel_width < Nx and Ny % 64 == 0) else 32
    t = min(tile, Ny)
    while t >= 8 and Ny % t:
        t //= 2
    if Ny % t or t < halo:
        raise ValueError("grid does not tile; call rmt_block_supported")

    dtype = u.dtype
    fields = [u, v]
    for i in range(S):
        fields += [X1s[i], X2s[i], phis[i]]
    dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)
    roff = 0 if row_offset is None else row_offset
    coff = 0 if col_offset is None else col_offset
    off_arr = jnp.stack([
        jnp.asarray(roff, jnp.int32).reshape(()),
        jnp.asarray(coff, jnp.int32).reshape(()),
    ]).reshape(1, 2)
    grid = (Ny // t,)
    block = pl.BlockSpec((t, Nx), lambda i: (i, 0))
    slab_halo = slab_halo and (t % halo == 0) and (Ny % halo == 0)
    if slab_halo:
        hpt = t // halo
        nhb = Ny // halo
        block_prev = pl.BlockSpec(
            (halo, Nx), lambda i: (jnp.maximum(i * hpt - 1, 0), 0))
        block_next = pl.BlockSpec(
            (halo, Nx), lambda i: (jnp.minimum((i + 1) * hpt, nhb - 1), 0))
    else:
        block_prev = pl.BlockSpec(
            (t, Nx), lambda i: (jnp.maximum(i - 1, 0), 0))
        block_next = pl.BlockSpec(
            (t, Nx), lambda i: (jnp.minimum(i + 1, grid[0] - 1), 0))
    scalar_spec = pl.BlockSpec(
        (1, 1), lambda i: (0, 0),
        memory_space=pltpu.SMEM if not interpret else None,
    )
    off_spec = pl.BlockSpec(
        (1, 2), lambda i: (0, 0),
        memory_space=pltpu.SMEM if not interpret else None,
    )
    stack_spec = pl.BlockSpec((S, t, Nx), lambda i: (0, i, 0))

    kernel = _make_advext_kernel(
        float(dx), float(dy), Ny_total, Nx_total, Nx, t, halo, num_layers,
        bool(tile_skip), int(panel_width), slab_halo, str(sl_interp),
        None if sl_guard is None else float(sl_guard), S)
    stackS = jax.ShapeDtypeStruct((S, Ny, Nx), dtype)
    in_specs = [scalar_spec, off_spec]
    operands = [dt_arr, off_arr]
    for f in fields:
        in_specs += [block_prev, block, block_next]
        operands += [f, f, f]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(stack_spec,) * 2,
        out_shape=(stackS,) * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    if panel_width < Nx:
        outs = jax.lax.optimization_barrier(outs)
    return outs
