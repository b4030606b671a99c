"""Vectorized numpy replicas of the reference's numba kernels.

The upstream-rerun harness executes /root/reference unmodified with a
pure-Python numba stub; that is bit-compatible but far too slow for the
full convergence protocol (grids up to N=512, 2500 fixed-dt steps each).
These replicas vectorize the per-cell loops with the SAME per-element
arithmetic (same expressions, same operation order within each cell), so

  - bilinear_interpolate, diff_upwind_3rd, solid_cauchy_stress are
    BITWISE identical to the pure-Python/numba execution (every output
    element is produced by the identical float op sequence; np.where
    merely selects between branch values computed the same way), and
  - extrapolate_reference_map preserves the reference's sequential
    in-layer marking (frontier cells processed one at a time in row-major
    order, each seeing earlier same-layer fills) but accumulates the
    little 3x3 normal-equation sums with numpy reductions, whose pairwise
    summation order differs from the scalar loop -> deviations at the
    1e-15 relative level, pinned by check_equivalence.py.

Replicated from /root/reference/pyRMT/interpolators.py:4-62,
/root/reference/pyRMT/utils.py:61-114, and
/root/reference/pyRMT/functions.py:48-163,480-579 (arbitration replicas,
not product code -- the framework's own operators live in pyrmt_tpu/).
"""

import numpy as np


def bilinear_interpolate(u, xq, yq, dx, dy, Nx, Ny):
    x = xq / dx
    y = yq / dy
    finite = np.isfinite(x) & np.isfinite(y)
    x = np.where(finite, x, 0.0)
    y = np.where(finite, y, 0.0)
    # clamp BEFORE the int cast (same guards as the reference loop)
    x = np.clip(x, 0.0, Nx - 1.0)
    y = np.clip(y, 0.0, Ny - 1.0)
    ix = np.floor(x).astype(np.int64)
    iy = np.floor(y).astype(np.int64)
    ix = np.minimum(ix, Nx - 2)
    iy = np.minimum(iy, Ny - 2)
    fx = x - ix
    fy = y - iy
    v00 = u[iy, ix]
    v10 = u[iy, ix + 1]
    v01 = u[iy + 1, ix]
    v11 = u[iy + 1, ix + 1]
    out = (1 - fx) * (1 - fy) * v00 + fx * (1 - fy) * v10 + \
          (1 - fx) * fy * v01 + fx * fy * v11
    return np.where(finite, out, np.nan)


def _upwind_interior_x(f, u, h):
    """3rd-order upwind-biased x-derivative on columns 2..Nx-3."""
    fp1 = f[:, 3:-1]
    f0 = f[:, 2:-2]
    fm1 = f[:, 1:-3]
    fm2 = f[:, 0:-4]
    fp2 = f[:, 4:]
    pos = (2 * fp1 + 3 * f0 - 6 * fm1 + fm2) / (6 * h)
    neg = (-fp2 + 6 * fp1 - 3 * f0 - 2 * fm1) / (6 * h)
    return np.where(u[:, 2:-2] > 0, pos, neg)


def diff_upwind_3rd(f, u, h, axis):
    if axis == 0:
        return diff_upwind_3rd(f.T, u.T, h, 1).T
    Ny, Nx = f.shape
    df = np.zeros_like(f)
    df[:, 2:-2] = _upwind_interior_x(f, u, h)
    # boundary columns: 1st-order upwind fallback, exactly the reference's
    # branch ladder (i=0 always forward, i=Nx-1 always backward, i=1 and
    # i=Nx-2 pick by sign of u)
    df[:, 0] = (f[:, 1] - f[:, 0]) / h
    df[:, -1] = (f[:, -1] - f[:, -2]) / h
    df[:, 1] = np.where(u[:, 1] > 0, (f[:, 1] - f[:, 0]) / h,
                        (f[:, 2] - f[:, 1]) / h)
    df[:, -2] = np.where(u[:, -2] > 0, (f[:, -2] - f[:, -3]) / h,
                         (f[:, -1] - f[:, -2]) / h)
    return df


def solid_cauchy_stress(X1, X2, dx, dy, mu_s, kappa, phi, w_cut=0.0,
                        detg_clamp=0.0):
    Ny, Nx = X1.shape
    sxx = np.zeros((Ny, Nx))
    sxy = np.zeros((Ny, Nx))
    syy = np.zeros((Ny, Nx))
    J = np.ones((Ny, Nx))

    inv_2dx = 1.0 / (2.0 * dx)
    inv_2dy = 1.0 / (2.0 * dy)

    s = (slice(1, -1), slice(1, -1))
    P = phi[1:-1, 1:-1]
    in_band = (P < w_cut) if w_cut > 0.0 else (P <= 0.0)

    cen11 = (X1[1:-1, 2:] - X1[1:-1, 0:-2]) * inv_2dx
    cen21 = (X2[1:-1, 2:] - X2[1:-1, 0:-2]) * inv_2dx
    cen12 = (X1[2:, 1:-1] - X1[0:-2, 1:-1]) * inv_2dy
    cen22 = (X2[2:, 1:-1] - X2[0:-2, 1:-1]) * inv_2dy

    if w_cut > 0.0:
        g11, g21, g12, g22 = cen11, cen21, cen12, cen22
    else:
        left_fluid = phi[1:-1, 0:-2] > 0.0
        right_fluid = phi[1:-1, 2:] > 0.0
        fwd11 = (X1[1:-1, 2:] - X1[1:-1, 1:-1]) / dx
        fwd21 = (X2[1:-1, 2:] - X2[1:-1, 1:-1]) / dx
        bwd11 = (X1[1:-1, 1:-1] - X1[1:-1, 0:-2]) / dx
        bwd21 = (X2[1:-1, 1:-1] - X2[1:-1, 0:-2]) / dx
        g11 = np.where(left_fluid & ~right_fluid, fwd11,
                       np.where(right_fluid & ~left_fluid, bwd11, cen11))
        g21 = np.where(left_fluid & ~right_fluid, fwd21,
                       np.where(right_fluid & ~left_fluid, bwd21, cen21))

        bot_fluid = phi[0:-2, 1:-1] > 0.0
        top_fluid = phi[2:, 1:-1] > 0.0
        fwd12 = (X1[2:, 1:-1] - X1[1:-1, 1:-1]) / dy
        fwd22 = (X2[2:, 1:-1] - X2[1:-1, 1:-1]) / dy
        bwd12 = (X1[1:-1, 1:-1] - X1[0:-2, 1:-1]) / dy
        bwd22 = (X2[1:-1, 1:-1] - X2[0:-2, 1:-1]) / dy
        g12 = np.where(bot_fluid & ~top_fluid, fwd12,
                       np.where(top_fluid & ~bot_fluid, bwd12, cen12))
        g22 = np.where(bot_fluid & ~top_fluid, fwd22,
                       np.where(top_fluid & ~bot_fluid, bwd22, cen22))

    detG = g11 * g22 - g12 * g21
    ok = in_band & (np.abs(detG) >= 1e-10)
    if detg_clamp > 0.0:
        lo = 1.0 / detg_clamp
        detG = np.clip(detG, lo, detg_clamp)
    detG_safe = np.where(ok, detG, 1.0)

    f11, f12 = g22 / detG_safe, -g12 / detG_safe
    f21, f22 = -g21 / detG_safe, g11 / detG_safe

    b11 = f11 * f11 + f12 * f12
    b12 = f11 * f21 + f12 * f22
    b22 = f21 * f21 + f22 * f22

    j_val = 1.0 / detG_safe
    vol_term = kappa * (j_val - 1.0)

    J[s] = np.where(ok, j_val, 1.0)
    sxx[s] = np.where(ok, mu_s * b11 + vol_term, 0.0)
    sxy[s] = np.where(ok, mu_s * b12, 0.0)
    syy[s] = np.where(ok, mu_s * b22 + vol_term, 0.0)
    return sxx, sxy, syy, J


def _solve_3x3(Aw, Bw):
    """Cramer's rule, same expressions as utils.fast_solve_3x3."""
    detA = (Aw[0, 0] * (Aw[1, 1] * Aw[2, 2] - Aw[1, 2] * Aw[2, 1]) -
            Aw[0, 1] * (Aw[1, 0] * Aw[2, 2] - Aw[1, 2] * Aw[2, 0]) +
            Aw[0, 2] * (Aw[1, 0] * Aw[2, 1] - Aw[1, 1] * Aw[2, 0]))
    if abs(detA) < 1e-15:
        return np.zeros(3)
    inv_det = 1.0 / detA
    b0, b1, b2 = Bw[0], Bw[1], Bw[2]
    x = (b0 * (Aw[1, 1] * Aw[2, 2] - Aw[1, 2] * Aw[2, 1]) -
         Aw[0, 1] * (b1 * Aw[2, 2] - Aw[1, 2] * b2) +
         Aw[0, 2] * (b1 * Aw[2, 1] - Aw[1, 1] * b2)) * inv_det
    y = (Aw[0, 0] * (b1 * Aw[2, 2] - Aw[1, 2] * b2) -
         b0 * (Aw[1, 0] * Aw[2, 2] - Aw[1, 2] * Aw[2, 0]) +
         Aw[0, 2] * (Aw[1, 0] * b2 - b1 * Aw[2, 0])) * inv_det
    z = (Aw[0, 0] * (Aw[1, 1] * b2 - b1 * Aw[2, 1]) -
         Aw[0, 1] * (Aw[1, 0] * b2 - b1 * Aw[2, 0]) +
         b0 * (Aw[1, 0] * Aw[2, 1] - Aw[1, 1] * Aw[2, 0])) * inv_det
    return np.array([x, y, z])


def extrapolate_reference_map(X1, X2, phi, dx, dy, max_layers):
    Ny, Nx = X1.shape
    X1_ext = X1.copy()
    X2_ext = X2.copy()

    known_flag = phi < 0

    r2 = (4 * np.sqrt(dx ** 2 + dy ** 2)) ** 2

    for _layer in range(max_layers):
        # frontier identification: unknown interior cell with a known 3x3
        # neighbour -- pure set logic, order-independent, vectorized
        nb = np.zeros((Ny, Nx), dtype=bool)
        k = known_flag
        nb[1:-1, 1:-1] = (k[0:-2, 0:-2] | k[0:-2, 1:-1] | k[0:-2, 2:] |
                          k[1:-1, 0:-2] | k[1:-1, 1:-1] | k[1:-1, 2:] |
                          k[2:, 0:-2] | k[2:, 1:-1] | k[2:, 2:])
        target = np.zeros((Ny, Nx), dtype=bool)
        target[1:-1, 1:-1] = (~k[1:-1, 1:-1]) & nb[1:-1, 1:-1]
        if not target.any():
            break

        # sequential in-layer fill in row-major order (argwhere is C-ordered),
        # preserving the reference's "earlier fills feed later fits" semantics
        for j, i in np.argwhere(target):
            x0 = dx * i
            y0 = dy * j
            jj0, jj1 = max(0, j - 4), min(Ny, j + 5)
            ii0, ii1 = max(0, i - 4), min(Nx, i + 5)
            kwin = known_flag[jj0:jj1, ii0:ii1]
            xi = dx * np.arange(ii0, ii1)
            yi = dy * np.arange(jj0, jj1)
            dist_sq = (xi[None, :] - x0) ** 2 + (yi[:, None] - y0) ** 2
            sel = kwin & (dist_sq <= r2)
            count = int(sel.sum())
            if count < 3:
                continue
            XI = np.broadcast_to(xi[None, :], sel.shape)[sel]
            YI = np.broadcast_to(yi[:, None], sel.shape)[sel]
            w = np.exp(-dist_sq[sel] / r2)
            b1 = X1_ext[jj0:jj1, ii0:ii1][sel]
            b2 = X2_ext[jj0:jj1, ii0:ii1][sel]

            Aw = np.empty((3, 3))
            Aw[0, 0] = w.sum()
            Aw[0, 1] = Aw[1, 0] = (w * XI).sum()
            Aw[0, 2] = Aw[2, 0] = (w * YI).sum()
            Aw[1, 1] = (w * XI * XI).sum()
            Aw[1, 2] = Aw[2, 1] = (w * XI * YI).sum()
            Aw[2, 2] = (w * YI * YI).sum()
            Bw1 = np.array([(w * b1).sum(), (w * XI * b1).sum(),
                            (w * YI * b1).sum()])
            Bw2 = np.array([(w * b2).sum(), (w * XI * b2).sum(),
                            (w * YI * b2).sum()])

            det = (Aw[0, 0] * (Aw[1, 1] * Aw[2, 2] - Aw[1, 2] * Aw[2, 1])
                   - Aw[0, 1] * (Aw[1, 0] * Aw[2, 2] - Aw[1, 2] * Aw[2, 0])
                   + Aw[0, 2] * (Aw[1, 0] * Aw[2, 1] - Aw[1, 1] * Aw[2, 0]))
            if np.abs(det) > 1e-10:
                c1 = _solve_3x3(Aw, Bw1)
                c2 = _solve_3x3(Aw, Bw2)
                X1_ext[j, i] = c1[0] + c1[1] * x0 + c1[2] * y0
                X2_ext[j, i] = c2[0] + c2[1] * x0 + c2[2] * y0
                known_flag[j, i] = True

    return X1_ext, X2_ext


def install():
    """Patch the fast replicas into the imported reference modules.

    Must run BEFORE any benchmarks.* driver module is imported (drivers bind
    pyRMT.functions names at import time); pyRMT.functions' own internal
    calls resolve through module globals, so patching the module attributes
    covers them.
    """
    import pyRMT.functions as F
    import pyRMT.interpolators as I
    import pyRMT.utils as U
    F.bilinear_interpolate = bilinear_interpolate
    I.bilinear_interpolate = bilinear_interpolate
    F.diff_upwind_3rd = diff_upwind_3rd
    U.diff_upwind_3rd = diff_upwind_3rd
    F.solid_cauchy_stress = solid_cauchy_stress
    F.extrapolate_reference_map = extrapolate_reference_map
