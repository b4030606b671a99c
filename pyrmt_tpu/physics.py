"""Momentum step (one-fluid blended RK4), adaptive timestep, blended RHS.

Capability parity with pyRMT/functions.py:165-192 (compute_timestep),
:594-683 (momentum_step_rk4), :686-755 (momentum_step_rk4_2solids) and
:818-865 (velocity_rhs_blended_optimized).

TPU-first re-design: ONE generic n-solid momentum step. Solids are stacked on
a leading axis (S, Ny, Nx) and the per-solid pieces (stress, Heaviside,
Kelvin-Voigt, CSF) are ``vmap``-ed; the n-fluid mixture (Jain 2019 Eq. 29)

    sigma = (sum_i H_i - (S-1)) sigma_f + sum_i (1 - H_i) sigma_s_i
    rho   = (sum_i H_i - (S-1)) rho_f   + sum_i (1 - H_i) rho_s

reduces to the reference's single-solid blend (Sec. 4.3) at S=1 and to its
hand-written two-solid variant at S=2. The entire RK4 evaluates as one fused
XLA program — the reference's ~15 NumPy temporaries per stage
(docs/PERFORMANCE.md:28-31) fuse away.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pyrmt_tpu.ops.contact import compute_contact_force
from pyrmt_tpu.ops.fd import (
    diff_upwind_3rd,
    grad_central_x_2nd,
    grad_central_y_2nd,
)
from pyrmt_tpu.ops.levelset import compute_curvature
from pyrmt_tpu.ops.stress import smoothed_heaviside, solid_cauchy_stress


def compute_timestep(
    a, b, dx, dy, CFL, dt_min_cap, mu_s, rho_s, gamma, rho_f,
    mu_f=0.0, eta_s=0.0, kappa=0.0,
):
    """Adaptive dt: min of solid P-wave CFL, fluid advection CFL, Brackbill
    capillary, viscous diffusion, and dt_min_cap
    (parity: pyRMT/functions.py:165-192). With Python-float scalars
    everything but the fluid CFL is a compile-time constant (the single
    traced reduction is max|u|); TRACED physics scalars (from
    ``sim.make_step(traced_params=...)``) take an equivalent jnp path whose
    guards are AD-safe double-wheres, so d(dt)/d(mu_s) etc. flow through
    the adaptive timestep exactly."""
    import numpy as np

    # AD-safe speed norm (double-where): at exact-zero velocity cells
    # (walls, from-rest fields) the raw sqrt's reverse rule is inf and the
    # max-VJP's zero cotangent there makes 0*inf = NaN — this poisoned
    # every adaptive-dt gradient (round-5 dryrun gradient tier). Forward
    # bitwise-identical: sqrt(0) == the zero branch.
    sq = a**2 + b**2
    pos = sq > 0.0
    u_max = jnp.max(jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0))
    dt_fluid = CFL * dx / (u_max + 1e-6)

    if any(isinstance(s, jax.Array)
           for s in (mu_s, rho_s, gamma, rho_f, mu_f, eta_s, kappa)):
        p_arg = (kappa + mu_s * 4.0 / 3.0) / (rho_s + 1e-12)
        cs_solid = jnp.sqrt(jnp.maximum(p_arg, 1e-30))
        dt_solid = CFL * dx / (cs_solid + 1e-14)

        # 1.0 is the float path's *disabled* default for dt_st/dt_visc,
        # NOT a cap on the computed values — mirror that exactly
        st_on = gamma > 1e-12
        g_safe = jnp.where(st_on, gamma, 1.0)
        rho_avg = 0.5 * (rho_s + rho_f)
        dt_st = jnp.where(
            st_on,
            jnp.sqrt((rho_avg * dx**3) / (2.0 * np.pi * g_safe)) * 0.5,
            1.0)

        mu_max = jnp.maximum(mu_f, eta_s)
        rho_min = jnp.minimum(rho_s, rho_f)
        v_on = (mu_max > 1e-12) & (rho_min > 1e-12)
        mu_safe = jnp.where(v_on, mu_max, 1.0)
        dt_visc = jnp.where(v_on, CFL * rho_min * dx**2 / (4.0 * mu_safe),
                            1.0)
        dt_static = jnp.minimum(jnp.minimum(dt_solid, dt_st),
                                jnp.minimum(dt_visc, dt_min_cap))
        return jnp.minimum(dt_fluid, dt_static).astype(u_max.dtype)

    cs_solid = np.sqrt((kappa + mu_s * 4.0 / 3.0) / (rho_s + 1e-12))
    dt_solid = CFL * dx / (cs_solid + 1e-14)

    dt_st = 1.0
    if gamma > 1e-12:
        rho_avg = 0.5 * (rho_s + rho_f)
        dt_st = np.sqrt((rho_avg * dx**3) / (2.0 * np.pi * gamma)) * 0.5

    dt_visc = 1.0
    mu_max = max(mu_f, eta_s)
    rho_min = min(rho_s, rho_f)
    if mu_max > 1e-12 and rho_min > 1e-12:
        dt_visc = CFL * rho_min * dx**2 / (4.0 * mu_max)

    dt_static = min(dt_solid, dt_st, dt_visc, dt_min_cap)
    return jnp.minimum(dt_fluid, dt_static)


def velocity_rhs_blended(
    u, v, p, sig_sxx, sig_sxy, sig_syy, dx, dy, mu_f, Hf, rho_local,
    f_ext_x, f_ext_y, periodic=False,
):
    """Conservative one-fluid RHS: blend stress tensors BEFORE the divergence
    (Jain et al. 2019, Sec. 4.3; parity: pyRMT/functions.py:818-865).

    ``sig_s**`` here are the PRE-BLENDED solid contributions
    sum_i (1-H_i) sigma_s_i, and ``Hf`` is the fluid fraction
    sum_i H_i - (S-1), so the same RHS serves any solid count.
    ``f_ext`` collects surface-tension + contact body forces.

    ``periodic=True`` (static) swaps every stencil for its overlap-grid
    periodic-wrap variant — a DOCUMENTED deviation from the reference,
    whose momentum stencils stay one-sided at the boundary ring even under
    bc_type='periodic' (pyRMT/utils.py boundary closures feed
    functions.py:818-865 unconditionally); that inconsistency against the
    periodic-symbol FFT projection is measured to be unconditionally
    unstable on the pure periodic Taylor-Green vortex (blow-up via
    boundary-ring pressure feedback at t~0.06, N=65 f64 — see
    docs/DESIGN.md #10 and benchmarks/periodic_taylor_green.py).
    """
    if periodic:
        from pyrmt_tpu.ops.fd import (
            diff_upwind_3rd_periodic as dup3,
            grad_central_x_2nd_periodic as gx2,
            grad_central_y_2nd_periodic as gy2,
        )
    else:
        gx2, gy2, dup3 = grad_central_x_2nd, grad_central_y_2nd, diff_upwind_3rd

    du_dx = gx2(u, dx)
    dv_dy = gy2(v, dy)
    du_dy = gy2(u, dy)
    dv_dx = gx2(v, dx)

    sig_xx = Hf * (2.0 * mu_f * du_dx) + sig_sxx
    sig_yy = Hf * (2.0 * mu_f * dv_dy) + sig_syy
    sig_xy = Hf * (mu_f * (du_dy + dv_dx)) + sig_sxy

    div_sigma_x = gx2(sig_xx, dx) + gy2(sig_xy, dy)
    div_sigma_y = gx2(sig_xy, dx) + gy2(sig_yy, dy)

    u_adv = -u * dup3(u, u, dx, 1) - v * dup3(u, v, dy, 0)
    v_adv = -u * dup3(v, u, dx, 1) - v * dup3(v, v, dy, 0)

    dp_dx = gx2(p, dx)
    dp_dy = gy2(p, dy)

    inv_rho = 1.0 / (rho_local + 1e-12)
    rhs_u = u_adv + (div_sigma_x + f_ext_x - dp_dx) * inv_rho
    rhs_v = v_adv + (div_sigma_y + f_ext_y - dp_dy) * inv_rho
    return rhs_u, rhs_v


def _solid_curvature(phi, dx, dy, w_t, curvature, kappa_interface,
                     hf_smooth=0):
    """One solid's curvature field under the configured estimator cascade:
    finite-difference div(grad phi/|grad phi|) (reference parity), optionally
    interface-projected (kappa* — see balanced_csf_forces), optionally
    replaced by the height-function estimate where its columns are valid
    (ops/levelset.py:compute_curvature_hf; the fd/kappa* value is its
    fallback). ``hf_smooth`` > 0 enables the height-function estimator's
    coupled-flow stabilisation (tangential height filtering + convex
    validity/orientation blend — see compute_curvature_hf)."""
    import numpy as np

    kap = compute_curvature(phi, dx, dy)
    if kappa_interface:
        den = 1.0 - phi * kap
        den = jnp.where(den >= 0.0, jnp.maximum(den, 0.25),
                        jnp.minimum(den, -0.25))
        kap = kap / den
    if curvature == "hf":
        from pyrmt_tpu.ops.levelset import compute_curvature_hf

        hh = max(3, int(np.ceil(np.sqrt(2.0) * w_t / min(dx, dy))) + 2)
        kap = compute_curvature_hf(phi, dx, dy, hh, kap, smooth=hf_smooth)
    return kap


def external_forces(phis, H_s, dx, dy, *, gamma, k_rep, w_c, w_t,
                    curvature="fd", kappa_interface=False, hf_smooth=0,
                    st_enabled=None):
    """CSF surface tension + pairwise repulsive contact, constant over the
    RK4 stages (parity: pyRMT/functions.py:621-628 and :785-816).

    ``st_enabled`` (static bool) decouples the structural surface-tension
    gate from ``gamma``'s VALUE so a traced gamma (make_step's
    traced_params mode) can flow through; None derives it from gamma as
    before (requires a Python float)."""
    S = phis.shape[0]
    shape = phis.shape[1:]
    f_ext_x = jnp.zeros(shape, phis.dtype)
    f_ext_y = jnp.zeros(shape, phis.dtype)
    if st_enabled is None:
        st_enabled = gamma > 1e-12
    if st_enabled:
        for i in range(S):
            kap = _solid_curvature(phis[i], dx, dy, w_t, curvature,
                                   kappa_interface, hf_smooth=hf_smooth)
            dH_dx = grad_central_x_2nd(H_s[i], dx)
            dH_dy = grad_central_y_2nd(H_s[i], dy)
            f_ext_x = f_ext_x - gamma * kap * dH_dx
            f_ext_y = f_ext_y - gamma * kap * dH_dy
    if k_rep > 0.0 and S >= 2:
        wc = (2.0 * w_t) if w_c is None else w_c
        for i in range(S):
            for j in range(i + 1, S):
                fcx, fcy = compute_contact_force(phis[i], phis[j], k_rep, wc, dx, dy)
                f_ext_x = f_ext_x + fcx
                f_ext_y = f_ext_y + fcy
    return f_ext_x, f_ext_y


def balanced_csf_forces(phis, H_s, dx, dy, gamma, kappas=None,
                        kappa_interface=False, curvature="fd", w_t=None,
                        hf_smooth=0):
    """Balanced-force CSF (Francois et al. 2006 adapted to this collocated
    Rhie-Chow scheme): the capillary force is sampled COMPACTLY at faces
    with the same discrete gradient the face pressure jump uses,

        Fx_face = -gamma * kappa_face * (H_E - H_C) / dx,

    the cell-centred momentum force is the face average (so the cell
    pressure gradient — the average of the two face-compact gradients —
    cancels it identically), and the face forces also enter the Rhie-Chow
    corrector (ops/poisson.py:compute_divergence_rc). For a face-constant
    curvature estimate the discrete equilibrium p = gamma*kappa*H + const
    then has ZERO parasitic currents to roundoff (pinned in
    tests/test_physics.py); with the real kappa field the residual currents
    come only from curvature variation along the interface. This is the
    balanced-force upgrade the reference names as its own open follow-up
    ("needs a balanced-force CSF", reference benchmarks/README.md Surface
    tension caveat) and never implements.

    ``kappa_interface=True`` additionally projects each curvature sample to
    its value at the NEAREST INTERFACE POINT, kappa* = kappa/(1 - phi*kappa).
    When phi is a true signed-distance field this is exact for ANY smooth
    interface, not just circles: the level curve through a point at offset n
    from the front has curvature kappa_0/(1 + n*kappa_0) (parallel-curve
    identity), and div(grad phi/|grad phi|) IS that level-curve curvature,
    so inverting the identity recovers the front value kappa_0 exactly (up
    to the 2nd-order stencils); only where phi deviates from an SDF (a
    distorted rebuilt map far from the interface) does it degrade. It fixes
    the standard CSF band bias — the raw 1/(R + phi) variation otherwise
    biases the integrated pressure jump by O(w_t/R). Measured on the static
    N=64 drop it cuts the Laplace Delta-p error ~6x (0.38% -> 0.06%); the
    denominator is clamped away from 0 (|den| >= 0.25) so a non-SDF phi far
    from the interface cannot blow it up (the force weight grad-H is zero
    there anyway).

    ``curvature='hf'`` (requires ``w_t``) swaps the estimator for the
    height-function cascade (ops/levelset.py:compute_curvature_hf) with the
    fd/kappa* value as its per-cell fallback — the "better curvature
    estimate" branch of the reference's own named follow-up. It trades the
    SDF assumption for a sharp-fraction reconstruction that only needs
    phi's zero set, at the cost of a larger flat error on well-resolved
    smooth interfaces (see the measured comparison in
    benchmarks/README.md).

    Returns (fx_cell, fy_cell, Fx_face, Fy_face) with faces shaped
    (Ny, Nx-1) / (Ny-1, Nx). ``kappas`` (optional, (S, Ny, Nx)) overrides
    the curvature stack — used by the exact-balance test.
    """
    S = phis.shape[0]
    shape = phis.shape[1:]
    Fx = jnp.zeros((shape[0], shape[1] - 1), phis.dtype)
    Fy = jnp.zeros((shape[0] - 1, shape[1]), phis.dtype)
    for i in range(S):
        if kappas is not None:
            kap = kappas[i]
            if kappa_interface:
                den = 1.0 - phis[i] * kap
                den = jnp.where(den >= 0.0, jnp.maximum(den, 0.25),
                                jnp.minimum(den, -0.25))
                kap = kap / den
        else:
            kap = _solid_curvature(phis[i], dx, dy, w_t, curvature,
                                   kappa_interface, hf_smooth=hf_smooth)
        kx_f = 0.5 * (kap[:, :-1] + kap[:, 1:])
        ky_f = 0.5 * (kap[:-1, :] + kap[1:, :])
        Fx = Fx - gamma * kx_f * (H_s[i][:, 1:] - H_s[i][:, :-1]) / dx
        Fy = Fy - gamma * ky_f * (H_s[i][1:, :] - H_s[i][:-1, :]) / dy
    zx = jnp.zeros((shape[0], 1), phis.dtype)
    zy = jnp.zeros((1, shape[1]), phis.dtype)
    Fx_pad = jnp.concatenate([zx, Fx, zx], axis=1)
    Fy_pad = jnp.concatenate([zy, Fy, zy], axis=0)
    fx_cell = 0.5 * (Fx_pad[:, :-1] + Fx_pad[:, 1:])
    fy_cell = 0.5 * (Fy_pad[:-1, :] + Fy_pad[1:, :])
    return fx_cell, fy_cell, Fx, Fy


def momentum_step_rk4_multi(
    u, v, p, X1s, X2s, phis, velocity_bc, *,
    mu_s, kappa, eta_s, dx, dy, dt, rho_s, rho_f, mu_f, w_t,
    gamma=0.0, stress_w_cut=0.0, stress_clamp=0.0, k_rep=0.0, w_c=None,
    g_x=0.0, g_y=0.0, g_rho_ref=None, ext_override=None,
    st_curvature="fd", st_kappa_interface=False, st_hf_smooth=0,
    use_pallas_rhs=False, use_pallas_rk4=False, pallas_rk4_fn=None,
    pallas_rk4_kwargs=None, periodic=False, st_enabled=None,
):
    """Generic n-solid RK4 momentum step.

    X1s, X2s, phis are (S, Ny, Nx) stacks. Returns
    (u_new, v_new, sxx, sxy, syy, J) with the per-solid stress stacks and J.
    ``g_x, g_y`` add the buoyancy body force (rho_local - g_rho_ref) * g
    (see RMTConfig.g_x; g_rho_ref=None uses rho_f).
    """
    S = X1s.shape[0]

    stress_fn = lambda x1, x2, ph: solid_cauchy_stress(
        x1, x2, dx, dy, mu_s, kappa, ph, w_cut=stress_w_cut, detg_clamp=stress_clamp
    )
    sxx_s, sxy_s, syy_s, J_s = jax.vmap(stress_fn)(X1s, X2s, phis)

    H_s = jax.vmap(lambda ph: smoothed_heaviside(ph, w_t))(phis)
    one_minus_H = 1.0 - H_s
    Hf = jnp.sum(H_s, axis=0) - (S - 1.0)
    rho_local = Hf * rho_f + jnp.sum(one_minus_H, axis=0) * rho_s

    # pre-blended elastic solid stress: sum_i (1-H_i) sigma_i
    sig_sxx_el = jnp.sum(one_minus_H * sxx_s, axis=0)
    sig_sxy_el = jnp.sum(one_minus_H * sxy_s, axis=0)
    sig_syy_el = jnp.sum(one_minus_H * syy_s, axis=0)

    # external body forces constant over the RK4 stages; ext_override
    # (fx, fy) replaces the CSF+contact computation entirely (the caller —
    # sim.make_step with st_method='balanced' — built the forces itself so
    # the projection can share the face-sampled capillary terms)
    if ext_override is not None:
        f_ext_x, f_ext_y = ext_override
    else:
        f_ext_x, f_ext_y = external_forces(
            phis, H_s, dx, dy, gamma=gamma, k_rep=k_rep, w_c=w_c, w_t=w_t,
            curvature=st_curvature, kappa_interface=st_kappa_interface,
            hf_smooth=st_hf_smooth, st_enabled=st_enabled)
    if g_x != 0.0 or g_y != 0.0:
        drho = rho_local - (rho_f if g_rho_ref is None else g_rho_ref)
        f_ext_x = f_ext_x + drho * g_x
        f_ext_y = f_ext_y + drho * g_y

    solid_masks = phis <= 0.0
    use_kv = eta_s > 0.0
    mkv = (
        jnp.sum(solid_masks.astype(u.dtype) * one_minus_H, axis=0)
        if use_kv else jnp.zeros_like(u)
    )

    u_new, v_new = momentum_core(
        u, v, p, sig_sxx_el, sig_sxy_el, sig_syy_el, Hf, rho_local,
        f_ext_x, f_ext_y, mkv, velocity_bc, eta_s=eta_s, dx=dx, dy=dy,
        dt=dt, mu_f=mu_f, use_pallas_rhs=use_pallas_rhs,
        use_pallas_rk4=use_pallas_rk4, pallas_rk4_fn=pallas_rk4_fn,
        pallas_rk4_kwargs=pallas_rk4_kwargs, periodic=periodic,
    )
    return u_new, v_new, sxx_s, sxy_s, syy_s, J_s


def momentum_core(
    u, v, p, sig_sxx_el, sig_sxy_el, sig_syy_el, Hf, rho_local,
    f_ext_x, f_ext_y, mkv, velocity_bc, *, eta_s, dx, dy, dt, mu_f,
    use_pallas_rhs=False, use_pallas_rk4=False, pallas_rk4_fn=None,
    ext_is_zero=False, pallas_rk4_kwargs=None, periodic=False,
):
    """RK4 velocity update from pre-blended fields.

    ``sig_s**_el`` are sum_i (1-H_i) sigma_i, ``mkv`` the Kelvin-Voigt blend
    mask sum_i mask_i (1-H_i) (zeros when eta_s == 0). Used by both
    ``momentum_step_rk4_multi`` and the fused RMT-block path in sim.make_step.
    ``ext_is_zero`` is a STATIC promise that (f_ext_x, f_ext_y) are
    identically zero — the fused kernel then elides those fields.
    """
    use_kv = eta_s > 0.0

    if use_pallas_rk4:
        # fused full-RK4 Pallas kernel: all four stages + per-stage BCs in
        # one VMEM-resident pass (requires a BC with a kernel_spec);
        # pallas_rk4_fn substitutes a caller-provided twin (the shard_map
        # per-shard wrapper from parallel/sharding.py)
        from pyrmt_tpu.kernels.momentum_rk4 import momentum_rk4_pallas

        if velocity_bc.kernel_spec[0] == "periodic":
            # Make the inputs overlap-consistent BEFORE the kernel: the
            # in-kernel periodic BC applies the column copy directly but
            # relies on row Ny-1 == row 0 holding on entry for the row
            # copy to be the identity (kernels/momentum_rk4._apply_bc).
            # The XLA path applies the same BC to the stage-1 inputs, so
            # this pre-application leaves its result unchanged.
            u, v = velocity_bc(u, v)
        if pallas_rk4_fn is not None:
            return pallas_rk4_fn(
                u, v, p, sig_sxx_el, sig_sxy_el, sig_syy_el, Hf, rho_local,
                f_ext_x, f_ext_y, mkv, dt, dx, dy, mu_f, eta_s,
                velocity_bc.kernel_spec,
            )
        return momentum_rk4_pallas(
            u, v, p, sig_sxx_el, sig_sxy_el, sig_syy_el, Hf, rho_local,
            f_ext_x, f_ext_y, mkv, dt, dx, dy, mu_f, eta_s,
            velocity_bc.kernel_spec, has_ext=not ext_is_zero,
            **(pallas_rk4_kwargs or {}),
        )

    if periodic:
        from pyrmt_tpu.ops.fd import (
            grad_central_x_2nd_periodic as gx2,
            grad_central_y_2nd_periodic as gy2,
        )
    else:
        gx2, gy2 = grad_central_x_2nd, grad_central_y_2nd

    def rhs(u_stage, v_stage):
        u_stage, v_stage = velocity_bc(u_stage, v_stage)
        sxx, sxy, syy = sig_sxx_el, sig_sxy_el, sig_syy_el
        if use_kv:
            # Kelvin-Voigt damping: eta_s * rate-of-strain inside each solid,
            # entering through the same (1-H_i) blend as the elastic stress
            # (pyRMT/functions.py:639-651); the per-solid masks enter linearly
            # so the summed mask ``mkv`` is exact.
            du_dx = gx2(u_stage, dx)
            dv_dy = gy2(v_stage, dy)
            du_dy = gy2(u_stage, dy)
            dv_dx = gx2(v_stage, dx)
            sxx = sxx + mkv * (eta_s * du_dx)
            syy = syy + mkv * (eta_s * dv_dy)
            sxy = sxy + mkv * (eta_s * 0.5 * (du_dy + dv_dx))
        if use_pallas_rhs and not periodic:
            from pyrmt_tpu.kernels.momentum_rhs import velocity_rhs_blended_pallas

            return velocity_rhs_blended_pallas(
                u_stage, v_stage, p, sxx, sxy, syy, dx, dy, mu_f, Hf,
                rho_local, f_ext_x, f_ext_y,
            )
        return velocity_rhs_blended(
            u_stage, v_stage, p, sxx, sxy, syy, dx, dy, mu_f, Hf, rho_local,
            f_ext_x, f_ext_y, periodic=periodic,
        )

    k1u, k1v = rhs(u, v)
    k2u, k2v = rhs(u + 0.5 * dt * k1u, v + 0.5 * dt * k1v)
    k3u, k3v = rhs(u + 0.5 * dt * k2u, v + 0.5 * dt * k2v)
    k4u, k4v = rhs(u + dt * k3u, v + dt * k3v)

    u_new = u + (dt / 6.0) * (k1u + 2 * k2u + 2 * k3u + k4u)
    v_new = v + (dt / 6.0) * (k1v + 2 * k2v + 2 * k3v + k4v)
    return velocity_bc(u_new, v_new)


def momentum_step_rk4(
    u, v, p, X1, X2, velocity_bc, mu_s, kappa, eta_s, dx, dy, dt,
    rho_s, rho_f, phi, mu_f, w_t, gamma=0.0, stress_band=False, detg_clamp=3.0,
):
    """Single-solid parity wrapper (pyRMT/functions.py:594-683).

    NOTE one deliberate blend refinement vs the reference: the reference adds
    the Kelvin-Voigt stress directly into sigma_s, which then enters through
    (1-H); we do the same via the generic path (m = mask * (1-H) applied to
    the pre-blended field is identical because sigma_s enters the blend
    linearly)."""
    w_cut = w_t if stress_band else 0.0
    clamp = detg_clamp if stress_band else 0.0
    u_new, v_new, sxx_s, sxy_s, syy_s, J_s = momentum_step_rk4_multi(
        u, v, p, X1[None], X2[None], phi[None], velocity_bc,
        mu_s=mu_s, kappa=kappa, eta_s=eta_s, dx=dx, dy=dy, dt=dt,
        rho_s=rho_s, rho_f=rho_f, mu_f=mu_f, w_t=w_t, gamma=gamma,
        stress_w_cut=w_cut, stress_clamp=clamp,
    )
    return u_new, v_new, sxx_s[0], sxy_s[0], syy_s[0], J_s[0]


def momentum_step_rk4_2solids(
    u, v, p, X1a, X2a, X1b, X2b, velocity_bc, mu_s, kappa, eta_s,
    dx, dy, dt, rho_s, rho_f, phi_a, phi_b, mu_f, w_t,
    k_rep=0.0, w_c=None, detg_clamp=4.0,
):
    """Two-solid parity wrapper (pyRMT/functions.py:686-755): legacy
    interior-only stress with a detG clamp (essential for collisions),
    n=2 mixture, optional repulsive contact. Returns (u, v, min(Ja, Jb))."""
    u_new, v_new, _, _, _, J_s = momentum_step_rk4_multi(
        u, v, p,
        jnp.stack([X1a, X1b]), jnp.stack([X2a, X2b]),
        jnp.stack([phi_a, phi_b]), velocity_bc,
        mu_s=mu_s, kappa=kappa, eta_s=0.0, dx=dx, dy=dy, dt=dt,
        rho_s=rho_s, rho_f=rho_f, mu_f=mu_f, w_t=w_t, gamma=0.0,
        stress_w_cut=0.0, stress_clamp=detg_clamp, k_rep=k_rep, w_c=w_c,
    )
    return u_new, v_new, jnp.minimum(J_s[0], J_s[1])
