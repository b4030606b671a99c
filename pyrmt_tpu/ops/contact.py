"""Solid-solid repulsive contact force (Valkov 2015 / Jain 2019 Sec. 3.6).

Capability parity with ``compute_contact_force``
(pyRMT/functions.py:785-816): mid-surface level set phi12 = (phi1-phi2)/2,
short-range cosine-bump repulsion of half-width w_c pushing each solid away
from the mid-surface, active only inside either solid.
"""
from __future__ import annotations

import jax.numpy as jnp

from pyrmt_tpu.ops.fd import grad_central_x_2nd, grad_central_y_2nd


def compute_contact_force(phi1, phi2, k_rep, w_c, dx, dy):
    """Return (fx, fy) body-force densities (zero where not in contact)."""
    phi12 = 0.5 * (phi1 - phi2)
    aphi = jnp.abs(phi12)
    delta = jnp.where(
        aphi < w_c, (1.0 + jnp.cos(jnp.pi * phi12 / w_c)) / (2.0 * w_c), 0.0
    )

    g12x = grad_central_x_2nd(phi12, dx)
    g12y = grad_central_y_2nd(phi12, dy)
    # AD-safe norm (double-where): where |grad phi12| == 0 (flat mid-surface
    # far from both solids) the raw sqrt's reverse rule is inf and the zero
    # cotangent from delta==0 makes 0*inf = NaN, poisoning every gradient of
    # a contact config (round-5 dryrun gradient tier). Forward is BITWISE
    # the old value: sqrt evaluates to the same number wherever sq > 0, and
    # the zero branch reproduces sqrt(0) = 0.
    sq = g12x**2 + g12y**2
    pos = sq > 0.0
    gmag = jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0) + 1e-12
    n12x = g12x / gmag
    n12y = g12y / gmag

    active = ((phi1 < 0.0) | (phi2 < 0.0)).astype(phi1.dtype)
    s = jnp.sign(phi12)
    fx = k_rep * delta * s * n12x * active
    fy = k_rep * delta * s * n12y * active
    return fx, fy
