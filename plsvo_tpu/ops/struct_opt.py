"""Structure-only optimization: refine 3D landmarks with poses fixed.

TPU-native rebuild of Point::optimize and LineSeg::optimize
(reference: src/feature3D_impl.cpp:36-95 point 3x3 GN; :97-174 line =
two independent endpoint solves). Batched over landmarks AND their
observation slots: one call refines every selected landmark against all of
its stored observations.

The reference runs 5 iterations per landmark on the
`structureoptim_max_pts/Segs` least-recently-optimized landmarks per frame
(src/frame_handler_base.cpp:202-237); selection is host-side, this op is
the numeric kernel.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class StructObs(NamedTuple):
    """Observations of L landmarks in up to O frames (fixed slots)."""

    R_f_w: jnp.ndarray  # (L, O, 3, 3) world->frame rotations
    t_f_w: jnp.ndarray  # (L, O, 3)
    f_obs: jnp.ndarray  # (L, O, 3) observed unit bearings
    valid: jnp.ndarray  # (L, O) bool


def _residuals(pos_w: jnp.ndarray, obs: StructObs):
    """Unit-plane reprojection residuals e (L,O,2) and point Jacobian
    de/dpos (L,O,2,3) (reference: feature3D_impl.cpp:60-80, jacobian_xyz2xyz
    aka point_jac = -dproj/dxyz * R)."""
    xyz = jnp.einsum("loij,lj->loi", obs.R_f_w, pos_w) + obs.t_f_w
    z = jnp.where(jnp.abs(xyz[..., 2]) < 1e-10, 1e-10, xyz[..., 2])
    proj = xyz[..., :2] / z[..., None]
    obs_uv = obs.f_obs[..., :2] / jnp.where(
        jnp.abs(obs.f_obs[..., 2:3]) < 1e-10, 1e-10, obs.f_obs[..., 2:3])
    e = obs_uv - proj  # (L,O,2)
    zi = 1.0 / z
    x, y = xyz[..., 0], xyz[..., 1]
    o = jnp.zeros_like(x)
    # dproj/dxyz_frame
    dpx = jnp.stack([zi, o, -x * zi * zi], -1)  # (L,O,3)
    dpy = jnp.stack([o, zi, -y * zi * zi], -1)
    dproj = jnp.stack([dpx, dpy], -2)  # (L,O,2,3)
    # de/dpos_w = -dproj @ R
    J = -jnp.einsum("loik,lokj->loij", dproj, obs.R_f_w)
    return e, J


@partial(jax.jit, static_argnames=("n_iter",))
def optimize_points(
    pos_w: jnp.ndarray,  # (L,3) initial landmark positions
    obs: StructObs,
    valid: jnp.ndarray,  # (L,) landmarks to refine
    *,
    n_iter: int = 5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-landmark 3x3 GN with chi2 rollback
    (reference: feature3D_impl.cpp:36-95). Returns (new_pos, improved)."""
    f32 = jnp.float32
    L = pos_w.shape[0]

    def chi2_of(p):
        e, _ = _residuals(p, obs)
        m = obs.valid[..., None]
        return jnp.sum(jnp.where(m, e * e, 0.0), axis=(1, 2))  # (L,)

    def body(carry, _):
        p, best_chi2 = carry
        e, J = _residuals(p, obs)
        w = obs.valid.astype(f32)
        A = jnp.einsum("loik,loim,lo->lkm", J, J, w)
        b = -jnp.einsum("loik,loi,lo->lk", J, e, w)
        from plsvo_tpu.batlin import solve3x3
        dp = solve3x3(A, b, 1e-10)
        p_new = p + dp
        chi2_new = chi2_of(p_new)
        improved = (chi2_new < best_chi2) & valid & ~jnp.any(jnp.isnan(dp), -1)
        p_keep = jnp.where(improved[:, None], p_new, p)
        c_keep = jnp.where(improved, chi2_new, best_chi2)
        return (p_keep, c_keep), None

    chi2_init = chi2_of(pos_w)
    (p_fin, chi2_fin), _ = jax.lax.scan(
        body, (pos_w.astype(f32), chi2_init), None, length=n_iter)
    return p_fin, chi2_fin < chi2_init


@partial(jax.jit, static_argnames=("n_iter",))
def optimize_segments(
    spos_w: jnp.ndarray,  # (L,3)
    epos_w: jnp.ndarray,  # (L,3)
    s_obs: StructObs,  # observations of the start endpoints
    e_obs: StructObs,  # observations of the end endpoints
    valid: jnp.ndarray,
    *,
    n_iter: int = 5,
):
    """Two independent endpoint GN solves (reference: feature3D_impl.cpp:97-174)."""
    sp, s_ok = optimize_points(spos_w, s_obs, valid, n_iter=n_iter)
    ep, e_ok = optimize_points(epos_w, e_obs, valid, n_iter=n_iter)
    return sp, ep, s_ok, e_ok
