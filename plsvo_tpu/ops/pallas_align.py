"""Pallas TPU kernel: the batched mixed 2-D/1-D inverse-compositional
feature-alignment GN loop in ONE kernel launch.

The XLA formulation (ops/feature_align.py align_mixed_atlas) runs the
10-iteration loop as a lax.while_loop whose body lowers to ~15 separate
XLA kernels per iteration — at production sizes the loop costs ~0.8 ms per
call site (reprojector refine + depth-filter align), dominated by
per-kernel overheads and HBM round-trips of the window-resample
intermediates. This kernel keeps every per-iteration intermediate in
VMEM/registers and runs the whole loop in one launch.

Mechanism (all arrays lane-major over the flattened window):
- windows arrive prefetched as (N, wp*wp) rows (same gather as the XLA
  path: image.gather_patch_windows_atlas)
- per iteration the full bilinear field z2 is built with two lane-rolls
  (vertical/horizontal lerp), the per-unit integer offset is applied by a
  separable one-hot: S vertical roll-MACs, then one MXU matmul against a
  constant extraction matrix E that pulls all S horizontal shifts of the
  8x8 patch rows into su-blocks, then S lane-block MACs select the right
  horizontal shift
- residual reductions (J^T r for the 3-param 2-D and 2-param 1-D models)
  are lane reductions; the tiny per-unit H^-1 matvecs are (N,1) vector ops

Parity: bit-equivalent math to align_mixed_atlas's loop body (same
bilinear weights, same masks, same convergence rule) except iterations are
FIXED at n_iter with converged/invalid rows predicated to no-ops — the
XLA loop's early exit is a latency optimization with identical results.

Reference behaviour covered: feature_alignment.cpp align1D :41-158 /
align2D :160-290 (+ the SSE2/NEON variants these batched kernels subsume).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_lanes(x, k, size):
    """roll x left by k along axis 1 (lanes); k static."""
    if k % size == 0:
        return x
    return pltpu.roll(x, (-k) % size, 1)


def _kernel(win_ref, corner_ref, ref_ref, dx_ref, dy_ref, dg_ref,
            h3_ref, h1_ref, d_ref, flags_ref, uv0_ref, out_ref,
            *, P, wp, S, n_iter, conv_eps):
    f32 = jnp.float32
    FL = wp * wp  # flattened window lanes (padded to this block width)
    PB = 128  # per-su tap block width in the extraction matrix

    win = win_ref[:]  # (NB, FL)
    NB = win.shape[0]
    ref = ref_ref[:]  # (NB, PB) taps padded with zeros beyond P*P
    dx = dx_ref[:]
    dy = dy_ref[:]
    dg = dg_ref[:]
    tapmask = (jax.lax.broadcasted_iota(jnp.int32, (1, PB), 1)
               < P * P).astype(f32)

    # constant extraction matrix: E[a, su*PB + p] = 1 iff
    # a == (p//P)*wp + p%P + su   (p < P*P)
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (FL, S * PB), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (FL, S * PB), 1)
    su_c = c_idx // PB
    p_c = c_idx % PB
    tgt = (p_c // P) * wp + (p_c % P) + su_c
    E = ((a_idx == tgt) & (p_c < P * P)).astype(f32)  # (FL, S*PB)

    cu = corner_ref[:, 0:1]  # (NB,1)
    cv = corner_ref[:, 1:2]
    d0 = d_ref[:, 0:1]
    d1 = d_ref[:, 1:2]
    valid = flags_ref[:, 0:1]
    is1d = flags_ref[:, 1:2]
    w_b = flags_ref[:, 2:3]
    h_b = flags_ref[:, 3:4]
    u0 = uv0_ref[:, 0:1]
    v0 = uv0_ref[:, 1:2]
    h3 = h3_ref[:]  # (NB, 9)
    h1 = h1_ref[:]  # (NB, 4)

    def resample(u, v):
        """Patch taps at center (u, v) from the windows.
        Returns (taps (NB, PB), in_frame (NB, 1))."""
        fu_ = u - (P / 2.0 - 0.5)
        fv_ = v - (P / 2.0 - 0.5)
        tu = fu_ - cu
        tv = fv_ - cv
        iu = jnp.floor(tu)
        iv = jnp.floor(tv)
        fu = tu - iu
        fv = tv - iv
        in_win = ((iu >= 0) & (iv >= 0) & (iu <= S - 1) & (iv <= S - 1))
        au0 = jnp.floor(fu_)
        av0 = jnp.floor(fv_)
        in_img = ((au0 >= 0) & (av0 >= 0)
                  & (au0 + P <= w_b - 1) & (av0 + P <= h_b - 1))
        ok = in_win & in_img
        iuc = jnp.clip(iu, 0, S - 1)
        ivc = jnp.clip(iv, 0, S - 1)
        # bilinear field: z2[a] = lerp over the 2x2 at flat offset a
        z1 = (1.0 - fv) * win + fv * _roll_lanes(win, wp, FL)
        z2 = (1.0 - fu) * z1 + fu * _roll_lanes(z1, 1, FL)
        # vertical one-hot: ztop[a] = z2[a + iv*wp]
        ztop = jnp.zeros_like(z2)
        for sv in range(S):
            ohv = (ivc == sv).astype(f32)
            ztop = ztop + ohv * _roll_lanes(z2, sv * wp, FL)
        # all S horizontal shifts of the patch rows, in su-blocks
        ext = jax.lax.dot_general(
            ztop, E, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)  # (NB, S*PB)
        taps = jnp.zeros((NB, PB), f32)
        for su in range(S):
            ohu = (iuc == su).astype(f32)
            taps = taps + ohu * ext[:, su * PB:(su + 1) * PB]
        return taps, ok.astype(f32)

    def body(_, carry):
        u, v, md, conv = carry
        taps, okf = resample(u, v)
        r = (taps - ref + md) * tapmask  # (NB, PB)
        s_dxr = jnp.sum(dx * r, axis=1, keepdims=True)
        s_dyr = jnp.sum(dy * r, axis=1, keepdims=True)
        s_r = jnp.sum(r * tapmask, axis=1, keepdims=True)
        s_dgr = jnp.sum(dg * r, axis=1, keepdims=True)
        # 2-D model: upd3 = H3inv @ [s_dxr, s_dyr, s_r]
        u3_0 = h3[:, 0:1] * s_dxr + h3[:, 1:2] * s_dyr + h3[:, 2:3] * s_r
        u3_1 = h3[:, 3:4] * s_dxr + h3[:, 4:5] * s_dyr + h3[:, 5:6] * s_r
        u3_2 = h3[:, 6:7] * s_dxr + h3[:, 7:8] * s_dyr + h3[:, 8:9] * s_r
        # 1-D model: upd1 = H1inv @ [s_dgr, s_r]
        u1_0 = h1[:, 0:1] * s_dgr + h1[:, 1:2] * s_r
        u1_1 = h1[:, 2:3] * s_dgr + h1[:, 3:4] * s_r
        du = jnp.where(is1d > 0.5, u1_0 * d0, u3_0)
        dv = jnp.where(is1d > 0.5, u1_0 * d1, u3_1)
        dmd = jnp.where(is1d > 0.5, u1_1, u3_2)
        step = jnp.where(is1d > 0.5, jnp.abs(u1_0),
                         jnp.sqrt(u3_0 * u3_0 + u3_1 * u3_1))
        active = (valid > 0.5) & (okf > 0.5) & (conv < 0.5)
        u_n = jnp.where(active, u - du, u)
        v_n = jnp.where(active, v - dv, v)
        md_n = jnp.where(active, md - dmd, md)
        conv_n = jnp.where(active & (step < conv_eps),
                           jnp.ones_like(conv), conv)
        return (u_n, v_n, md_n, conv_n)

    init = (u0, v0, jnp.zeros((NB, 1), f32), jnp.zeros((NB, 1), f32))
    u, v, md, conv = jax.lax.fori_loop(0, n_iter, body, init)
    _, ok_fin = resample(u, v)
    zero = jnp.zeros((NB, 1), f32)
    out_ref[:] = jnp.concatenate(
        [u, v, md, conv * valid * ok_fin, ok_fin, zero, zero, zero], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("patch_size", "wp", "n_iter", "conv_eps", "interpret"))
def mixed_align_loop_pallas(
    win: jnp.ndarray,  # (N, wp, wp) prefetched windows
    corner: jnp.ndarray,  # (N, 2)
    ref_patch: jnp.ndarray,  # (N, P*P)
    ref_dx: jnp.ndarray,
    ref_dy: jnp.ndarray,
    dgrad: jnp.ndarray,  # (N, P*P) 1-D model directional gradient
    h3inv: jnp.ndarray,  # (N, 3, 3)
    h1inv: jnp.ndarray,  # (N, 2, 2)
    d: jnp.ndarray,  # (N, 2) unit 1-D direction
    is_1d: jnp.ndarray,  # (N,) bool
    uv_init: jnp.ndarray,  # (N, 2)
    wh: jnp.ndarray,  # (N, 2) level (w, h) bounds
    valid: jnp.ndarray,  # (N,)
    *,
    patch_size: int = 8,
    wp: int = 16,
    n_iter: int = 10,
    conv_eps: float = 0.03,
    interpret: bool = False,
):
    """Returns (uv (N,2), converged (N,), mean_diff (N,))."""
    P = patch_size
    S = wp - P
    N = win.shape[0]
    f32 = jnp.float32
    NB = 256 if N > 256 else max(8, -(-N // 8) * 8)
    Np = -(-N // NB) * NB
    PB = 128
    FL = wp * wp

    def padn(a, fill=0.0):
        pad = Np - a.shape[0]
        if pad == 0:
            return a.astype(f32)
        return jnp.pad(a.astype(f32), ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    win_f = padn(win.reshape(N, FL))
    tap_pad = PB - P * P

    def padtap(a):
        return padn(jnp.pad(a.astype(f32), ((0, 0), (0, tap_pad))))

    flags = jnp.stack([valid.astype(f32), is_1d.astype(f32),
                       wh[:, 0].astype(f32), wh[:, 1].astype(f32)], -1)
    args = (
        win_f,
        padn(corner),
        padtap(ref_patch), padtap(ref_dx), padtap(ref_dy), padtap(dgrad),
        padn(h3inv.reshape(N, 9)),
        padn(h1inv.reshape(N, 4)),
        padn(d),
        padn(flags),
        padn(uv_init),
    )
    grid = Np // NB
    kern = functools.partial(_kernel, P=P, wp=wp, S=S, n_iter=n_iter,
                             conv_eps=conv_eps)
    bs = lambda width: pl.BlockSpec((NB, width), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[bs(FL), bs(2), bs(PB), bs(PB), bs(PB), bs(PB),
                  bs(9), bs(4), bs(2), bs(4), bs(2)],
        out_shape=jax.ShapeDtypeStruct((Np, 8), f32),
        out_specs=pl.BlockSpec((NB, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    uv = out[:N, 0:2]
    conv = out[:N, 3] > 0.5
    md = out[:N, 2]
    return uv, conv, md
