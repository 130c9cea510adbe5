"""Line-band descriptors (LBD) + binary Hamming matching, batched.

TPU-native rebuild of the reference's vendored line_descriptor module
(reference: 3rdparty/line_descriptor — BinaryDescriptor computes LBD band
descriptors over Gaussian octaves, binary_descriptor_custom.cpp:350-367;
BinaryDescriptorMatcher does multi-index Hamming matching,
binary_descriptor_matcher.cpp). The reference builds these but its VO uses
only the LSD detector (SURVEY §2 C15); they are provided here for full
component parity and for wide-baseline line matching.

Design (batched, fixed shapes):
- each segment is sampled at S points along its direction and, per sample,
  at B bands across the line normal (band offsets -W..W px)
- per band: mean and std of the four SIGNED gradient responses
  (g_n>0, g_n<0, g_d>0, g_d<0 where d = line direction, n = normal) ->
  8 stats x B bands = float descriptor — the LBD construction of
  Zhang & Koch 2013, as used by the vendored module
- the mean and std sub-vectors are L2-normalized SEPARATELY, clipped at
  0.4 and renormalized (the paper's illumination-robust normalization);
  a 256-bit binary code is formed by comparing random descriptor pairs
  (LBD's binarization strategy)
- matching: full pairwise Hamming (XLA einsum on bit-planes) + mutual
  nearest-neighbor + ratio test — the multi-index hashing of the reference
  is an approximation of exactly this search, unnecessary at VO scales
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from plsvo_tpu.image import bilinear_sample

f32_inv_sqrt2 = 0.7071067811865476  # overall descriptor stays unit-norm


class LineDescriptors(NamedTuple):
    float_desc: jnp.ndarray  # (N, 4*n_bands) L2-normalized
    binary: jnp.ndarray  # (N, n_bits) uint8 in {0,1}
    valid: jnp.ndarray  # (N,)


@partial(jax.jit, static_argnames=("n_samples", "n_bands", "band_width", "n_bits"))
def compute_lbd(
    img: jnp.ndarray,
    sp: jnp.ndarray,  # (N,2) segment start (px)
    ep: jnp.ndarray,  # (N,2) segment end
    valid: jnp.ndarray,  # (N,)
    *,
    n_samples: int = 16,
    n_bands: int = 9,
    band_width: int = 3,
    n_bits: int = 256,
) -> LineDescriptors:
    """Band descriptors for N segments in one dispatch."""
    N = sp.shape[0]
    d = ep - sp
    length = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / jnp.maximum(length, 1e-6)  # line direction (N,2)
    n = jnp.stack([-d[:, 1], d[:, 0]], -1)  # normal

    # sample grid: S along the line x (B bands * band_width) across
    alphas = jnp.linspace(0.0, 1.0, n_samples)  # (S,)
    half_span = (n_bands * band_width) / 2.0
    offs = (jnp.arange(n_bands * band_width) - half_span + 0.5)  # (B*W,)
    base = sp[:, None, :] + alphas[None, :, None] * (ep - sp)[:, None, :]  # (N,S,2)
    pos = base[:, :, None, :] + offs[None, None, :, None] * n[:, None, None, :]
    # (N, S, B*W, 2)

    gx_img = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    gy_img = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    gx, okx = bilinear_sample(gx_img, pos)
    gy, oky = bilinear_sample(gy_img, pos)
    ok = jnp.all(okx & oky, axis=(1, 2)) & valid

    # project gradients onto (d, n)
    g_d = gx * d[:, None, None, 0] + gy * d[:, None, None, 1]  # (N,S,B*W)
    g_n = gx * n[:, None, None, 0] + gy * n[:, None, None, 1]
    # the LBD statistics are over the four SIGNED responses — keeping the
    # positive and negative lobes separate is what makes the descriptor
    # discriminative (a band with strong bidirectional texture and a flat
    # band share mean(g)=0 but not mean(g+)/mean(g-))
    parts = (jnp.maximum(g_n, 0.0), jnp.maximum(-g_n, 0.0),
             jnp.maximum(g_d, 0.0), jnp.maximum(-g_d, 0.0))
    means, stds = [], []
    for g in parts:
        gr = g.reshape(N, n_samples, n_bands, band_width)
        means.append(jnp.mean(gr, axis=(1, 3)))  # (N, n_bands)
        stds.append(jnp.std(gr, axis=(1, 3)))

    def norm_clip(x, clip=0.4):
        # Zhang & Koch: normalize mean/std sub-vectors independently, clip
        # dominant dimensions, renormalize
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        x = jnp.minimum(x, clip)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    mean_part = norm_clip(jnp.concatenate(means, axis=-1))  # (N, 4*n_bands)
    std_part = norm_clip(jnp.concatenate(stds, axis=-1))
    desc = jnp.concatenate([mean_part, std_part], axis=-1) * f32_inv_sqrt2

    # binarization: fixed random pair comparisons (deterministic seed)
    D = desc.shape[-1]
    key = jax.random.PRNGKey(1234)
    ka, kb = jax.random.split(key)
    ia = jax.random.randint(ka, (n_bits,), 0, D)
    ib = jax.random.randint(kb, (n_bits,), 0, D)
    bits = (desc[:, ia] > desc[:, ib]).astype(jnp.uint8)
    return LineDescriptors(float_desc=desc, binary=bits, valid=ok)


class LineMatches(NamedTuple):
    idx: jnp.ndarray  # (N,) best match in the other set (or -1)
    dist: jnp.ndarray  # (N,) hamming distance
    ok: jnp.ndarray  # (N,) mutual NN + ratio test passed


@partial(jax.jit, static_argnames=("max_dist",))
def match_binary(
    a: LineDescriptors,
    b: LineDescriptors,
    *,
    max_dist: int = 80,
    ratio: float = 0.85,
) -> LineMatches:
    """Mutual-nearest Hamming matching with a Lowe-style ratio test
    (BinaryDescriptorMatcher analogue)."""
    abits = a.binary.astype(jnp.int32)
    bbits = b.binary.astype(jnp.int32)
    # hamming = sum(a xor b) = sum a + sum b - 2 a.b for 0/1 bits
    dots = abits @ bbits.T
    ham = (abits.sum(-1, keepdims=True) + bbits.sum(-1)[None] - 2 * dots)
    big = a.binary.shape[-1] + 1
    ham = jnp.where(a.valid[:, None] & b.valid[None, :], ham, big)

    best = jnp.argmin(ham, axis=-1)
    NA = abits.shape[0]
    d1 = ham[jnp.arange(NA), best]
    ham2 = ham.at[jnp.arange(NA), best].set(big)
    d2 = jnp.min(ham2, axis=-1)
    # mutual check
    back = jnp.argmin(ham, axis=0)  # best a for each b
    mutual = back[best] == jnp.arange(NA)
    ok = (
        a.valid & (d1 <= max_dist) & mutual
        & (d1.astype(jnp.float32) < ratio * jnp.maximum(d2, 1).astype(jnp.float32))
    )
    return LineMatches(idx=jnp.where(ok, best, -1), dist=d1, ok=ok)
