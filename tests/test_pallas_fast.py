"""Pallas FAST+Shi-Tomasi kernel vs the XLA reference implementation
(interpret mode — runs on the CPU test mesh)."""
import jax.numpy as jnp
import numpy as np

from plsvo_tpu.image import shi_tomasi_score
from plsvo_tpu.ops import pallas_fast
from plsvo_tpu.ops.detection import fast_corner_mask


def test_pallas_fast_matches_xla(rng):
    img = jnp.asarray(rng.uniform(0, 255, (96, 160)).astype(np.float32))
    # add structure so corners exist
    img = img.at[30:60, 40:90].add(120.0)
    img = jnp.clip(img, 0, 255)

    mask_p, score_p = pallas_fast.fast_score_pallas(img, 10.0, interpret=True)
    mask_x = fast_corner_mask(img, 10.0)
    score_x = shi_tomasi_score(img)

    np.testing.assert_array_equal(np.asarray(mask_p), np.asarray(mask_x))
    # scores match in the interior (borders are masked differently)
    sp = np.asarray(score_p)[8:-8, 8:-8]
    sx = np.asarray(score_x)[8:-8, 8:-8]
    np.testing.assert_allclose(sp, sx, rtol=1e-4, atol=1e-3)


def test_pallas_fast_nondivisible_shape(rng):
    img = jnp.asarray(rng.uniform(0, 255, (100, 300)).astype(np.float32))
    mask_p, score_p = pallas_fast.fast_score_pallas(img, 10.0, interpret=True)
    assert mask_p.shape == (100, 300)
    assert score_p.shape == (100, 300)
    mask_x = fast_corner_mask(img, 10.0)
    np.testing.assert_array_equal(np.asarray(mask_p), np.asarray(mask_x))
