import jax.numpy as jnp
import numpy as np

from plsvo_tpu import image


def test_atlas_matches_per_level_sampling(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 96)).astype(np.float32))
    pyr = image.build_pyramid(img, 3)
    atlas, offs, sizes = image.pack_pyramid_atlas(pyr)
    assert atlas.shape[0] == 64
    for lvl in range(3):
        h, w = pyr[lvl].shape
        uv = jnp.asarray(
            np.stack([rng.uniform(1, w - 2, 50), rng.uniform(1, h - 2, 50)], -1)
            .astype(np.float32))
        ref_vals, ref_ok = image.bilinear_sample(pyr[lvl], uv)
        a_vals, a_ok = image.bilinear_sample_atlas(
            atlas, offs, sizes, uv, jnp.full(50, lvl, jnp.int32))
        # adding the atlas x-offset costs a few mantissa bits on the
        # fractional part; 1e-2 intensity units is far below photometric noise
        np.testing.assert_allclose(np.asarray(a_vals), np.asarray(ref_vals),
                                   atol=1e-2)
        assert np.asarray(a_ok).all()


def test_atlas_rejects_out_of_level_bounds():
    img = jnp.ones((32, 32))
    pyr = image.build_pyramid(img, 2)
    atlas, offs, sizes = image.pack_pyramid_atlas(pyr)
    # (20, 10) is valid in level 0 but out of bounds in level 1 (16x16)
    uv = jnp.asarray([[20.0, 10.0]])
    _, ok0 = image.bilinear_sample_atlas(atlas, offs, sizes, uv, jnp.asarray([0]))
    _, ok1 = image.bilinear_sample_atlas(atlas, offs, sizes, uv, jnp.asarray([1]))
    assert bool(ok0[0]) and not bool(ok1[0])


def test_atlas_batched_keyframes(rng):
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 32, 48)).astype(np.float32))
    pyr = [imgs, image.half_sample(imgs)]
    atlas, offs, sizes = image.pack_pyramid_atlas(pyr)
    assert atlas.shape[0] == 4
    # per-kf slice equals single-image atlas
    a0, o0, s0 = image.pack_pyramid_atlas([imgs[0], image.half_sample(imgs[0])])
    np.testing.assert_allclose(np.asarray(atlas[0]), np.asarray(a0))
