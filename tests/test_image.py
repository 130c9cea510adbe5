import jax.numpy as jnp
import numpy as np

from plsvo_tpu import image


def test_half_sample():
    img = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    out = np.asarray(image.half_sample(img))
    expected = np.array([[(0 + 1 + 4 + 5) / 4, (2 + 3 + 6 + 7) / 4],
                         [(8 + 9 + 12 + 13) / 4, (10 + 11 + 14 + 15) / 4]])
    np.testing.assert_allclose(out, expected)


def test_half_sample_odd():
    img = jnp.ones((5, 7), jnp.float32)
    out = image.half_sample(img)
    assert out.shape == (2, 3)


def test_build_pyramid():
    img = jnp.zeros((480, 752), jnp.float32)
    pyr = image.build_pyramid(img, 5)
    assert [p.shape for p in pyr] == [(480, 752), (240, 376), (120, 188), (60, 94), (30, 47)]


def test_bilinear_exact_on_grid(rng):
    img = jnp.asarray(rng.uniform(0, 255, size=(32, 32)).astype(np.float32))
    uv = jnp.asarray([[5.0, 7.0], [0.0, 0.0], [30.0, 30.0]])
    vals, ok = image.bilinear_sample(img, uv)
    np.testing.assert_allclose(
        np.asarray(vals), [img[7, 5], img[0, 0], img[30, 30]], rtol=1e-6)
    assert np.asarray(ok).all()


def test_bilinear_interpolates_linearly():
    # A linear ramp must be reproduced exactly by bilinear interpolation
    y, x = np.mgrid[0:16, 0:16]
    img = jnp.asarray((2.0 * x + 3.0 * y).astype(np.float32))
    uv = jnp.asarray([[3.25, 4.5], [7.75, 2.125]])
    vals, ok = image.bilinear_sample(img, uv)
    np.testing.assert_allclose(np.asarray(vals), [2 * 3.25 + 3 * 4.5, 2 * 7.75 + 3 * 2.125], rtol=1e-5)


def test_bilinear_oob():
    img = jnp.ones((8, 8), jnp.float32)
    vals, ok = image.bilinear_sample(img, jnp.asarray([[7.5, 3.0], [-0.5, 2.0], [3.0, 3.0]]))
    assert list(np.asarray(ok)) == [False, False, True]
    np.testing.assert_allclose(np.asarray(vals)[:2], [0.0, 0.0])


def test_extract_patches_shape(rng):
    img = jnp.asarray(rng.uniform(0, 255, size=(64, 64)).astype(np.float32))
    centers = jnp.asarray([[10.0, 12.0], [31.5, 40.25]])
    patches, ok = image.extract_patches(img, centers, 4)
    assert patches.shape == (2, 16)
    assert np.asarray(ok).all()
    # patch of a constant image is constant
    flat = image.extract_patches(jnp.full((64, 64), 7.0), centers, 8)[0]
    np.testing.assert_allclose(np.asarray(flat), 7.0)


def test_gradient_on_ramp():
    y, x = np.mgrid[0:16, 0:16]
    img = jnp.asarray((2.0 * x + 3.0 * y).astype(np.float32))
    dx, dy = image.gradient(img)
    np.testing.assert_allclose(np.asarray(dx)[1:-1, 1:-1], 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy)[1:-1, 1:-1], 3.0, atol=1e-5)


def test_shi_tomasi_corner_response(rng):
    # A white square on black background: corners should outscore edges and flats.
    img = np.zeros((64, 64), np.float32)
    img[24:40, 24:40] = 255.0
    score = np.asarray(image.shi_tomasi_score(jnp.asarray(img)))
    corner = score[24, 24]
    edge = score[32, 24]
    flat = score[8, 8]
    assert corner > 4 * max(edge, 1e-6)
    assert flat < 1e-3
    assert score.shape == (64, 64)
