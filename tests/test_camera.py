import jax.numpy as jnp
import numpy as np

from plsvo_tpu.camera import ATANCamera, PinholeCamera, project2d, unproject2d


def make_cam(dist=None):
    return PinholeCamera.create(752, 480, 315.5, 315.5, 376.0, 240.0, dist)


def test_project_unproject_no_distortion(rng):
    cam = make_cam()
    pts = rng.uniform(-1, 1, size=(128, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 5.0, size=128)
    uv = cam.project(jnp.asarray(pts))
    f = cam.unproject(uv)
    # bearing must be parallel to the original point
    p_unit = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(f), p_unit, atol=1e-5)


def test_project_unproject_radtan(rng):
    cam = make_cam(dist=[-0.28, 0.07, 1e-4, 2e-5, 0.0])
    pts = rng.uniform(-0.5, 0.5, size=(64, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 5.0, size=64)
    uv = cam.project(jnp.asarray(pts))
    f = np.asarray(cam.unproject(uv))
    p_unit = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(f, p_unit, atol=1e-4)


def test_distortion_matches_opencv(rng):
    """Cross-check radtan against cv2.projectPoints — the reference trusts
    OpenCV calibration conventions (app/run_pipeline.cpp:782-787)."""
    import cv2

    dist = np.array([-0.28, 0.07, 1e-4, 2e-5, 0.0], np.float64)
    cam = make_cam(dist=dist)
    pts = rng.uniform(-0.5, 0.5, size=(32, 3)).astype(np.float64)
    pts[:, 2] = rng.uniform(1.0, 5.0, size=32)
    K = np.array([[315.5, 0, 376.0], [0, 315.5, 240.0], [0, 0, 1]])
    uv_cv, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K, dist)
    uv = np.asarray(cam.project(jnp.asarray(pts, jnp.float32)))
    np.testing.assert_allclose(uv, uv_cv[:, 0, :], atol=1e-2)


def test_is_in_frame():
    cam = make_cam()
    uv = jnp.asarray([[10.0, 10.0], [-1.0, 5.0], [751.5, 100.0], [700.0, 470.0]])
    ok = np.asarray(cam.is_in_frame(uv))
    assert list(ok) == [True, False, True, True]
    ok_b = np.asarray(cam.is_in_frame(uv, border=20.0))
    assert list(ok_b) == [False, False, False, False]
    # level-1 coords live in a half-size image
    ok_l1 = np.asarray(cam.is_in_frame(jnp.asarray([[370.0, 230.0]]), level=1))
    assert list(ok_l1) == [True]


def test_atan_camera_roundtrip(rng):
    cam = ATANCamera.create(752, 480, 0.5, 0.8, 0.5, 0.5, 0.9)
    pts = rng.uniform(-0.4, 0.4, size=(64, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 5.0, size=64)
    uv = cam.project(jnp.asarray(pts))
    f = np.asarray(cam.unproject(uv))
    p_unit = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(f, p_unit, atol=1e-4)


def test_project2d_unproject2d():
    p = jnp.asarray([[2.0, 4.0, 2.0]])
    np.testing.assert_allclose(np.asarray(project2d(p)), [[1.0, 2.0]])
    np.testing.assert_allclose(np.asarray(unproject2d(jnp.asarray([[1.0, 2.0]]))), [[1.0, 2.0, 1.0]])


def test_ideal_camera():
    cam = make_cam(dist=[-0.3, 0.1, 0, 0, 0])
    ideal = cam.ideal()
    pts = jnp.asarray([[0.3, -0.2, 2.0]])
    uv_pin = np.asarray(ideal.project(pts))
    x = 0.3 / 2.0 * 315.5 + 376.0
    y = -0.2 / 2.0 * 315.5 + 240.0
    np.testing.assert_allclose(uv_pin, [[x, y]], atol=1e-4)
