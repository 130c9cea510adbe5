import numpy as np

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import fast_config
from plsvo_tpu.utils import checkpoint


def test_checkpoint_resume_continues_identically(tmp_path, rng):
    """Run N frames, checkpoint, resume, and verify the resumed pipeline
    produces the same poses as the uninterrupted run."""
    import jax.numpy as jnp

    from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono
    from plsvo_tpu.utils import synthetic

    CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)
    scene = synthetic.make_scene(rng, size=1024, texel_size=0.004)
    imgs = []
    for i in range(20):
        R = np.eye(3, dtype=np.float32)
        t = np.asarray([0.025 * i, 0.0, -2.0], np.float32)
        img, _ = synthetic.render_aa(scene, CAM, jnp.asarray(R), jnp.asarray(t))
        imgs.append(np.asarray(img))

    vo_a = FrameHandlerMono(CAM, fast_config())
    for i in range(14):
        vo_a.add_image(imgs[i], i / 30.0)

    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_state(vo_a, p)
    vo_b = checkpoint.load_state(p)

    assert vo_b.stage == vo_a.stage
    assert vo_b.map.n_keyframes() == vo_a.map.n_keyframes()
    np.testing.assert_allclose(vo_b.map.pt_pos, vo_a.map.pt_pos)
    np.testing.assert_allclose(
        np.asarray(vo_b.pt_seeds.mu), np.asarray(vo_a.pt_seeds.mu))

    # continue both and compare trajectories
    for i in range(14, 20):
        ra = vo_a.add_image(imgs[i], i / 30.0)
        rb = vo_b.add_image(imgs[i], i / 30.0)
        np.testing.assert_allclose(rb.t_f_w, ra.t_f_w, atol=1e-5)
        np.testing.assert_allclose(rb.R_f_w, ra.R_f_w, atol=1e-5)


def test_checkpoint_preserves_seed_mirrors(tmp_path, rng):
    import jax.numpy as jnp

    from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono
    from plsvo_tpu.utils import synthetic

    CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)
    scene = synthetic.make_scene(rng, size=1024)
    vo = FrameHandlerMono(CAM, fast_config())
    for i in range(14):
        R = np.eye(3, dtype=np.float32)
        t = np.asarray([0.025 * i, 0.0, -2.0], np.float32)
        img, _ = synthetic.render_aa(scene, CAM, jnp.asarray(R), jnp.asarray(t))
        vo.add_image(np.asarray(img), i / 30.0)
    assert vo._seed_alive.sum() > 0
    p = str(tmp_path / "c.npz")
    checkpoint.save_state(vo, p)
    vo2 = checkpoint.load_state(p)
    np.testing.assert_array_equal(vo2._seed_alive, vo._seed_alive)
    np.testing.assert_allclose(vo2._seed_host["uv"], vo._seed_host["uv"])
    assert vo2._any_line_seeds == vo._any_line_seeds
