import jax
import jax.numpy as jnp
import numpy as np

from plsvo_tpu import lie
from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.image import build_pyramid
from plsvo_tpu.ops import detection, sparse_align
from plsvo_tpu.parallel import batched
from plsvo_tpu.utils import synthetic

CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)


def make_batch(rng, B=8):
    """B independent synthetic sequence pairs with GT relative poses."""
    pyr_r, pyr_c, pts_list, Rg_list, tg_list = [], [], [], [], []
    for b in range(B):
        scene = synthetic.make_scene(rng, size=512)
        R_ref = np.eye(3, dtype=np.float32)
        t_ref = np.asarray([0.0, 0.0, -2.0], np.float32)
        drot = 0.004 + 0.002 * b
        R_cur = np.asarray(lie.so3_exp(jnp.asarray([0.0, drot, 0.0])), np.float32)
        t_cur = t_ref + np.asarray([0.01 + 0.002 * b, -0.005, 0.004], np.float32)
        img_r, _ = synthetic.render_aa(scene, CAM, R_ref, t_ref)
        img_c, _ = synthetic.render_aa(scene, CAM, R_cur, t_cur)
        pr = build_pyramid(img_r, 5)
        pc = build_pyramid(img_c, 5)
        grid = detection.detect_fast_grid(pr, cell_size=20)
        uv = np.asarray(grid.uv)
        valid = np.asarray(grid.valid)
        order = np.argsort(-np.asarray(grid.score))[:96]
        uv, valid = uv[order], valid[order]
        rays = np.asarray(CAM.unproject(jnp.asarray(uv)))
        z = np.asarray(synthetic.depth_at(
            scene, CAM, jnp.asarray(R_ref), jnp.asarray(t_ref), jnp.asarray(uv)))
        d = z / rays[:, 2]
        valid = valid & np.isfinite(d) & (d > 0.1)
        pts = sparse_align.AlignPoints(
            xyz_ref=jnp.asarray(rays * d[:, None], jnp.float32),
            uv_ref=jnp.asarray(uv, jnp.float32), valid=jnp.asarray(valid))
        Rg, tg = lie.compose(*lie.inverse(jnp.asarray(R_cur), jnp.asarray(t_cur)),
                             jnp.asarray(R_ref), jnp.asarray(t_ref))
        pyr_r.append(pr)
        pyr_c.append(pc)
        pts_list.append(pts)
        Rg_list.append(np.asarray(Rg))
        tg_list.append(np.asarray(tg))

    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    pyr_r_b = [jnp.stack([p[l] for p in pyr_r]) for l in range(5)]
    pyr_c_b = [jnp.stack([p[l] for p in pyr_c]) for l in range(5)]
    pts_b = stack(pts_list)
    M, K = 4, 4
    segs_b = sparse_align.AlignSegments(
        xyz_ref=jnp.zeros((B, M, K, 3)), uv_ref=jnp.zeros((B, M, K, 2)),
        valid=jnp.zeros((B, M), bool))
    return pyr_r_b, pyr_c_b, pts_b, segs_b, np.stack(Rg_list), np.stack(tg_list)


def test_batched_align_matches_sequential(rng):
    B = 4
    pyr_r, pyr_c, pts, segs, Rg, tg = make_batch(rng, B)
    R0 = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
    t0 = jnp.zeros((B, 3))
    R_b, t_b, n_pts, n_segs, alive = batched.batched_sparse_align(
        pyr_r, pyr_c, pts, segs, R0, t0, CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    for b in range(B):
        res = sparse_align.sparse_img_align(
            [p[b] for p in pyr_r], [p[b] for p in pyr_c],
            jax.tree.map(lambda x: x[b], pts), jax.tree.map(lambda x: x[b], segs),
            jnp.eye(3), jnp.zeros(3), CAM.fx, CAM.fy, CAM.cx, CAM.cy)
        np.testing.assert_allclose(np.asarray(R_b[b]), np.asarray(res.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_b[b]), np.asarray(res.t), atol=1e-5)
        # each sequence converged to its own GT
        ang, dist = lie.distance(R_b[b], t_b[b], jnp.asarray(Rg[b]), jnp.asarray(tg[b]))
        assert float(dist) < 0.012, (b, float(dist))


def test_sharded_align_over_mesh(rng):
    B = 8
    pyr_r, pyr_c, pts, segs, Rg, tg = make_batch(rng, B)
    devices = jax.devices()
    mesh = jax.sharding.Mesh(np.asarray(devices[:8]), ("seq",))
    R0 = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
    t0 = jnp.zeros((B, 3))
    R_s, t_s, n_pts, n_segs, alive = batched.sharded_sparse_align(
        mesh, "seq", pyr_r, pyr_c, pts, segs, R0, t0,
        CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    R_b, t_b, *_ = batched.batched_sparse_align(
        pyr_r, pyr_c, pts, segs, R0, t0, CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    np.testing.assert_allclose(np.asarray(R_s), np.asarray(R_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_b), atol=1e-5)
