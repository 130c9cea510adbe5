import jax.numpy as jnp
import numpy as np

from plsvo_tpu.image import build_pyramid
from plsvo_tpu.ops import detection


def checkerboard(h=128, w=160, sq=16):
    """Isolated bright squares (polka grid). Note: an *ideal* checkerboard
    X-corner splits the FAST ring exactly 8/8 and FAST-10 correctly does
    not fire there; isolated-square L-corners give ~12 contiguous darker
    ring pixels."""
    y, x = np.mgrid[0:h, 0:w]
    on = ((y % (2 * sq)) < sq) & ((x % (2 * sq)) < sq)
    return (on * 200.0 + 20.0).astype(np.float32)


def test_fast_mask_finds_square_corners():
    img = jnp.asarray(checkerboard())
    mask = np.asarray(detection.fast_corner_mask(img, 10.0))
    ys, xs = np.nonzero(mask)
    assert len(ys) > 10
    # detections must cluster near square corners (multiples of sq)
    near_x = np.minimum(xs % 16, 16 - (xs % 16)) <= 3
    near_y = np.minimum(ys % 16, 16 - (ys % 16)) <= 3
    assert (near_x & near_y).mean() > 0.9


def test_fast_mask_empty_on_flat():
    img = jnp.full((64, 64), 128.0)
    mask = np.asarray(detection.fast_corner_mask(img, 10.0))
    assert mask.sum() == 0


def test_detect_fast_grid_on_synthetic(rng):
    from plsvo_tpu.camera import PinholeCamera
    from plsvo_tpu.utils import synthetic

    scene = synthetic.make_scene(rng, size=512, n_blobs=180, n_rects=40)
    cam = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)
    R = jnp.eye(3)
    t = jnp.asarray([0.0, 0.0, -1.5])
    img, _ = synthetic.render(scene, cam, R, t)
    pyr = build_pyramid(img, 3)
    grid = detection.detect_fast_grid(pyr, cell_size=25, fast_threshold=10.0,
                                      score_threshold=20.0)
    n = int(np.asarray(grid.valid).sum())
    assert n > 30, f"only {n} corners"
    uv = np.asarray(grid.uv)[np.asarray(grid.valid)]
    assert (uv[:, 0] < 320).all() and (uv[:, 1] < 240).all()
    # one corner per cell: cells must be unique
    cells = (uv[:, 1] // 25).astype(int) * 13 + (uv[:, 0] // 25).astype(int)
    assert len(np.unique(cells)) == len(cells)


def test_occupancy_blocks_cells():
    uv = jnp.asarray([[10.0, 10.0], [60.0, 10.0]])
    occ = detection.occupancy_from_positions(uv, jnp.asarray([True, True]), 160, 128, 25)
    occ_np = np.asarray(occ)
    nx = -(-160 // 25)
    assert occ_np[0] and occ_np[2]
    assert occ_np.sum() == 2

    img = jnp.asarray(checkerboard())
    pyr = [img]
    grid_free = detection.detect_fast_grid(pyr, cell_size=25)
    grid_blocked = detection.detect_fast_grid(pyr, cell_size=25, occupied=jnp.ones_like(grid_free.valid))
    assert int(np.asarray(grid_blocked.valid).sum()) == 0


def test_detect_multilevel_levels_present():
    img = jnp.asarray(checkerboard(256, 256, 32))
    pyr = build_pyramid(img, 3)
    grid = detection.detect_fast_grid(pyr, cell_size=32)
    lv = np.asarray(grid.level)[np.asarray(grid.valid)]
    assert lv.min() >= 0 and lv.max() <= 2
