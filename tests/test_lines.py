import jax.numpy as jnp
import numpy as np

from plsvo_tpu.ops import lines


def seg_img(h=240, w=320):
    """A few bright bars on dark ground -> strong straight edges."""
    img = np.full((h, w), 40.0, np.float32)
    img[60:80, 40:280] = 220.0  # horizontal bar -> two horizontal lines
    img[120:200, 150:170] = 220.0  # vertical bar
    return img


def _dist_point_to_seg_line(p, sp, ep):
    d = ep - sp
    n = np.array([-d[1], d[0]]) / (np.linalg.norm(d) + 1e-9)
    return abs(np.dot(p - sp, n))


def test_detect_segments_finds_bars():
    img = jnp.asarray(seg_img())
    segs = lines.detect_segments(img, n_peaks=32)
    v = np.asarray(segs.valid)
    sp = np.asarray(segs.sp)[v]
    ep = np.asarray(segs.ep)[v]
    ln = np.asarray(segs.length)[v]
    ang = np.asarray(segs.angle)[v]
    assert v.sum() >= 4
    long = ln > 60
    assert long.sum() >= 3
    # among long segments there must be near-horizontal and near-vertical ones
    horiz = np.abs(ang[long]) < 0.1
    vert = np.abs(np.abs(ang[long]) - np.pi / 2) < 0.1
    assert horiz.any() and vert.any()
    # a horizontal long segment should lie near y=60 or y=80
    ys = 0.5 * (sp[long][horiz][:, 1] + ep[long][horiz][:, 1])
    assert (np.minimum(np.abs(ys - 60), np.abs(ys - 80)) < 3).any()


def test_detect_segments_empty_on_flat():
    img = jnp.full((120, 160), 100.0)
    segs = lines.detect_segments(img, n_peaks=16)
    assert int(np.asarray(segs.valid).sum()) == 0


def test_dedup_grid_capacity_and_occupancy():
    img = jnp.asarray(seg_img())
    segs = lines.detect_segments(img, n_peaks=32)
    table, occ = lines.dedup_segments_grid(
        segs, width=320, height=240, cell_size=25, max_segs=8, min_length=30.0)
    v = np.asarray(table.valid)
    assert table.sp.shape == (8, 2)
    assert v.sum() >= 2
    # all accepted segments meet the min length
    assert (np.asarray(table.length)[v] > 30.0).all()
    # occupancy was marked
    assert np.asarray(occ).sum() >= 2 * v.sum() - 2


def test_dedup_rejects_occupied():
    img = jnp.asarray(seg_img())
    segs = lines.detect_segments(img, n_peaks=32)
    occ_all = jnp.ones(((-(-320 // 25)) * (-(-240 // 25)),), bool)
    table, _ = lines.dedup_segments_grid(
        segs, width=320, height=240, cell_size=25, max_segs=8, min_length=30.0,
        occupied=occ_all)
    assert int(np.asarray(table.valid).sum()) == 0
