import os

import numpy as np
import pytest

from plsvo_tpu.native import loader


@pytest.fixture(scope="module")
def lib():
    l = loader.get_lib()
    if l is None:
        pytest.skip("native loader failed to build")
    return l


def test_pgm_roundtrip(tmp_path, lib, rng):
    img = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    p = str(tmp_path / "t.pgm")
    with open(p, "wb") as fh:
        fh.write(b"P5\n64 48\n255\n")
        fh.write(img.tobytes())
    out = loader.load_gray(p)
    np.testing.assert_allclose(out, img.astype(np.float32))


def test_png_roundtrip_vs_pil(tmp_path, lib, rng):
    from PIL import Image

    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    p = str(tmp_path / "t.png")
    Image.fromarray(img).save(p)
    out = loader.load_gray(p)
    np.testing.assert_allclose(out, img.astype(np.float32))
    # RGB png -> luma
    rgb = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    p2 = str(tmp_path / "rgb.png")
    Image.fromarray(rgb).save(p2)
    out2 = loader.load_gray(p2)
    luma = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    np.testing.assert_allclose(out2, luma, atol=1.0)


def test_bmp(tmp_path, lib, rng):
    import cv2

    img = rng.integers(0, 256, (24, 36)).astype(np.uint8)
    p = str(tmp_path / "t.bmp")
    cv2.imwrite(p, img)
    out = loader.load_gray(p)
    assert out is not None and out.shape == (24, 36)
    np.testing.assert_allclose(out, img.astype(np.float32), atol=1.0)


def test_prefetcher_streams_in_order(tmp_path, lib, rng):
    from PIL import Image

    paths = []
    for i in range(6):
        img = np.full((16, 16), i * 10, np.uint8)
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    pf = loader.Prefetcher(paths, 16, 16, depth=2)
    vals = [float(img[0, 0]) for img in pf]
    pf.close()
    assert vals == [0.0, 10.0, 20.0, 30.0, 40.0, 50.0]


def test_dataset_uses_native(tmp_path, lib, rng):
    """utils.dataset.load_gray should route through the native decoder."""
    from PIL import Image

    from plsvo_tpu.utils import dataset as ds

    img = rng.integers(0, 256, (20, 20)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    out = ds.load_gray(p)
    np.testing.assert_allclose(out, img.astype(np.float32))
