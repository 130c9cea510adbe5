"""Dataset loading: image-folder replay + dataset_params.yaml cameras.

Reference analogue: BenchmarkNode::runFromFolder + dataset config parsing
(app/run_pipeline.cpp:331-414,759-825; config/dataset_params.yaml). The
same YAML schema is accepted (cam0: cam_model/cam_width/.../cam_d3,
images_subfolder). Undistortion follows the reference: images are
undistorted once with the calibrated camera, the VO then runs on the ideal
pinhole (run_pipeline.cpp:788-792,409-411).

Image decode prefers the native C++ loader (plsvo_tpu.native) when built,
falling back to cv2/PIL.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from plsvo_tpu.camera import ATANCamera, PinholeCamera

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".pgm", ".ppm", ".bmp", ".tif", ".tiff")


def load_dataset_params(path: str):
    """Parse the reference's dataset_params.yaml. Returns (camera, subfolder)."""
    import yaml

    with open(path) as fh:
        d = yaml.safe_load(fh)
    cam = d["cam0"]
    model = cam.get("cam_model", "Pinhole")
    if model == "Pinhole":
        dist = [cam.get(f"cam_d{i}", 0.0) for i in range(4)] + [0.0]
        camera = PinholeCamera.create(
            cam["cam_width"], cam["cam_height"], cam["cam_fx"], cam["cam_fy"],
            cam["cam_cx"], cam["cam_cy"], dist)
    elif model == "ATAN":
        camera = ATANCamera.create(
            cam["cam_width"], cam["cam_height"], cam["cam_fx"], cam["cam_fy"],
            cam["cam_cx"], cam["cam_cy"], cam.get("cam_d0", 0.0))
    else:
        raise ValueError(f"unknown cam_model {model}")
    return camera, d.get("images_subfolder", "images/")


def list_images(folder: str, offset: int = 0, step: int = 1,
                limit: Optional[int] = None) -> List[str]:
    """Sorted image file list with offset/stride/limit
    (reference CLI keys, run_pipeline.cpp:690-705,331-379)."""
    names = sorted(
        f for f in os.listdir(folder)
        if f.lower().endswith(IMAGE_EXTS))
    names = names[offset::step]
    if limit is not None:
        names = names[:limit]
    return [os.path.join(folder, f) for f in names]


def load_gray(path: str) -> np.ndarray:
    """Grayscale float32 image in [0,255]; native loader if available."""
    try:
        from plsvo_tpu.native import loader as native_loader

        img = native_loader.load_gray(path)
        if img is not None:
            return img
    except Exception:
        pass
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is not None:
            return img.astype(np.float32)
    except Exception:
        pass
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), np.float32)


def undistort_maps(cam) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute bilinear sample maps for undistortion: for each ideal
    pixel, the distorted source position (vk undistortImage analogue).
    Works for any camera exposing .distort(unit-plane ideal -> distorted
    normalized) — PinholeCamera (radtan) and ATANCamera (FOV model)."""
    import jax.numpy as jnp

    H, W = cam.height, cam.width
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    x_n = (xx - float(np.asarray(cam.cx))) / float(np.asarray(cam.fx))
    y_n = (yy - float(np.asarray(cam.cy))) / float(np.asarray(cam.fy))
    uv_n = jnp.asarray(np.stack([x_n, y_n], -1).reshape(-1, 2))
    uv_d = np.asarray(cam.distort(uv_n)).reshape(H, W, 2)
    map_x = uv_d[..., 0] * float(np.asarray(cam.fx)) + float(np.asarray(cam.cx))
    map_y = uv_d[..., 1] * float(np.asarray(cam.fy)) + float(np.asarray(cam.cy))
    return map_x.astype(np.float32), map_y.astype(np.float32)


def undistort_image(img: np.ndarray, maps: Tuple[np.ndarray, np.ndarray]) -> np.ndarray:
    map_x, map_y = maps
    H, W = img.shape
    x0 = np.clip(np.floor(map_x).astype(np.int32), 0, W - 2)
    y0 = np.clip(np.floor(map_y).astype(np.int32), 0, H - 2)
    fx = np.clip(map_x - x0, 0.0, 1.0)
    fy = np.clip(map_y - y0, 0.0, 1.0)
    v = ((1 - fx) * (1 - fy) * img[y0, x0] + fx * (1 - fy) * img[y0, x0 + 1]
         + (1 - fx) * fy * img[y0 + 1, x0] + fx * fy * img[y0 + 1, x0 + 1])
    inside = (map_x >= 0) & (map_x <= W - 1) & (map_y >= 0) & (map_y <= H - 1)
    return np.where(inside, v, 0.0).astype(np.float32)


@dataclass
class ImageFolderDataset:
    """Replay dataset (reference: BenchmarkNode::runFromFolder)."""

    folder: str
    camera: PinholeCamera
    fps: float = 30.0  # reference timestamp convention (run_pipeline.cpp:149)
    offset: int = 0
    step: int = 1
    limit: Optional[int] = None

    def __post_init__(self):
        self.paths = list_images(self.folder, self.offset, self.step, self.limit)
        self._maps = None
        if self.camera.has_distortion:
            # undistort-once for BOTH models (reference undistorts ATAN
            # datasets the same way, app/run_pipeline.cpp:806-817,409-411)
            self._maps = undistort_maps(self.camera)

    def __len__(self):
        return len(self.paths)

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray]]:
        for i, p in enumerate(self.paths):
            img = load_gray(p)
            if self._maps is not None:
                img = undistort_image(img, self._maps)
            yield i / self.fps, img

    def ideal_camera(self) -> PinholeCamera:
        """The pinhole the VO runs on (after undistort-once) — for the
        ATAN model too (its raw fx/fy/cx/cy are the ideal intrinsics)."""
        return self.camera.ideal()


def write_synthetic_dataset(out_dir: str, n_frames: int = 60, seed: int = 0,
                            width: int = 752, height: int = 480):
    """Generate a synthetic dataset folder (images/ + groundtruth.txt +
    dataset_params.yaml) so the CLI runs self-contained."""
    import jax.numpy as jnp
    from PIL import Image

    from plsvo_tpu.utils import synthetic, trajectory

    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    # intrinsics + texture statistics scale with resolution so the scene's
    # texels-per-pixel (and hence detector/tracker behavior) match the
    # 752x480 @ fx=460 reference configuration at any size
    fx = fy = 460.0 * width / 752.0
    cam = PinholeCamera.create(width, height, fx, fy, width / 2, height / 2)
    rng = np.random.default_rng(seed)
    scene = synthetic.make_scene(rng, size=2048,
                                 texel_size=0.003 * 752.0 / width)
    entries = []
    for i in range(n_frames):
        ang = 0.002 * i
        R = np.asarray(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        t = np.asarray([0.03 * i, 0.008 * np.sin(0.3 * i), -2.0], np.float32)
        img, _ = synthetic.render_aa(scene, cam, jnp.asarray(R), jnp.asarray(t))
        Image.fromarray(np.asarray(img).astype(np.uint8)).save(
            os.path.join(out_dir, "images", f"frame_{i:06d}.png"))
        # GT stored as T_f_w (world->frame): R_f_w = R^T, t_f_w = -R^T t
        entries.append((i / 30.0, R.T.copy(), -R.T @ t))
    trajectory.write_tum(os.path.join(out_dir, "groundtruth.txt"), entries)
    with open(os.path.join(out_dir, "dataset_params.yaml"), "w") as fh:
        fh.write(
            "cam0:\n"
            f"  cam_model: Pinhole\n  cam_width: {width}\n  cam_height: {height}\n"
            f"  cam_fx: {fx}\n  cam_fy: {fy}\n  cam_cx: {width/2}\n  cam_cy: {height/2}\n"
            "  cam_d0: 0.0\n  cam_d1: 0.0\n  cam_d2: 0.0\n  cam_d3: 0.0\n"
            "images_subfolder: images/\n")
    return out_dir
