"""Camera models with batched project/unproject.

TPU-native replacement of the vikit camera surface the reference links
against (reference: app/run_pipeline.cpp:770-824 builds
vk::PinholeCamera / vk::ATANCamera; usage surface summarized in SURVEY §2.2:
world2cam / cam2world / undistortImage / isInFrame / errorMultiplier2).

Design: cameras are flax.struct pytrees whose intrinsics are traced arrays
(so one jitted function serves any calibration) while width/height are
static aux fields (they determine array shapes downstream). All methods
broadcast over arbitrary leading batch dims — one call projects the whole
landmark table.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PinholeCamera:
    """Pinhole + radial-tangential (radtan/plumb-bob) distortion.

    Matches vk::PinholeCamera(width, height, fx, fy, cx, cy, d0..d4)
    (reference: app/run_pipeline.cpp:782-787)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    # distortion [k1, k2, p1, p2, k3]
    dist: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=752)
    height: int = struct.field(pytree_node=False, default=480)

    @classmethod
    def create(cls, width, height, fx, fy, cx, cy, dist=None, dtype=jnp.float32):
        if dist is None:
            dist = jnp.zeros((5,), dtype)
        dist = jnp.asarray(dist, dtype)
        if dist.shape[0] < 5:
            dist = jnp.concatenate([dist, jnp.zeros((5 - dist.shape[0],), dtype)])
        return cls(
            fx=jnp.asarray(fx, dtype), fy=jnp.asarray(fy, dtype),
            cx=jnp.asarray(cx, dtype), cy=jnp.asarray(cy, dtype),
            dist=dist, width=int(width), height=int(height),
        )

    @property
    def has_distortion(self) -> bool:
        # Static check only valid for concrete arrays (outside jit).
        import numpy as np
        return bool(np.any(np.abs(np.asarray(self.dist)) > 1e-12))

    def focal(self):
        """errorMultiplier2 analogue: representative focal length (px)."""
        return self.fx

    def distort(self, uv_n: jnp.ndarray) -> jnp.ndarray:
        """Apply radtan distortion on normalized plane coords (..., 2)."""
        x, y = uv_n[..., 0], uv_n[..., 1]
        k1, k2, p1, p2, k3 = (self.dist[i] for i in range(5))
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([xd, yd], axis=-1)

    def undistort(self, uv_n: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
        """Invert distortion by fixed-point iteration (fixed trip count for jit)."""
        def body(_, cur):
            d = self.distort(cur) - cur
            return uv_n - d
        return jax.lax.fori_loop(0, iters, body, uv_n)

    def project(self, xyz: jnp.ndarray, distort: bool = True) -> jnp.ndarray:
        """world2cam: camera-frame 3D points (...,3) -> pixel coords (...,2)."""
        z = xyz[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
        uv_n = xyz[..., :2] / zs[..., None]
        if distort:
            uv_n = self.distort(uv_n)
        u = self.fx * uv_n[..., 0] + self.cx
        v = self.fy * uv_n[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1)

    def unproject(self, uv: jnp.ndarray, undistort: bool = True) -> jnp.ndarray:
        """cam2world: pixels (...,2) -> unit bearing vectors (...,3)."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        uv_n = jnp.stack([x, y], axis=-1)
        if undistort:
            uv_n = self.undistort(uv_n)
        f = jnp.concatenate([uv_n, jnp.ones_like(uv_n[..., :1])], axis=-1)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def is_in_frame(self, uv: jnp.ndarray, border: float = 0.0, level: int = 0) -> jnp.ndarray:
        """vk::AbstractCamera::isInFrame analogue, at a pyramid level."""
        scale = 1.0 / (1 << level)
        w = self.width * scale
        h = self.height * scale
        return (
            (uv[..., 0] >= border)
            & (uv[..., 1] >= border)
            & (uv[..., 0] < w - border)
            & (uv[..., 1] < h - border)
        )

    def ideal(self) -> "PinholeCamera":
        """Distortion-free copy (the reference runs the VO on an undistorted
        'ideal' camera, app/run_pipeline.cpp:788-792)."""
        return self.replace(dist=jnp.zeros_like(self.dist))


@struct.dataclass
class ATANCamera:
    """FOV/ATAN camera (Devernay-Faugeras), vk::ATANCamera analogue
    (reference: app/run_pipeline.cpp:806-817; intrinsics given normalized)."""

    fx: jnp.ndarray  # in pixels (already scaled by width/height)
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    w: jnp.ndarray  # FOV distortion parameter
    width: int = struct.field(pytree_node=False, default=752)
    height: int = struct.field(pytree_node=False, default=480)

    @classmethod
    def create(cls, width, height, fx, fy, cx, cy, w, dtype=jnp.float32):
        # The reference passes normalized intrinsics scaled inside vikit.
        return cls(
            fx=jnp.asarray(fx * width, dtype), fy=jnp.asarray(fy * height, dtype),
            cx=jnp.asarray(cx * width - 0.5, dtype), cy=jnp.asarray(cy * height - 0.5, dtype),
            w=jnp.asarray(w, dtype), width=int(width), height=int(height),
        )

    def focal(self):
        return self.fx

    def _rd_factor(self, r: jnp.ndarray) -> jnp.ndarray:
        """rd/r for the FOV model: rd = atan(2 r tan(w/2)) / w."""
        tan_half = jnp.tan(self.w * 0.5)
        safe_r = jnp.where(r < 1e-8, 1e-8, r)
        factor = jnp.arctan(2.0 * safe_r * tan_half) / (self.w * safe_r)
        return jnp.where(r < 1e-8, 2.0 * tan_half / self.w, factor)

    def project(self, xyz: jnp.ndarray, distort: bool = True) -> jnp.ndarray:
        z = xyz[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
        uv_n = xyz[..., :2] / zs[..., None]
        if distort:
            r = jnp.linalg.norm(uv_n, axis=-1)
            uv_n = uv_n * self._rd_factor(r)[..., None]
        u = self.fx * uv_n[..., 0] + self.cx
        v = self.fy * uv_n[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1)

    def unproject(self, uv: jnp.ndarray, undistort: bool = True) -> jnp.ndarray:
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        uv_n = jnp.stack([x, y], axis=-1)
        if undistort:
            rd = jnp.linalg.norm(uv_n, axis=-1)
            tan_half = jnp.tan(self.w * 0.5)
            safe_rd = jnp.where(rd < 1e-8, 1e-8, rd)
            r = jnp.tan(safe_rd * self.w) / (2.0 * tan_half)
            factor = jnp.where(rd < 1e-8, 1.0, r / safe_rd)
            uv_n = uv_n * factor[..., None]
        f = jnp.concatenate([uv_n, jnp.ones_like(uv_n[..., :1])], axis=-1)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def is_in_frame(self, uv: jnp.ndarray, border: float = 0.0, level: int = 0) -> jnp.ndarray:
        scale = 1.0 / (1 << level)
        return (
            (uv[..., 0] >= border)
            & (uv[..., 1] >= border)
            & (uv[..., 0] < self.width * scale - border)
            & (uv[..., 1] < self.height * scale - border)
        )

    @property
    def has_distortion(self) -> bool:
        return bool(np.abs(np.asarray(self.w)) > 1e-8)

    def ideal(self) -> "PinholeCamera":
        """The undistorted pinhole the VO runs on after undistort-once
        (reference: vk::ATANCamera's undistorted image shares fx/fy/cx/cy;
        app/run_pipeline.cpp:788-792 builds the 'ideal' camera the same
        way for both models)."""
        return PinholeCamera.create(
            self.width, self.height, float(np.asarray(self.fx)),
            float(np.asarray(self.fy)), float(np.asarray(self.cx)),
            float(np.asarray(self.cy)))

    def distort(self, uv_n: jnp.ndarray) -> jnp.ndarray:
        """Unit-plane ideal -> distorted normalized coords (FOV model)."""
        r = jnp.linalg.norm(uv_n, axis=-1)
        return uv_n * self._rd_factor(r)[..., None]


def project2d(xyz: jnp.ndarray) -> jnp.ndarray:
    """vk::project2d analogue: (...,3) -> (...,2) on the unit plane."""
    z = xyz[..., 2:3]
    return xyz[..., :2] / jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)


def unproject2d(uv: jnp.ndarray) -> jnp.ndarray:
    """vk::unproject2d analogue: (...,2) -> (...,3) with z=1."""
    return jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
