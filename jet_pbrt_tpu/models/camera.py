"""Pinhole camera: a small static pytree + a batched ray generator.

Reference camera model (reference: src/camera.h:36-58): left-handed basis,
right/up scaled by tan(fov/2)·aspect. Documented divergence: the reference
maps the film point with a [−½, ½] NDC span (`x/w − 0.5`,
reference: src/camera.h:54-55), which makes the *effective* vertical fov
2·atan(tan(fov/2)/2) — about half the nominal parameter, and inconsistent
with its own committed golden renders (cornell_box_scene_1024.jpg shows
ceiling, light and floor, which requires the true 60° frustum). We use the
standard pbrt [−1, 1] span so vfov means what it says and the framing
reproduces the goldens. No lens/DoF, no shutter time — the reference has
none either.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..ops import linalg


class Camera(NamedTuple):
    """Static camera parameters; every field is a [3] or [2] f32 array so the
    whole camera is a jit-able pytree."""
    position: jnp.ndarray    # [3]
    front: jnp.ndarray       # [3] unit
    right: jnp.ndarray       # [3] scaled by tan(fov/2)*aspect
    up: jnp.ndarray          # [3] scaled by tan(fov/2)
    resolution: jnp.ndarray  # [2] (width, height)


def make_camera(lookfrom, front, vup, vfov_degrees, resolution) -> Camera:
    """Derive the scaled basis (reference: src/camera.h:44-48)."""
    pos = np.asarray(lookfrom, dtype=np.float32)
    front = np.asarray(front, dtype=np.float64)
    front = front / np.linalg.norm(front)
    vup = np.asarray(vup, dtype=np.float64)
    vup = vup / np.linalg.norm(vup)
    w, h = float(resolution[0]), float(resolution[1])
    tan_fov = np.tan(np.deg2rad(vfov_degrees) / 2.0)
    right = np.cross(vup, front)
    right = right / np.linalg.norm(right) * (tan_fov * (w / h))
    up = np.cross(front, right)
    up = up / np.linalg.norm(up) * tan_fov
    return Camera(
        position=jnp.asarray(pos, jnp.float32),
        front=jnp.asarray(front, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        resolution=jnp.asarray([w, h], jnp.float32),
    )


def generate_rays(camera: Camera, film_xy: jnp.ndarray):
    """Batched GenerateRay (reference: src/camera.h:52-58).

    film_xy: [N, 2] continuous film coordinates (pixel + jitter).
    Returns (origins [N,3], directions [N,3] unit).
    """
    w = camera.resolution[0]
    h = camera.resolution[1]
    sx = 2.0 * (film_xy[:, 0] / w - 0.5)
    sy = 2.0 * (0.5 - film_xy[:, 1] / h)
    d = (
        camera.front[None, :]
        + camera.right[None, :] * sx[:, None]
        + camera.up[None, :] * sy[:, None]
    )
    d = linalg.normalize(d)
    o = jnp.broadcast_to(camera.position[None, :], d.shape)
    return o, d
