"""Procedural asset generation.

The reference scenes depend on OBJ files that the reference repo does not
ship (reference: src/main.cc:34, 94 reference `scene\\...` paths; the repo
has no scene/ directory). This module synthesizes stand-ins:

* `generate_bunny_obj` — a ~70k-triangle bunny-ish mesh (body/head/ears/
  tail/feet as UV-sphere parts) matching the Stanford bunny's scale
  (~0.15 units tall, so the reference's x500 scale gives a ~75-unit bunny,
  reference: src/main.cc:94).
* `generate_cornell_objs` — the Cornell-box wall/box meshes as OBJ files,
  for exercising the OBJ ingestion path end-to-end.
"""
from __future__ import annotations

import numpy as np

from . import objio


def _uv_sphere(n_theta: int, n_phi: int) -> np.ndarray:
    """Unit-sphere triangle soup [T,3,3] from a lat-long grid."""
    theta = np.linspace(0.0, np.pi, n_theta + 1)
    phi = np.linspace(0.0, 2.0 * np.pi, n_phi + 1)
    tg, pg = np.meshgrid(theta, phi, indexing="ij")
    pts = np.stack(
        [np.sin(tg) * np.cos(pg), np.cos(tg), np.sin(tg) * np.sin(pg)], axis=-1
    )  # [n_theta+1, n_phi+1, 3], y-up
    tris = []
    for i in range(n_theta):
        a = pts[i, :-1]
        b = pts[i + 1, :-1]
        c = pts[i + 1, 1:]
        d = pts[i, 1:]
        tris.append(np.stack([a, b, c], axis=1))
        tris.append(np.stack([a, c, d], axis=1))
    return np.concatenate(tris).astype(np.float32)


def _part(base: np.ndarray, scale, rotate_x: float = 0.0,
          translate=(0, 0, 0)) -> np.ndarray:
    t = base * np.asarray(scale, np.float32)
    if rotate_x:
        c, s = np.cos(rotate_x), np.sin(rotate_x)
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
        t = t @ rot.T
    return t + np.asarray(translate, np.float32)


def bunny_mesh(target_tris: int = 70000) -> np.ndarray:
    """Bunny-ish mesh, y-up, facing +z, about 0.16 units tall, sitting on
    y=0. Triangle count lands near `target_tris` (~69k at default)."""
    # budget split across parts (body gets the most)
    s = np.sqrt(target_tris / 70000.0)
    body = _uv_sphere(int(110 * s), int(150 * s))
    head = _uv_sphere(int(70 * s), int(90 * s))
    ear = _uv_sphere(int(40 * s), int(44 * s))
    foot = _uv_sphere(int(22 * s), int(28 * s))
    tail = _uv_sphere(int(22 * s), int(28 * s))

    parts = [
        _part(body, (0.055, 0.048, 0.068), translate=(0, 0.048, -0.01)),
        _part(head, (0.034, 0.034, 0.036), translate=(0, 0.095, 0.045)),
        _part(ear, (0.011, 0.042, 0.016), rotate_x=-0.35,
              translate=(-0.018, 0.142, 0.028)),
        _part(ear, (0.011, 0.042, 0.016), rotate_x=-0.35,
              translate=(0.018, 0.142, 0.028)),
        _part(tail, (0.016, 0.016, 0.016), translate=(0, 0.045, -0.075)),
        _part(foot, (0.018, 0.012, 0.028), translate=(-0.032, 0.012, 0.025)),
        _part(foot, (0.018, 0.012, 0.028), translate=(0.032, 0.012, 0.025)),
    ]
    return np.concatenate(parts)


def generate_bunny_obj(path: str, target_tris: int = 70000) -> int:
    mesh = bunny_mesh(target_tris)
    objio.save_obj(path, mesh)
    return len(mesh)


def generate_cornell_objs(dirpath: str) -> None:
    """Emit the authored Cornell geometry as OBJ meshes (floor.obj etc.),
    mirroring the file set the reference expects (reference: src/main.cc:34-54)."""
    import os
    from .scenes import cornell_box

    os.makedirs(dirpath, exist_ok=True)
    scene = cornell_box(use_bvh=False)
    p0 = np.asarray(scene.pack.tri_p0)
    p1 = np.asarray(scene.pack.tri_p1)
    p2 = np.asarray(scene.pack.tri_p2)
    tris = np.stack([p0, p1, p2], axis=1)
    groups = {
        "light.obj": range(0, 2),
        "floor.obj": range(2, 4),
        "ceiling.obj": range(4, 6),
        "back.obj": range(6, 8),
        "left.obj": range(8, 10),
        "right.obj": range(10, 12),
        "shortbox.obj": range(12, 22),
        "tallbox.obj": range(22, 32),
    }
    for name, rng_ in groups.items():
        objio.save_obj(os.path.join(dirpath, name), tris[list(rng_)])


if __name__ == "__main__":
    import os, sys

    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "..", "assets"
    )
    os.makedirs(out, exist_ok=True)
    n = generate_bunny_obj(os.path.join(out, "bunny.obj"))
    print(f"wrote bunny.obj with {n} triangles")
    generate_cornell_objs(os.path.join(out, "cornellbox"))
    print("wrote cornellbox/*.obj")
