"""Checkpoint / resume for long renders and fits.

The reference has nothing here — its film is write-once at process exit
(reference: src/main.cc:158-160; SURVEY.md §5). Counter-based RNG makes
checkpointing trivial for us: the full state of a render is
(film accumulator, number of completed waves, seed), and of a fit,
additionally the parameter pytree. Stored as a single .npz.
"""
from __future__ import annotations

import numpy as np


def save_render_state(path: str, film: np.ndarray, waves_done: int,
                      seed: int, params: dict | None = None) -> None:
    blob = {
        "film": np.asarray(film, np.float32),
        "waves_done": np.int64(waves_done),
        "seed": np.int64(seed),
    }
    if params:
        for k, v in params.items():
            blob[f"param__{k}"] = np.asarray(v)
    np.savez(path, **blob)


def load_render_state(path: str):
    """Returns (film, waves_done, seed, params-dict)."""
    z = np.load(path)
    params = {
        k[len("param__"):]: z[k] for k in z.files if k.startswith("param__")
    }
    return (
        z["film"],
        int(z["waves_done"]),
        int(z["seed"]),
        params or None,
    )


def render_resumable(scene, width: int, height: int, spp: int,
                     checkpoint_path: str, checkpoint_every: int = 16,
                     seed: int = 0, max_depth: int = 5, clamp: bool = True):
    """Render spp waves, checkpointing the film + wave counter; resumes from
    an existing checkpoint file transparently."""
    import os

    import jax.numpy as jnp

    from ..models.render import _wave_fn
    from ..models import camera as camera_mod

    cam = camera_mod.make_camera(
        scene.camera.lookfrom, scene.camera.front, scene.camera.vup,
        scene.camera.vfov, (width, height),
    )
    n_pixels = width * height
    wave = _wave_fn(scene.meta, width, height, max_depth, "path", False,
                    seed=seed)
    ids = jnp.arange(n_pixels, dtype=jnp.int32)

    start = 0
    film = np.zeros((n_pixels, 3), np.float64)
    if os.path.exists(checkpoint_path):
        film_saved, start, seed_saved, _ = load_render_state(checkpoint_path)
        assert seed_saved == seed, "checkpoint was created with another seed"
        if film_saved.shape == film.shape:
            film = film_saved.astype(np.float64)

    for s in range(start, spp):
        film += np.asarray(
            wave(scene.pack, cam, ids, jnp.int32(s)), np.float64
        )
        if (s + 1) % checkpoint_every == 0 or s + 1 == spp:
            save_render_state(checkpoint_path, film, s + 1, seed)

    img = (film / spp).reshape(height, width, 3).astype(np.float32)
    if clamp:
        img = np.clip(img, 0.0, 1.0)
    return img
