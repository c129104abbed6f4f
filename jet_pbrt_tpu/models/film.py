"""Film: a [H, W, 3] float32 radiance accumulator.

Functional equivalent of FFilm/FFilmView (reference: src/film.h:27-136). The
reference's FFilmView — a mutable sub-rectangle handed to each render thread —
has no place in an SPMD design; its role (disjoint ownership of film rows per
worker) is played by sharding the pixel axis over the device mesh instead.

The reference clamps per-pixel radiance to [0,1] before the film write
(reference: src/integrator.cc:108), destroying HDR. We keep the film linear
HDR and offer the clamp as an option at save time for reference-faithful
output.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import image as image_io


def new_film(width: int, height: int) -> jnp.ndarray:
    return jnp.zeros((height, width, 3), dtype=jnp.float32)


def add_samples(film: jnp.ndarray, colors_flat: jnp.ndarray) -> jnp.ndarray:
    """Accumulate one wave of per-pixel colors laid out row-major."""
    return film + colors_flat.reshape(film.shape)


def finalize(film: jnp.ndarray, spp: int, clamp: bool = True) -> jnp.ndarray:
    """Average accumulated radiance over spp; optionally clamp to [0,1] like
    the reference does per pixel (reference: src/integrator.cc:108)."""
    img = film / jnp.float32(spp)
    if clamp:
        img = jnp.clip(img, 0.0, 1.0)
    return img


def save(film_or_img, path_base: str, fmt: str = "bmp") -> str:
    return image_io.save_image(path_base, np.asarray(film_or_img), fmt)
