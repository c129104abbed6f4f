"""Command-line renderer, mirroring the reference executable's interface:
`python -m jet_pbrt_tpu.cli <sceneid> [spp]` (reference: src/main.cc:113-163,
`pbrt.exe sceneid spp`), plus flags the reference hard-codes.
"""
from __future__ import annotations

import argparse
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="jet_pbrt_tpu renderer")
    p.add_argument("sceneid", type=int, help="0 = cornell box, 1 = bunny")
    p.add_argument("spp", type=int, nargs="?", default=50,
                   help="samples per pixel (reference default 50)")
    p.add_argument("--size", type=int, default=1024,
                   help="square resolution (reference: 1024)")
    p.add_argument("--max-depth", type=int, default=5)
    p.add_argument("--integrator", default="path",
                   choices=["path", "whitted", "debug"])
    p.add_argument("--sampler", default="random",
                   choices=["random", "stratified", "debug"])
    p.add_argument("--mis", action="store_true",
                   help="enable power-heuristic MIS (reference-divergent)")
    p.add_argument("--format", default="bmp", choices=["bmp", "ppm", "hdr"])
    p.add_argument("--no-clamp", action="store_true",
                   help="keep HDR output (the reference clamps to [0,1])")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a JAX platform (this image's site hook pins "
                        "JAX_PLATFORMS=axon, so use this to run on CPU)")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update(
            "jax_platforms", "axon" if args.platform == "tpu" else args.platform
        )

    from .scene.scenes import SCENES
    from .models.render import render
    from .models import film as film_mod
    from .utils.log import log_print

    if args.sceneid not in SCENES:
        log_print(f"unknown scene id {args.sceneid}")
        return 1
    if args.size <= 0 or args.spp <= 0:
        log_print("size and spp must be positive")
        return 1

    scene = SCENES[args.sceneid]()
    log_print(f"current scene: {scene.meta.name}")
    t0 = time.time()
    img = render(
        scene, args.size, args.size, args.spp, seed=args.seed,
        max_depth=args.max_depth, integrator=args.integrator, mis=args.mis,
        sampler=args.sampler, clamp=not args.no_clamp,
    )
    dt = time.time() - t0
    rays = args.size * args.size * args.spp
    log_print(f"render finished in {dt:.2f}s "
              f"(~{rays / max(dt, 1e-9) / 1e6:.2f}M primary rays/s, "
              "compile included)")
    base = args.out or f"{scene.meta.name}_{args.spp}"
    path = film_mod.save(img, base, args.format)
    log_print(f"saved {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
