"""Measure sort_rays on/off on the bunny scene (VERDICT r3 task 2).

Prints compile time and rays/s for each setting so the winning config can
be committed to bench.py and the README table.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import bench_scene, _morton_ids  # noqa: E402


def main():
    from jet_pbrt_tpu.scene.scenes import bunny_scene
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    scene = bunny_scene(bvh_leaf_size=16)
    for sort in (False, True):
        t0 = time.perf_counter()
        rps = bench_scene(scene, width=width, n_waves=4, morton=True,
                          sort_rays=sort)
        dt = time.perf_counter() - t0
        print(f"sort_rays={sort}: {rps/1e6:8.2f} M rays/s "
              f"(total incl compile {dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
