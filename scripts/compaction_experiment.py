#!/usr/bin/env python
"""Wavefront-compaction experiment (SURVEY.md §7's "central architectural
experiment"; VERDICT r1 next-step #3).

Measures the masked megakernel against lane-permutation compaction
(ops/sort.py: dead lanes to the tail + live lanes regrouped by direction
octant / origin Morton) on both scene classes:

  * cornell 512^2  — tiny scene, brute-force intersection (VPU-bound)
  * bunny 1024^2   — 4x instanced ~66k-tri mesh, TLAS/BLAS traversal

Run on the bench chip:  python scripts/compaction_experiment.py
Prints a markdown table; the committed r5 results live in README.md
("Wavefront compaction experiment" — sorting is ~1.7x on kernel-routed
scenes, a 3x LOSS on tiny brute-force scenes).
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402  (repo-root bench.py provides the harness)


def main():
    from jet_pbrt_tpu.scene.scenes import cornell_box, bunny_scene

    rows = []
    cornell = cornell_box(lambert_only=False, use_bvh=False)
    for sort in (False, True):
        rps, _ = bench.bench_scene(cornell, width=512, n_waves=16,
                                   sort_rays=sort)
        rows.append(("cornell 512^2 (brute)", "sorted" if sort else "masked",
                     rps))
        print(rows[-1], flush=True)

    bunny = bunny_scene(bvh_leaf_size=16)
    for morton in (False, True):
        for sort in (False, True):
            rps, _ = bench.bench_scene(bunny, width=1024, n_waves=4,
                                       morton=morton, sort_rays=sort)
            label = ("morton+" if morton else "scanline+") + (
                "sorted" if sort else "masked")
            rows.append(("bunny 1024^2 (TLAS/BLAS)", label, rps))
            print(rows[-1], flush=True)

    print("\n| scene | wave layout | rays/s |")
    print("|---|---|---|")
    for scene, label, rps in rows:
        print(f"| {scene} | {label} | {rps / 1e6:.1f}M |")


if __name__ == "__main__":
    main()
