"""jet_pbrt_tpu — a TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CPU renderer JettHuang/jet-pbrt (C++17, see /root/reference). This is NOT a
port: virtual-dispatch object graphs, per-hit heap BSDFs, recursive pointer
BVHs and stateful mt19937 samplers are replaced by SoA device arrays, masked
divergence-free kernels, a flattened skip-link BVH traversed with
`lax.while_loop`, and counter-based (threefry) random streams — the idiomatic
mapping of a wavefront path tracer onto TPU's VPU/MXU + XLA's static-shape
compilation model.

Layout
------
ops/       batched compute kernels: linalg, sampling warps, RNG streams,
           ray-shape intersection, BVH traversal, BSDFs, microfacets, lights,
           textures
models/    camera, film, integrators (debug / Whitted / path)
scene/     scene builder API, packed device scene (ScenePack), OBJ ingestion,
           authored reference scenes (cornell box, bunny)
parallel/  device-mesh sharded rendering + gradient training (shard_map/psum)
diff/      differentiable-rendering parameter handling + gradient checks
utils/     image writers (PPM/BMP/HDR), config, logging, checkpointing
"""

__version__ = "0.1.0"
