import time, json
t0 = time.time()
from jet_pbrt_tpu.scene.scenes import bunny_scene
from bench import bench_scene
print(f"import+build start done {time.time()-t0:.1f}s", flush=True)
bunny = bunny_scene(bvh_leaf_size=16)
print(f"scene built {time.time()-t0:.1f}s", flush=True)
rps = bench_scene(bunny, width=1024, n_waves=4, morton=True)
print(f"bench done {time.time()-t0:.1f}s", flush=True)
print(json.dumps({"bunny_rays_per_s": round(rps), "vs_target": round(rps/1e8, 4)}), flush=True)
