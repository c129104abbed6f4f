import time, numpy as np, jax, jax.numpy as jnp
for n in (65536, 262144):
    for rows in (1024, 16384, 137088):
        tab = jnp.asarray(np.random.rand(rows, 8).astype(np.float32))
        idx = jnp.asarray(np.random.randint(0, rows, n).astype(np.int32))
        f = jax.jit(lambda t, i: t[i].sum(axis=1))
        r = f(tab, idx); jax.block_until_ready(r)
        t0=time.perf_counter(); reps=20
        for _ in range(reps): r = f(tab, idx)
        jax.block_until_ready(r)
        dt=(time.perf_counter()-t0)/reps
        print(f"gather n={n} rows={rows}: {dt*1e6:.0f} us", flush=True)
