"""TRUSTWORTHY microbenchmarks of permutation primitives at 1M lanes.

Methodology note (hard-won, r5): timing a jitted fn by re-calling it with
IDENTICAL input buffers measures ~0 for some ops on the axon backend —
results appear to be cached/deduped. Every rep here uses a DIFFERENT input
buffer set, and the reported time is (total / reps) over fresh inputs.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 1 << 20
R = 8  # input variants


def timed(label, fn, variants, reps=16):
    f = jax.jit(fn)
    out = f(*variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = f(*variants[i % R])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<52} {dt:8.3f} ms", flush=True)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), R * 8).reshape(R, 8, 2)
    keys = [jax.random.randint(jax.random.PRNGKey(100 + i), (N,), 0, 1 << 24,
                               dtype=jnp.int32) for i in range(R)]
    perms = [jnp.asarray(np.random.RandomState(i).permutation(N)
                         .astype(np.int32)) for i in range(R)]
    o3 = [jax.random.normal(jax.random.PRNGKey(200 + i), (N, 3))
          for i in range(R)]
    f13 = [jax.random.normal(jax.random.PRNGKey(300 + i), (N, 13))
           for i in range(R)]
    f1 = [jax.random.normal(jax.random.PRNGKey(400 + i), (N,))
          for i in range(R)]
    jax.block_until_ready((keys, perms, o3, f13, f1))

    timed("argsort 1M i32", lambda k: jnp.argsort(k),
          [(keys[i],) for i in range(R)])
    timed("sort 1M i32 keys only", lambda k: jnp.sort(k),
          [(keys[i],) for i in range(R)])
    timed("gather [N] by input perm", lambda x, p: x[p],
          [(f1[i], perms[i]) for i in range(R)])
    timed("gather [N,3] by input perm", lambda x, p: x[p],
          [(o3[i], perms[i]) for i in range(R)])
    timed("gather [N,13] by input perm", lambda x, p: x[p],
          [(f13[i], perms[i]) for i in range(R)])
    timed("scatter [N,13] by input perm",
          lambda x, p: jnp.zeros_like(x).at[p].set(x),
          [(f13[i], perms[i]) for i in range(R)])
    timed("in-graph argsort + gather [N,13]",
          lambda x, k: x[jnp.argsort(k)],
          [(f13[i], keys[i]) for i in range(R)])
    timed("variadic sort 1 key + 13 scalar payloads",
          lambda k, x: lax.sort((k,) + tuple(x[:, j] for j in range(13)),
                                num_keys=1),
          [(keys[i], f13[i]) for i in range(R)])
    timed("variadic sort 1 key + 3 scalar payloads",
          lambda k, x: lax.sort((k, x[:, 0], x[:, 1], x[:, 2]), num_keys=1),
          [(keys[i], f13[i]) for i in range(R)])
    timed("cumsum 1M i32", lambda k: jnp.cumsum(k & 1),
          [(keys[i],) for i in range(R)])

    def partition_perm(m):
        mi = m.astype(jnp.int32)
        front = jnp.cumsum(mi) - mi
        n_true = front[-1] + mi[-1]
        back = lax.iota(jnp.int32, N) - front + n_true
        pos = jnp.where(m, front, back)
        return jnp.zeros((N,), jnp.int32).at[pos].set(lax.iota(jnp.int32, N))

    timed("partition perm (cumsum+scatter) only",
          lambda k: partition_perm(k & 1 == 0),
          [(keys[i],) for i in range(R)])
    timed("partition perm + gather [N,13]",
          lambda x, k: x[partition_perm(k & 1 == 0)],
          [(f13[i], keys[i]) for i in range(R)])


if __name__ == "__main__":
    main()
