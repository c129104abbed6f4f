"""Microbenchmark: XLA sort/scatter/gather/cumsum primitives at 1M lanes on
the real chip — the data behind replacing jnp.argsort-based ray compaction
(70-140 ms per call at 1M, wave_profile.py r5) with cumsum+scatter stable
partitioning."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20


def timed(label, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<44} {dt:8.3f} ms")
    return out


def main():
    k = jax.random.PRNGKey(0)
    keys = jax.random.randint(k, (N,), 0, 1 << 24, dtype=jnp.int32)
    mask = jax.random.uniform(jax.random.PRNGKey(1), (N,)) < 0.1
    payload3 = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    payload1 = jax.random.normal(jax.random.PRNGKey(3), (N,))
    perm = jnp.asarray(np.random.permutation(N).astype(np.int32))

    timed("argsort int32 keys", lambda x: jnp.argsort(x), keys)
    timed("sort keys only", lambda x: jnp.sort(x), keys)
    timed("cumsum int32", lambda m: jnp.cumsum(m.astype(jnp.int32)), mask)
    timed("scatter 1M int32 (perm build)",
          lambda p: jnp.zeros((N,), jnp.int32).at[p].set(
              jax.lax.iota(jnp.int32, N)), perm)
    timed("gather [N,3] by perm", lambda x, p: x[p], payload3, perm)
    timed("gather [N] by perm", lambda x, p: x[p], payload1, perm)
    timed("scatter [N,3] by perm",
          lambda x, p: jnp.zeros_like(x).at[p].set(x), payload3, perm)

    def partition_perm(m):
        """Stable 2-bucket partition permutation: True lanes first."""
        mi = m.astype(jnp.int32)
        front = jnp.cumsum(mi) - mi              # rank among True, exclusive
        n_true = front[-1] + mi[-1]
        back = jax.lax.iota(jnp.int32, N) - front + n_true
        pos = jnp.where(m, front, back)
        return jnp.zeros((N,), jnp.int32).at[pos].set(
            jax.lax.iota(jnp.int32, N))

    timed("partition perm (cumsum+scatter)", partition_perm, mask)

    def partition_full(m, o, d):
        p = partition_perm(m)
        return o[p], d[p]

    timed("partition + 2x [N,3] gathers", partition_full, mask,
          payload3, payload3)

    # 16-bucket rank via segmented cumsum over one-hot
    def bucket16(kk):
        b = kk & 15
        oh = jax.nn.one_hot(b, 16, dtype=jnp.int32)
        ranks = jnp.cumsum(oh, axis=0) - oh
        base = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(ranks[-1] + oh[-1])[:-1]])
        pos = jnp.take_along_axis(
            ranks, b[:, None], axis=1)[:, 0] + base[b]
        return jnp.zeros((N,), jnp.int32).at[pos].set(
            jax.lax.iota(jnp.int32, N))

    timed("16-bucket partition perm", bucket16, keys)


if __name__ == "__main__":
    main()
