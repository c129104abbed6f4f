"""Isolate: is the data-dependent while cond the 1.9ms/step poison?"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

rows, n, K = 400000, 65536, 320
tab = jnp.asarray(np.random.rand(rows, 12).astype(np.float32))
idx0 = jnp.asarray(np.random.randint(0, rows, n).astype(np.int32))


def bench(name, f, *args):
    r = f(*args); jax.block_until_ready(r)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms total, {dt/K*1e6:.2f} us/step", flush=True)


def body_math(i, idx, acc):
    row = tab_arg[idx]
    nxt = (idx + 1 + (row[:, 1] * 1000).astype(jnp.int32)) % rows
    return nxt, acc + row[:, 0]


# variant A: counter cond, trivial body (the toy)
def runA(tab, idx):
    def body(s):
        i, idx, acc = s
        row = tab[idx]
        acc = acc + row[:, 0]
        idx = (idx + 1 + (row[:, 1] * 1000).astype(jnp.int32)) % rows
        return i + 1, idx, acc
    return lax.while_loop(lambda s: s[0] < K, body, (jnp.int32(0), idx, jnp.zeros((n,), jnp.float32)))[2]


# variant B: data-dependent any() cond, same trivial body
def runB(tab, idx):
    def body(s):
        i, idx, acc = s
        row = tab[idx]
        acc = acc + row[:, 0]
        idx = (idx + 1 + (row[:, 1] * 1000).astype(jnp.int32)) % rows
        return i + 1, idx, acc
    def cond(s):
        return (s[0] < K) & jnp.any(s[1] >= 0)   # always true until i==K, but data-dep
    return lax.while_loop(cond, body, (jnp.int32(0), idx, jnp.zeros((n,), jnp.float32)))[2]


# variant C: counter cond, heavy body (~60 flops like the traversal)
def runC(tab, idx):
    def body(s):
        i, idx, acc = s
        row = tab[idx]
        a = row[:, 0] * row[:, 3] - row[:, 1] * row[:, 4]
        b = row[:, 2] * row[:, 5] - row[:, 6] * row[:, 7]
        c = row[:, 8] * a + row[:, 9] * b
        d2 = jnp.maximum(jnp.minimum(a, b), jnp.minimum(b, c))
        e = jnp.where(jnp.abs(c) > 1e-12, 1.0 / jnp.where(jnp.abs(c) > 1e-12, c, 1.0), 0.0)
        f2 = a * e + b * e + d2
        g = (f2 >= 0) & (d2 <= 1) & (e > 0)
        acc = acc + jnp.where(g, f2, 0.0)
        idx = (idx + 1 + (row[:, 1] * 1000).astype(jnp.int32)) % rows
        return i + 1, idx, acc
    return lax.while_loop(lambda s: s[0] < K, body, (jnp.int32(0), idx, jnp.zeros((n,), jnp.float32)))[2]


fa = jax.jit(runA); fb = jax.jit(runB); fc = jax.jit(runC)
bench("A counter-cond trivial ", fa, tab, idx0)
bench("B any()-cond   trivial ", fb, tab, idx0)
bench("C counter-cond heavy   ", fc, tab, idx0)
