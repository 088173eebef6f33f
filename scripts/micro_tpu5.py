"""Per-primitive costs at arena width on the live TPU, memoization-proofed."""

import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N = 655360
FB = 512 * 512


def bench(name, fn, *args, reps=4):
    def wrapped(eps, *a):
        out = fn(eps, *a)
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(out))

    fn_j = jax.jit(wrapped)
    float(np.asarray(fn_j(1e-7, *args)))
    ts = []
    for i in range(reps):
        t0 = time.time()
        float(np.asarray(fn_j(1e-6 * (i + 1), *args)))
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name}: {ts[len(ts)//2]*1e3:.1f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    vals16 = jax.random.normal(k1, (N, 16), jnp.float32)
    vals45 = jax.random.normal(k1, (69504, 45), jnp.float32)
    idx = jax.random.randint(k2, (N,), 0, N).astype(jnp.int32)
    tid = jax.random.randint(k2, (N,), 0, 69504).astype(jnp.int32)
    pid = jax.random.randint(k3, (N,), 0, FB).astype(jnp.int32)
    act = jax.random.bernoulli(k3, 0.5, (N,))
    f1 = jax.random.normal(k1, (N,), jnp.float32)

    bench("floor (sum N)", lambda e, v: (v.sum() + e,), f1)
    bench("eltwise x10", lambda e, v: (
        sum(jnp.tanh(v + e * i) for i in range(10)),), f1)
    bench("cumsum int N", lambda e, v: (jnp.cumsum((v + e > 0)
                                                   .astype(jnp.int32)),), f1)
    bench("reverse+cumsum+rev", lambda e, v: (
        jnp.cumsum((v + e > 0).astype(jnp.int32)[::-1])[::-1],), f1)
    bench("sort f32 N", lambda e, v: (jnp.sort(v + e),), f1)
    bench("argsort i32 N", lambda e, v: (jnp.argsort(
        (v * 1e6 + e).astype(jnp.int32)),), f1)
    bench("scatter (N,16) set drop", lambda e, v, i: (
        jnp.zeros((N, 16), jnp.float32).at[i].set(v + e, mode="drop"),),
        vals16, idx)
    bench("scatter (N,) set drop", lambda e, v, i: (
        jnp.zeros((N,), jnp.float32).at[i].set(v[:, 0] + e, mode="drop"),),
        vals16, idx)
    bench("scatter-add fb (N->FB,4)", lambda e, v, i: (
        jnp.zeros((FB, 4), jnp.float32).at[i].add(v[:, :4] + e,
                                                  mode="drop"),),
        vals16, pid)
    bench("gather (N,16)", lambda e, v, i: ((v + e)[i],), vals16, idx)
    bench("gather shade (N,45)", lambda e, v, i: ((v + e)[i],), vals45, tid)
    bench("one_hot(4)xN cumsum2d", lambda e, v: (
        jnp.cumsum(jax.nn.one_hot((v + e > 0).astype(jnp.int32) * 3, 4,
                                  dtype=jnp.int32), axis=0),), f1)


if __name__ == "__main__":
    main()
