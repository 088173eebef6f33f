"""Compare: N separate per-triangle gathers vs one packed (T,K) row-gather."""

import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N = 655360
T = 69451


def bench(name, fn, *args, reps=5):
    def scalarize(*a):
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(fn(*a)))
    fn_j = jax.jit(scalarize)
    float(np.asarray(fn_j(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(np.asarray(fn_j(*args)))
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name}: {ts[len(ts)//2]*1e3:.1f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    prim = jax.random.randint(key, (N,), 0, T).astype(jnp.int32)
    tabs = [jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32)
            for i, s in enumerate([(T, 3)] * 6 + [(T, 3, 3)] * 3 + [(T,)] * 4)]
    packed = jnp.concatenate(
        [t.reshape(T, -1) for t in tabs], axis=1)  # (T, 43)
    pad_k = -(-packed.shape[1] // 128) * 128
    packed128 = jnp.pad(packed, ((0, 0), (0, pad_k - packed.shape[1])))
    print(f"packed K={packed.shape[1]}, padded K={pad_k}")

    bench("13 separate gathers", lambda p: tuple(t[p] for t in tabs), prim)
    bench("1 packed gather (K=43)", lambda p: packed[p], prim)
    bench("1 packed gather (K=128)", lambda p: packed128[p], prim)
    bench("take axis0 packed", lambda p: jnp.take(packed, p, axis=0), prim)
    # one-hot matmul alternative (T too big: 69K x 655K matmul - skip)
    # sorted-index gather: does coherence help?
    prim_sorted = jnp.sort(prim)
    bench("13 gathers, sorted idx", lambda p: tuple(t[p] for t in tabs),
          prim_sorted)
    bench("1 packed gather, sorted idx", lambda p: packed[p], prim_sorted)
    # constant index for reference
    bench("13 gathers, const idx", lambda p: tuple(t[p] for t in tabs),
          jnp.zeros((N,), jnp.int32))


if __name__ == "__main__":
    main()
