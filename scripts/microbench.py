"""Microbenchmarks: dispatch latency, stream bandwidth, gather bandwidth.

Separates the fixed host->device round-trip cost from real HBM throughput so
the TC roofline (VERDICT item 1) is steered by device numbers, not latency.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, trials=7):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # 1. dispatch floor: trivial kernel + D2H of a scalar
    tiny = jnp.zeros((8, 128), jnp.float32)
    f0 = jax.jit(lambda x: jnp.sum(x))
    t = timed(f0, tiny)
    print(f"dispatch floor (tiny sum, D2H scalar): {t*1e3:.2f} ms")

    # 2. stream bandwidth: sum over a big array
    for mb in (256, 1024):
        x = jnp.zeros((mb * 1024 * 1024 // 4,), jnp.float32)
        f1 = jax.jit(lambda x: jnp.sum(x))
        t = timed(f1, x)
        print(f"stream sum {mb}MB: {t*1e3:.2f} ms -> {mb/1024/t:.0f} GB/s")

    # 3. gather bandwidth: random row gather [N, W] words, sum-reduced
    rng = np.random.default_rng(0)
    N_ROWS = 160_000
    for W in (16, 64, 128, 512):
        rows = jnp.zeros((N_ROWS, W), jnp.uint32)
        n_idx = 2_000_000
        idx = jnp.asarray(rng.integers(0, N_ROWS, n_idx, dtype=np.int32))

        @jax.jit
        def g(rows, idx):
            r = jnp.take(rows, idx, axis=0)
            return jnp.sum(jax.lax.population_count(r), dtype=jnp.int64)

        t = timed(g, rows, idx)
        nbytes = n_idx * W * 4
        print(f"gather {n_idx} rows x {W} words: {t*1e3:.2f} ms -> "
              f"{nbytes/t/1e9:.1f} GB/s")

    # 4. gather+AND+popcount pair (the hub hot loop) at one width
    for W in (64, 128):
        rows = jnp.zeros((N_ROWS, W), jnp.uint32)
        n_e = 1_000_000
        ea = jnp.asarray(rng.integers(0, N_ROWS, n_e, dtype=np.int32))
        eb = jnp.asarray(rng.integers(0, N_ROWS, n_e, dtype=np.int32))

        @jax.jit
        def h(rows, ea, eb):
            a = jnp.take(rows, ea, axis=0)
            b = jnp.take(rows, eb, axis=0)
            return jnp.sum(jax.lax.population_count(a & b), dtype=jnp.int64)

        t = timed(h, rows, ea, eb)
        nbytes = n_e * 2 * W * 4
        print(f"hub pair {n_e} edges w={W}: {t*1e3:.2f} ms -> "
              f"{nbytes/t/1e9:.1f} GB/s")

    # 5. same but via scan chunks (current kernel shape)
    W = 128
    rows = jnp.zeros((N_ROWS, W), jnp.uint32)
    n_e = 1_048_576
    ea = jnp.asarray(rng.integers(0, N_ROWS, n_e, dtype=np.int32))
    eb = jnp.asarray(rng.integers(0, N_ROWS, n_e, dtype=np.int32))
    for chunk in (8192, 32768, 131072):
        @functools.partial(jax.jit, static_argnames=("chunk",))
        def hs(rows, ea, eb, chunk=chunk):
            eac = ea.reshape(-1, chunk)
            ebc = eb.reshape(-1, chunk)

            def body(acc, xs):
                ia, ib = xs
                a = jnp.take(rows, ia, axis=0)
                b = jnp.take(rows, ib, axis=0)
                return acc + jnp.sum(jax.lax.population_count(a & b),
                                     dtype=jnp.int64), None

            tot, _ = jax.lax.scan(body, jnp.int64(0), (eac, ebc))
            return tot

        t = timed(hs, rows, ea, eb)
        nbytes = n_e * 2 * W * 4
        print(f"hub scan chunk={chunk} w={W}: {t*1e3:.2f} ms -> "
              f"{nbytes/t/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
