"""Per-kernel breakdown of the TrianglePlan on the real chip.

Times every tier/hub kernel of the plan separately (steady protocol: all
reps inside one jitted lax.scan, one D2H), plus two calibration ceilings:
  * stream: chained xor-sum over a resident 256MB array
  * gather: random row-gather GB/s at several row widths

Usage: python scripts/profile_tc.py [scale] [degree]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gms_tpu.algorithms import triangle_count as tc
from gms_tpu.io.builder import build_csr
from gms_tpu.io.generators import generate_rmat_el


def steady(fn, args, reps=32):
    """Seconds/rep: reps chained executions in ONE program, one D2H.

    NOTE this chip has a ~20ms fixed cost per executable execution; at the
    default reps it adds ~0.7ms/rep to every figure below."""

    @functools.partial(jax.jit, static_argnames=("reps",))
    def scan(args, salt0, *, reps):
        def step(salt, _):
            out = fn(*args, salt)
            return (out % jnp.int64(1009)).astype(jnp.int32) + salt + 1, out

        _, outs = jax.lax.scan(step, salt0, None, length=reps)
        return outs

    np.asarray(scan(args, jnp.int32(3), reps=reps))  # compile+warm
    t0 = time.perf_counter()
    np.asarray(scan(args, jnp.int32(11), reps=reps))
    return (time.perf_counter() - t0) / reps


def stream_gbps():
    x = jnp.asarray(np.random.default_rng(1).integers(
        0, 2**31, (64 * 1024 * 1024,), dtype=np.int32))

    def f(x, salt):
        return jnp.sum(x ^ salt, dtype=jnp.int64)

    dt = steady(f, (x,))
    return x.size * 4 / dt / 1e9


def gather_gbps(n_rows, width, n_idx):
    rows = jnp.asarray(np.random.default_rng(2).integers(
        0, 2**31, (n_rows, width), dtype=np.int32))
    idx = jnp.asarray(np.random.default_rng(3).integers(
        0, n_rows, (n_idx,), dtype=np.int32))

    def f(rows, idx, salt):
        g = jnp.take(rows, (idx + salt) % n_rows, axis=0)
        return jnp.sum(g, dtype=jnp.int64)

    dt = steady(f, (rows, idx))
    return n_idx * width * 4 / dt / 1e9


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    g = build_csr(generate_rmat_el(scale, degree, seed=27491095),
                  num_nodes=1 << scale)
    plan = tc.TrianglePlan(g)
    print(f"platform={jax.devices()[0].platform} scale={scale} deg={degree}")

    total_t = 0.0
    for wa, wb, c, edges, valid in plan.tiers:
        def f(nbr, e, v, salt, *, wa=wa, wb=wb, c=c):
            return tc.count_dag_edges(nbr, jnp.roll(e, salt, axis=0),
                                      jnp.roll(v, salt, axis=0), chunk=c,
                                      width_a=wa, width_b=wb)

        dt = steady(f, (plan.padded.nbr, edges, valid))
        total_t += dt
        gb = len(valid) * (wa + wb) * 4 / 1e9
        print(f"tier ({wa:4d},{wb:4d}) edges={len(valid):8d} chunk={c:6d} "
              f"t={dt*1e3:7.2f}ms traffic={gb:6.3f}GB -> {gb/dt:6.1f}GB/s")

    for w, k, gc, b_ids, nbrs in (plan.hub or []):
        def f(rows, b, n, salt, *, w=w, k=k, gc=gc):
            return tc.count_hub_groups(rows, jnp.roll(b, salt, axis=0),
                                       jnp.roll(n, salt, axis=0),
                                       chunk=gc, width=w, k=k)

        dt = steady(f, (plan.hub_rows, b_ids, nbrs))
        total_t += dt
        gb = (len(b_ids) + nbrs.size) * w * 4 / 1e9
        print(f"hub  (w={w:4d},k={k:3d}) groups={len(b_ids):8d} chunk={gc:6d} "
              f"t={dt*1e3:7.2f}ms traffic={gb:6.3f}GB -> {gb/dt:6.1f}GB/s")

    print(f"sum of parts: {total_t*1e3:.2f}ms")
    print(f"stream: {stream_gbps():.0f} GB/s")
    nw = plan.hub_rows.shape[0] if plan.hub else 1 << 15
    for w in (32, 128, 512):
        print(f"gather rows[{nw},{w}] x 1M: {gather_gbps(nw, w, 1 << 20):.0f} GB/s")


if __name__ == "__main__":
    main()
