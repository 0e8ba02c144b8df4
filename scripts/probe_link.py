"""Probe the device<->host link: bandwidth each way, piece-size
sensitivity, and whether copy_to_host_async overlaps device compute.

Usage: python scripts/probe_link.py
"""

import sys
import time
import functools
print = functools.partial(print, flush=True)

sys.path.insert(0, ".")

import numpy as np

import gossamer_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    MB = 1 << 20
    # --- H2D bandwidth ---
    for sz in (4 * MB, 16 * MB):
        host = np.random.randint(0, 2**31, size=sz // 4, dtype=np.int32)
        a = jnp.asarray(host)  # warm path
        a.block_until_ready()
        t0 = time.time()
        b = jnp.asarray(host)
        b.block_until_ready()
        # force materialization with a reduction pull (tiny D2H)
        s = jnp.sum(b)
        int(s)
        dt = time.time() - t0
        print(f"# H2D {sz/MB:.0f}MB: {dt:.2f}s = {sz/MB/dt:.1f}MB/s")

    # --- D2H bandwidth, one big array vs pieces ---
    big = jnp.arange(6 * MB, dtype=jnp.int32)  # 24MB
    big.block_until_ready()
    t0 = time.time()
    h = np.asarray(big)
    dt = time.time() - t0
    print(f"# D2H 24MB contiguous: {dt:.2f}s = {24/dt:.1f}MB/s")

    pieces = [big[i * MB : (i + 1) * MB] for i in range(6)]  # 4MB each
    pieces = jax.jit(lambda xs: [x + 0 for x in xs])(pieces)
    jax.block_until_ready(pieces)
    t0 = time.time()
    h = jax.device_get(pieces)
    dt = time.time() - t0
    print(f"# D2H 24MB in 6x4MB device_get: {dt:.2f}s = {24/dt:.1f}MB/s")

    t0 = time.time()
    for p in pieces:
        p.copy_to_host_async()
    h = [np.asarray(p) for p in pieces]
    dt = time.time() - t0
    print(f"# D2H 24MB async-then-read:    {dt:.2f}s = {24/dt:.1f}MB/s")

    # --- overlap test: start async pull, then run compute, then read ---
    @jax.jit
    def burn(x):
        for _ in range(40):
            x = jnp.sin(x) * 1.0001 + 0.3
        return x

    w = jnp.zeros((2048, 2048), jnp.float32)
    w = burn(w)
    w.block_until_ready()
    t0 = time.time()
    w = burn(w)
    w.block_until_ready()
    t_burn = time.time() - t0
    print(f"# burn kernel alone: {t_burn:.2f}s")

    src = jnp.arange(6 * MB, dtype=jnp.int32) * 3
    src.block_until_ready()
    t0 = time.time()
    h = np.asarray(src)
    t_pull = time.time() - t0
    print(f"# pull 24MB alone: {t_pull:.2f}s")

    # now overlap: async pull + burn x N, then read
    n_burn = max(1, int(t_pull / max(t_burn, 1e-3)))
    src2 = src + 1
    src2.block_until_ready()
    t0 = time.time()
    src2.copy_to_host_async()
    for _ in range(n_burn):
        w = burn(w)
    w.block_until_ready()
    h = np.asarray(src2)
    dt = time.time() - t0
    serial = t_pull + n_burn * t_burn
    print(f"# overlap: async pull 24MB + {n_burn}x burn = {dt:.2f}s "
          f"(serial would be {serial:.2f}s; overlap factor "
          f"{serial/max(dt,1e-9):.2f}x)")


if __name__ == "__main__":
    main()
