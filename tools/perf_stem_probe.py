"""Stem (L0-L1) variants probe — the stage table's 43% share (round 3).

The two early convs (3->32 k3s2 @640, 32->64 k3s2 @320) run far below the
HBM-bandwidth roofline (~3 ms/batch at bs128): large-spatial small-channel
NHWC maps tile badly (C=3/32 vs the 128-lane register minor dim). Variants:

  flip_f32   explicit BGR flip + /255 f32 (the pre-fold path, for reference)
  fold_bf16  u8 -> bf16 cast + folded stem (the current bench path)
  s2d_dev    on-device space-to-depth u8 (B,320,320,12) + EXACT k2s1 rewrite
  s2d_host   S2D'd input supplied by the host loader (free at load time)
  l1_only    32->64 k3s2 @320 alone (bf16 in)

The k2s1 rewrite is exact: conv(x, K3, s2, p1) == conv(S2D(x), K2, s1,
p(1,0)) with K2 zero-embedding K3 taps into (cell, slot) coordinates.

  python tools/perf_stem_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", "640"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def timed(fn, *args):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(*a):
        def body(i, carry):
            return fn(*a, carry) + carry * 0
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    @jax.jit
    def trivial(x):
        return x + 1.0

    float(np.asarray(chain(*args)))
    t0 = time.perf_counter()
    for _ in range(3):
        float(np.asarray(trivial(jnp.float32(2.0))))
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    float(np.asarray(chain(*args)))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS


def s2d_kernel(k3):
    """Embed a (3,3,3,C) s2p1 kernel into the (2,2,12,C) s1 p(1,0) form."""
    kh, kw, ci, co = k3.shape
    k2 = np.zeros((2, 2, 2 * 2 * ci, co), k3.dtype)
    # cell offset 0 = cell o-1 (slot 1 == orig tap a=0); offset 1 = cell o
    # (slot 0 == a=1, slot 1 == a=2)
    tap = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    for (ci_off, si), a in tap.items():
        for (cj_off, sj), b in tap.items():
            k2[ci_off, cj_off, (si * 2 + sj) * ci:(si * 2 + sj) * ci + ci, :] = k3[a, b]
    return k2


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))
    h2 = IMGSZ // 2
    u8_s2d_host = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(u8).reshape(BATCH, h2, 2, h2, 2, 3)
            .transpose(0, 1, 3, 2, 4, 5).reshape(BATCH, h2, h2, 12)))

    k0 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 32)), jnp.bfloat16)
    b0 = jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.bfloat16)
    k1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 32, 64)), jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.bfloat16)
    k0f = (k0[:, :, ::-1, :] / 255.0).astype(jnp.bfloat16)  # folded flip+scale
    k0s = jnp.asarray(s2d_kernel(np.asarray(k0f, np.float32)), jnp.bfloat16)

    dn = ("NHWC", "HWIO", "NHWC")

    def silu(x):
        return x * jax.nn.sigmoid(x)

    def conv(x, k, b, s, pad):
        y = lax.conv_general_dilated(x, k, (s, s), pad, dimension_numbers=dn)
        return silu(y + b)

    def l1(x, carry):
        x = x + (carry > 1e30).astype(x.dtype)  # false, but not foldable
        return conv(x, k1, b1, 2, ((1, 1), (1, 1))).astype(jnp.float32).sum()

    def flip_f32(x, carry):
        x = x + (carry > 1e30).astype(x.dtype)  # false, but not foldable
        y = x[..., ::-1].astype(jnp.float32) / 255.0
        y = conv(y.astype(jnp.bfloat16), k0, b0, 2, ((1, 1), (1, 1)))
        return conv(y, k1, b1, 2, ((1, 1), (1, 1))).astype(jnp.float32).sum()

    def fold_bf16(x, carry):
        x = x + (carry > 1e30).astype(x.dtype)  # false, but not foldable
        y = conv(x.astype(jnp.bfloat16), k0f, b0, 2, ((1, 1), (1, 1)))
        return conv(y, k1, b1, 2, ((1, 1), (1, 1))).astype(jnp.float32).sum()

    def s2d_dev(x, carry):
        x = x + (carry > 1e30).astype(x.dtype)  # false, but not foldable
        b = x.shape[0]
        y = x.reshape(b, h2, 2, h2, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, h2, h2, 12)
        y = conv(y.astype(jnp.bfloat16), k0s, b0, 1, ((1, 0), (1, 0)))
        return conv(y, k1, b1, 2, ((1, 1), (1, 1))).astype(jnp.float32).sum()

    def s2d_host(x, carry):
        x = x + (carry > 1e30).astype(x.dtype)  # false, but not foldable
        y = conv(x.astype(jnp.bfloat16), k0s, b0, 1, ((1, 0), (1, 0)))
        return conv(y, k1, b1, 2, ((1, 1), (1, 1))).astype(jnp.float32).sum()

    # exactness check (f32 on small shapes)
    xs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    ya = conv(xs.astype(jnp.bfloat16), k0f, b0, 2, ((1, 1), (1, 1)))
    ys = xs.reshape(2, 32, 2, 32, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(2, 32, 32, 12)
    yb = conv(ys.astype(jnp.bfloat16), k0s, b0, 1, ((1, 0), (1, 0)))
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
    print(json.dumps({"s2d_exactness_maxerr": err}), flush=True)

    x32 = jnp.asarray(rng.normal(0, 1, (BATCH, h2, h2, 32)), jnp.bfloat16)
    for name, fn, arg in [("flip_f32", flip_f32, u8), ("fold_bf16", fold_bf16, u8),
                          ("s2d_dev", s2d_dev, u8), ("s2d_host", s2d_host, u8_s2d_host),
                          ("l1_only", l1, x32)]:
        dt = timed(fn, arg)
        print(json.dumps({"variant": name, "ms_per_batch": round(dt * 1e3, 3),
                          "imgs_per_sec": round(BATCH / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
