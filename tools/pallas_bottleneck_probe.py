"""Probe: fused residual-bottleneck Pallas kernel vs XLA.

The C2f bottleneck (1x1 conv -> 3x3 conv -> residual add, BN folded, SiLU)
is the hot repeated block; XLA materializes the intermediate activations in
HBM between convs. This kernel keeps the whole per-image activation
VMEM-resident (80x80x128 bf16 = 1.6 MB) and runs both convs as MXU matmuls
(the 3x3 as 9 shifted matmuls), so HBM sees one read + one write per block.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/pallas_bottleneck_probe.py
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

B, H, W, C = 128, 80, 80, 128
ITERS = 20
N_BLOCKS = 3  # chained bottlenecks, mimicking stacked C2f inner blocks


def silu(x):
    import jax

    return x * jax.nn.sigmoid(x)


def make_params(rng, dtype):
    import jax.numpy as jnp

    p = {
        "k1": rng.normal(0, 0.05, (C, C)).astype(np.float32),
        "b1": rng.normal(0, 0.1, (C,)).astype(np.float32),
        "k3": rng.normal(0, 0.02, (3, 3, C, C)).astype(np.float32),
        "b2": rng.normal(0, 0.1, (C,)).astype(np.float32),
    }
    return {k: jnp.asarray(v).astype(dtype) for k, v in p.items()}


def xla_block(x, p):
    import jax
    import jax.numpy as jnp

    y = silu(jnp.einsum("bhwc,cd->bhwd", x, p["k1"]) + p["b1"])
    y = jax.lax.conv_general_dilated(
        y, p["k3"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return silu(y + p["b2"]) + x


def pallas_block(x, p, rs: int = 4):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, H, W, C = x.shape
    SH = H // rs

    def kernel(x_ref, k1_ref, b1_ref, k3_ref, b2_ref, o_ref, y1_ref):
        f32 = jnp.float32
        bt = x_ref.dtype
        # zero-pad border ring of the scratch once
        y1_ref[...] = jnp.zeros((H + 2, W + 2, C), bt)
        # stage 1: 1x1 conv + SiLU, strip by strip into the padded scratch
        for r in range(rs):
            xs = x_ref[0, r * SH:(r + 1) * SH]
            t = jnp.dot(xs.reshape(SH * W, C), k1_ref[...],
                        preferred_element_type=f32) + b1_ref[...].astype(f32)
            y1_ref[1 + r * SH:1 + (r + 1) * SH, 1:W + 1, :] = \
                silu(t).astype(bt).reshape(SH, W, C)
        # stage 2: 3x3 conv as 9 shifted matmuls, per strip
        for r in range(rs):
            acc = jnp.zeros((SH * W, C), f32)
            for dy in range(3):
                for dx in range(3):
                    sl = y1_ref[r * SH + dy:r * SH + dy + SH, dx:dx + W, :]
                    acc += jnp.dot(sl.reshape(SH * W, C), k3_ref[dy, dx],
                                   preferred_element_type=f32)
            out = silu(acc + b2_ref[...].astype(f32)).astype(bt).reshape(SH, W, C)
            o_ref[0, r * SH:(r + 1) * SH] = out + x_ref[0, r * SH:(r + 1) * SH]

    nb = x.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, C), lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, C), x.dtype)],
    )(x, p["k1"], p["b1"], p["k3"], p["b2"])


def timed(fn, x, params):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x, params):
        def body(i, carry):
            y = x
            for p in params:
                pp = {k: v + (carry * 0).astype(v.dtype) if k == "b1" else v
                      for k, v in p.items()}
                y = fn(y, pp)
            return y.astype(jnp.float32).ravel()[0] + carry * 0

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    @jax.jit
    def triv(z):
        return z + 1

    float(np.asarray(chain(x, params)))
    float(np.asarray(triv(jnp.float32(1))))
    t0 = time.perf_counter()
    for _ in range(3):
        float(np.asarray(triv(jnp.float32(2))))
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    float(np.asarray(chain(x, params)))
    return (time.perf_counter() - t0 - rtt) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # correctness (f32, small batch + small spatial to stay in scoped VMEM)
    x32 = jnp.asarray(rng.normal(0, 1, (2, 40, 40, C)).astype(np.float32))
    params32 = [make_params(rng, jnp.float32) for _ in range(1)]
    y_ref = xla_block(x32, params32[0])
    y_pal = pallas_block(x32, params32[0])
    err = float(jnp.abs(y_ref - y_pal).max())
    rel = err / float(jnp.abs(y_ref).max())
    print(f"max abs err {err:.3e}  rel {rel:.3e}", flush=True)
    assert rel < 2e-2, "pallas bottleneck disagrees with XLA"

    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    params = [make_params(rng, jnp.bfloat16) for _ in range(N_BLOCKS)]
    t_x = timed(xla_block, x, params)
    t_p = timed(pallas_block, x, params)
    fl = 10 * B * H * W * C * C * 2 * N_BLOCKS
    print(f"xla    : {t_x*1e3:7.2f} ms/iter  {fl/t_x/1e12:6.1f} TF/s", flush=True)
    print(f"pallas : {t_p*1e3:7.2f} ms/iter  {fl/t_p/1e12:6.1f} TF/s  "
          f"speedup {t_x/t_p:.2f}x", flush=True)


if __name__ == "__main__":
    main()
