"""Why is the int8 model path slower? Chain 8 conv+scale+silu blocks at
realistic shapes and compare: bf16, int8-with-requant-seams (what the
interceptor builds), and int8-streaming (activations STAY int8: requant fused
into each epilogue, next conv consumes int8 directly).

  python tools/perf_int8_chain_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from perf_stage_probe2 import timed  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
N = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    def run_case(hw, c):
        kw = jax.block_until_ready(jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(1), (N, 3, 3, c, c), jnp.bfloat16) * 0.05)())
        x0 = jax.block_until_ready(jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(0), (BATCH, hw, hw, c), jnp.bfloat16))())
        kq = jax.block_until_ready(jax.jit(
            lambda: jnp.clip(jnp.round(kw.astype(jnp.float32) / 0.001), -127, 127).astype(jnp.int8))())
        dn = ("NHWC", "HWIO", "NHWC")

        def bf16_chain(x):
            for i in range(N):
                y = lax.conv_general_dilated(x, kw[i], (1, 1), "SAME", dimension_numbers=dn)
                x = jax.nn.silu(y * 1.01 + 0.1)  # BN-ish affine epilogue
            return x.astype(jnp.float32).sum()

        def int8_seams(x):
            for i in range(N):
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.02), -127, 127).astype(jnp.int8)
                y = lax.conv_general_dilated(xq, kq[i], (1, 1), "SAME", dimension_numbers=dn,
                                             preferred_element_type=jnp.int32)
                y = y.astype(jnp.float32) * (0.02 * 0.001)
                x = jax.nn.silu(y * 1.01 + 0.1).astype(jnp.bfloat16)
            return x.astype(jnp.float32).sum()

        def int8_stream(x):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.02), -127, 127).astype(jnp.int8)
            for i in range(N):
                y = lax.conv_general_dilated(xq, kq[i], (1, 1), "SAME", dimension_numbers=dn,
                                             preferred_element_type=jnp.int32)
                a = jax.nn.silu(y.astype(jnp.float32) * (0.02 * 0.001) * 1.01 + 0.1)
                xq = jnp.clip(jnp.round(a / 0.02), -127, 127).astype(jnp.int8)
            return xq.astype(jnp.float32).sum()

        for name, fn in [("bf16", bf16_chain), ("int8_seams", int8_seams),
                         ("int8_stream", int8_stream)]:
            dt = timed(fn, x0)
            print(json.dumps({"case": f"{name} {c}ch @{hw} x{N}",
                              "ms": round(dt * 1e3, 2)}), flush=True)

    run_case(80, 128)
    run_case(160, 64)
    run_case(40, 256)


if __name__ == "__main__":
    main()
