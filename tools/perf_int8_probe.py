"""Does XLA:TPU run int8 convs at the v5e's doubled MXU rate, and what do
bandwidth-bound early blocks gain from int8 activations?

Cases: conv3x3 int8xint8->int32 vs bf16 at a compute-bound shape (128ch@80^2)
and a bandwidth-bound one (32ch@160^2), plus dot_general sanity.

  python tools/perf_int8_probe.py
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


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    def make(shape, dtype):
        if dtype == jnp.int8:
            f = jax.jit(lambda: jax.random.randint(jax.random.PRNGKey(0), shape, -127, 127, jnp.int8))
        else:
            f = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), shape, dtype))
        return jax.block_until_ready(f())

    def conv_case(hw, cin, cout, dtype, label):
        x = make((BATCH, hw, hw, cin), dtype)
        w = make((3, 3, cin, cout), dtype)
        acc = jnp.int32 if dtype == jnp.int8 else jnp.float32

        def fn(x):
            y = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            return y.astype(jnp.float32).sum()

        dt = timed(fn, x)
        fl = 2 * BATCH * hw * hw * cin * cout * 9
        peak = 394e12 if dtype == jnp.int8 else 197e12
        print(json.dumps({"case": label, "ms": round(dt * 1e3, 3),
                          "pct_dtype_peak": round(100 * fl / dt / peak, 1)}), flush=True)

    conv_case(80, 128, 128, jnp.bfloat16, "conv3x3 128->128 @80 bf16")
    conv_case(80, 128, 128, jnp.int8, "conv3x3 128->128 @80 int8")
    conv_case(160, 32, 32, jnp.bfloat16, "conv3x3 32->32 @160 bf16")
    conv_case(160, 32, 32, jnp.int8, "conv3x3 32->32 @160 int8")
    conv_case(40, 256, 256, jnp.bfloat16, "conv3x3 256->256 @40 bf16")
    conv_case(40, 256, 256, jnp.int8, "conv3x3 256->256 @40 int8")

    for dtype, label in ((jnp.bfloat16, "dot 8192^2 bf16"), (jnp.int8, "dot 8192^2 int8")):
        a = make((8192, 8192), dtype)
        b = make((8192, 8192), dtype)
        acc = jnp.int32 if dtype == jnp.int8 else jnp.float32

        def fn(a):
            return lax.dot(a, b, preferred_element_type=acc).astype(jnp.float32).sum()

        dt = timed(fn, a)
        fl = 2 * 8192**3
        peak = 394e12 if dtype == jnp.int8 else 197e12
        print(json.dumps({"case": label, "ms": round(dt * 1e3, 3),
                          "pct_dtype_peak": round(100 * fl / dt / peak, 1)}), flush=True)


if __name__ == "__main__":
    main()
