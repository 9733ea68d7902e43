"""Is the early-backbone inefficiency an MXU lane ceiling (small K/N) or a
composition problem? Times single convs at 160^2/80^2 across channel widths.
If ms is ~flat as N grows toward 128, the systolic array is lane-limited at
small N and the op-local ceiling is real; if ms scales ~linearly below 128,
XLA achieves good util and the C2f composition is where time is lost.

  python tools/perf_smallchan_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from perf_stage_probe2 import timed  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "128"))


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()
    rng = np.random.default_rng(0)

    def conv_case(hw, cin, cout, k):
        x = jax.block_until_ready(
            jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0),
                                              (BATCH, hw, hw, cin), jnp.bfloat16))())
        mod = nn.Conv(cout, (k, k), padding="SAME", use_bias=False, dtype=jnp.bfloat16)
        v = mod.init(jax.random.PRNGKey(0), x)

        def fn(x):
            return jax.nn.silu(mod.apply(v, x)).astype(jnp.float32).sum()

        dt = timed(fn, x)
        fl = 2 * BATCH * hw * hw * cin * cout * k * k
        print(json.dumps({"case": f"conv{k}x{k} {cin}->{cout} @{hw}",
                          "ms": round(dt * 1e3, 3),
                          "pct_flop_peak": round(100 * fl / dt / 197e12, 1)}), flush=True)

    for cout in (32, 64, 128, 256):
        conv_case(160, 32, cout, 3)
    for cin in (32, 64, 128):
        conv_case(160, cin, 128, 3)
    conv_case(80, 64, 64, 3)
    conv_case(80, 128, 128, 3)
    conv_case(160, 64, 64, 1)
    conv_case(160, 64, 128, 1)
    conv_case(80, 128, 128, 1)

    # C2f exact blocks as used in yolov8s
    from ultralytics_pro_tpu.nn.modules.block import C2f

    for hw, c, n in ((160, 64, 1), (80, 128, 2)):
        x = jax.block_until_ready(
            jax.jit(lambda hw=hw, c=c: jax.random.normal(jax.random.PRNGKey(0),
                                                         (BATCH, hw, hw, c), jnp.bfloat16))())
        mod = C2f(c2=c, n=n, shortcut=True, dtype=jnp.bfloat16)
        v = mod.init(jax.random.PRNGKey(0), x)

        def fn(x, mod=mod, v=v):
            return mod.apply(v, x).astype(jnp.float32).sum()

        dt = timed(fn, x)
        print(json.dumps({"case": f"C2f({c},n={n}) @{hw}", "ms": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
