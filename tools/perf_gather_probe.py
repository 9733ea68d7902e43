"""Candidate-gather formulations: vmapped take_along_axis (current) vs
flattened take vs one-hot matmul, on (B,8400)->(B,1024) index sets.

  python tools/perf_gather_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from perf_stage_probe2 import timed  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "128"))
A = 8400
K = 1024


def main():
    import jax
    import jax.numpy as jnp

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    def make():
        kb, kc, ki = jax.random.split(jax.random.PRNGKey(0), 3)
        payload = jax.random.normal(kb, (B, A, 8), jnp.float32)
        conf = jax.random.uniform(kc, (B, A), jnp.float32)
        return payload, conf

    payload, conf = jax.block_until_ready(jax.jit(make)())

    def topk(conf):
        masked = jnp.where(conf > 0.25, conf, -1.0)
        return jax.lax.top_k(masked, K)

    def g_take_along(x):
        ts, ai = topk(x)
        out = jnp.take_along_axis(payload, ai[..., None], axis=1)
        return out.sum() + ts.sum()

    def g_flat_take(x):
        ts, ai = topk(x)
        flat = payload.reshape(B * A, 8)
        idx = ai + (jnp.arange(B, dtype=ai.dtype) * A)[:, None]
        out = flat[idx.reshape(-1)].reshape(B, K, 8)
        return out.sum() + ts.sum()

    def g_onehot(x):
        ts, ai = topk(x)
        oh = (ai[..., None] == jnp.arange(A, dtype=ai.dtype)[None, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum("bka,bac->bkc", oh, payload.astype(jnp.bfloat16))
        return out.astype(jnp.float32).sum() + ts.sum()

    def g_payload_bf16(x):
        ts, ai = topk(x)
        out = jnp.take_along_axis(payload.astype(jnp.bfloat16), ai[..., None], axis=1)
        return out.astype(jnp.float32).sum() + ts.sum()

    def g_topk_only(x):
        ts, ai = topk(x)
        return ts.sum() + ai.sum()

    for name, fn in [("topk_only", g_topk_only), ("take_along", g_take_along),
                     ("flat_take", g_flat_take), ("onehot_mm", g_onehot),
                     ("take_bf16", g_payload_bf16)]:
        dt = timed(fn, conf)
        print(json.dumps({"case": name, "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
