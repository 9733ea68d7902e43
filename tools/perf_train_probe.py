"""Train-step throughput breakdown on the chip (round 3).

bench.py measured 101 imgs/s for the full jitted train step at bs32 vs ~1,100
imgs/s inference at the same batch — this probe splits the step into
(a) loss-forward only, (b) value_and_grad, (c) full step (grads + clip + SGD
+ EMA) to locate the gap, across batch sizes.

Run WITHOUT touching PYTHONPATH (the axon plugin lives on the default one):
    cd /root/repo && python tools/perf_train_probe.py
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

IMGSZ = int(os.environ.get("BENCH_IMGSZ", "640"))
ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "8"))


def main():
    import jax
    import jax.numpy as jnp

    assert any("TPU" in str(d) for d in jax.devices()), (
        f"probe requires the TPU backend, got {jax.devices()}")

    from ultralytics_pro_tpu.engine.trainer import DetectionTrainer
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    batches = tuple(int(b) for b in os.environ.get("BENCH_TRAIN_BATCHES", "32,64,128").split(","))
    for batch in batches:
        model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
        model.init_params(imgsz=IMGSZ)
        tr = DetectionTrainer(model, {"batch": batch, "imgsz": IMGSZ,
                                      "save_dir": "/tmp/train_probe"})
        criterion = tr.criterion()
        module = model.module
        params = model.variables["params"]
        bstats = model.variables["batch_stats"]

        rng = np.random.default_rng(0)
        max_gt, n_gt = 32, 8
        cls = np.zeros((batch, max_gt), np.float32)
        cls[:, :n_gt] = rng.integers(0, 80, (batch, n_gt))
        wh = rng.uniform(0.05, 0.4, (batch, max_gt, 2)).astype(np.float32)
        cxy = rng.uniform(0.2, 0.8, (batch, max_gt, 2)).astype(np.float32)
        db = {
            "img": jnp.asarray(rng.integers(0, 255, (batch, IMGSZ, IMGSZ, 3), dtype=np.uint8)),
            "cls": jnp.asarray(cls),
            "bboxes": jnp.asarray(np.concatenate([cxy, wh], -1)),
            "mask_gt": jnp.asarray(np.arange(max_gt)[None] < n_gt).repeat(batch, 0),
        }

        def loss_fn(params, bstats, batch_):
            x = batch_["img"][..., ::-1].astype(jnp.float32) / 255.0
            preds, upd = module.apply({"params": params, "batch_stats": bstats}, x,
                                      train=True, mutable=["batch_stats"])
            total, parts = criterion(preds, batch_, (x.shape[1], x.shape[2]))
            return total, (parts, upd["batch_stats"])

        @jax.jit
        def chain_fwd(params, bstats, batch_):
            def body(i, carry):
                b2 = dict(batch_)
                b2["img"] = batch_["img"] + (carry * 0).astype(jnp.uint8)
                total, _aux = loss_fn(params, bstats, b2)
                return total.astype(jnp.float32) + carry * 0
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        @jax.jit
        def chain_grad(params, bstats, batch_):
            def body(i, carry):
                b2 = dict(batch_)
                b2["img"] = batch_["img"] + (carry * 0).astype(jnp.uint8)
                (total, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, bstats, b2)
                gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                           for g in jax.tree.leaves(grads))
                return (total + gsum * 0).astype(jnp.float32) + carry * 0
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        step_fn = tr.build_train_step()
        state = (params, bstats, jax.tree.map(jnp.zeros_like, params),
                 jax.tree.map(jnp.copy, params), jnp.zeros((), jnp.int32),
                 jax.tree.map(jnp.zeros_like, params))
        lr_vec = jnp.asarray([0.01] * 3, jnp.float32)
        mom = jnp.float32(0.937)
        do = jnp.asarray(True)

        @jax.jit
        def trivial(x):
            return x + 1.0

        def timed(fn):
            float(np.asarray(fn()))
            t0 = time.perf_counter()
            for _ in range(3):
                float(np.asarray(trivial(jnp.float32(2.0))))
            rtt = (time.perf_counter() - t0) / 3
            t0 = time.perf_counter()
            float(np.asarray(fn()))
            dt = max(time.perf_counter() - t0 - rtt, 1e-9)
            return batch * ITERS / dt

        r_fwd = timed(lambda: chain_fwd(params, bstats, db))
        r_grad = timed(lambda: chain_grad(params, bstats, db))

        def full_steps(st):
            for _ in range(ITERS):
                st, total, parts = step_fn(st, db, lr_vec, mom, do)
            return st, total

        # full step: python-loop dispatch (donated state threads through)
        st, total = full_steps(state)
        float(np.asarray(total))
        t0 = time.perf_counter()
        st, total = full_steps(st)
        float(np.asarray(total))
        dt = time.perf_counter() - t0
        r_full = batch * ITERS / dt
        print(json.dumps({"batch": batch, "fwd_loss_imgs_s": round(r_fwd, 1),
                          "fwd_bwd_imgs_s": round(r_grad, 1),
                          "full_step_imgs_s": round(r_full, 1)}))


if __name__ == "__main__":
    main()
