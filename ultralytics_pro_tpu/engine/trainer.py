"""Trainer: SPMD data-parallel training loop.

Behavioral parity with the reference trainer (ultralytics/engine/trainer.py:65
BaseTrainer: _do_train:355, build_optimizer:891, optimizer_step:674, EMA
torch_utils.py:606, EarlyStopping :857, warmup interp :402-413, NaN recovery
:832, save_model:579) redesigned TPU-first:

- no DDP subprocess relaunch: ONE python process, a jax.sharding.Mesh over all
  devices, batch sharded on axis 0, params replicated — the grad all-reduce is
  an XLA collective inserted by GSPMD (SURVEY.md §5.8);
- the whole step (fwd + loss + bwd + SGD + EMA) is a single jitted function
  with donated state, bf16 compute / f32 params;
- optimizer is the reference's 3-group SGD (decay weights / no-decay BN scale /
  biases with warmup_bias_lr) hand-rolled on pytrees so per-group warmup
  interpolation stays inside the compiled step;
- no GradScaler: bf16 on TPU needs no loss scaling.
"""

from __future__ import annotations

import math
import pickle
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ultralytics_pro_tpu.utils import LOGGER, TQDM, colorstr, increment_path
from ultralytics_pro_tpu.utils.callbacks import CallbackMixin, csv_logger_callbacks


def param_group(path_tuple) -> int:
    """0: decayed kernels, 1: norm scales (no decay), 2: biases (reference
    build_optimizer groups, trainer.py:891)."""
    leaf = path_tuple[-1]
    if leaf == "bias":
        return 2
    if leaf == "scale":
        return 1
    return 0


def make_group_labels(params):
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: param_group(tuple(getattr(k, "key", str(k)) for k in kp)), params
    )


class EarlyStopping:
    """Stop after `patience` epochs without fitness improvement (reference
    torch_utils.py:857)."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: Optional[float]) -> bool:
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        if stop:
            LOGGER.info(f"EarlyStopping: no improvement in last {self.patience} epochs.")
        return stop


class BaseTrainer(CallbackMixin):
    """Task-agnostic training loop; subclasses provide criterion + validator."""

    def __init__(self, model, args: Dict):
        self.model = model  # BaseModel wrapper (module + variables)
        self.args = args
        self.epochs = int(args.get("epochs", 100))
        self.batch_size = int(args.get("batch", 16))
        self.imgsz = int(args.get("imgsz", 640))
        self.save_dir = Path(args.get("save_dir") or increment_path(
            Path(args.get("project") or "runs/detect") / (args.get("name") or "train")))
        self.wdir = self.save_dir / "weights"

        # hyperparameters (cfg/default.yaml parity)
        self.lr0 = float(args.get("lr0", 0.01))
        self.lrf = float(args.get("lrf", 0.01))
        self.momentum = float(args.get("momentum", 0.937))
        self.weight_decay = float(args.get("weight_decay", 0.0005))
        self.warmup_epochs = float(args.get("warmup_epochs", 3.0))
        self.warmup_momentum = float(args.get("warmup_momentum", 0.8))
        self.warmup_bias_lr = float(args.get("warmup_bias_lr", 0.1))
        self.cos_lr = bool(args.get("cos_lr", False))
        self.nbs = int(args.get("nbs", 64))
        self.close_mosaic = int(args.get("close_mosaic", 10))
        self.ema_decay = 0.9999
        self.max_grad_norm = 10.0

        self.accumulate = max(round(self.nbs / self.batch_size), 1)
        # decay scaled by effective batch (reference trainer.py:339)
        self.weight_decay *= self.batch_size * self.accumulate / self.nbs

        self.stopper = EarlyStopping(patience=int(args.get("patience", 100)))
        self.init_callbacks()
        for event, cb in csv_logger_callbacks(self.save_dir).items():
            self.add_callback(event, cb)
        from ultralytics_pro_tpu.utils.callbacks import integration_callbacks

        for event, cbs in integration_callbacks().items():
            for cb in cbs:
                self.add_callback(event, cb)
        self.best_fitness = 0.0
        self.start_epoch = 0
        self.mesh = self._make_mesh()
        self._train_step = None

    # -- infrastructure -------------------------------------------------------
    def _make_mesh(self):
        devices = jax.devices()
        # optional cap via the `device` arg (int = max data-parallel devices);
        # virtual CPU meshes on few cores can exceed the XLA collective
        # rendezvous timeout if over-subscribed.
        cap = self.args.get("device")
        if isinstance(cap, int) and cap > 0:
            devices = devices[:cap]
        # the data axis must divide the batch; use the largest such device count
        n = len(devices)
        while n > 1 and self.batch_size % n:
            n -= 1
        if n < len(devices):
            LOGGER.info(f"data-parallel over {n}/{len(devices)} devices (batch {self.batch_size})")
        return jax.sharding.Mesh(np.array(devices[:n]), ("data",))

    def lr_lambda(self, epoch):
        """Linear or cosine decay factor (reference trainer.py:240)."""
        x = epoch / self.epochs
        if self.cos_lr:
            return ((1 - math.cos(x * math.pi)) / 2) * (self.lrf - 1) + 1
        return (1 - x) * (1.0 - self.lrf) + self.lrf

    def criterion(self):
        raise NotImplementedError

    # -- jitted step ----------------------------------------------------------
    def build_train_step(self):
        criterion = self.criterion()
        module = self.model.module
        imgsz = (self.imgsz, self.imgsz)
        momentum_final = self.momentum
        wd = self.weight_decay
        ema_base = self.ema_decay
        clip = self.max_grad_norm
        labels = None  # built lazily from params

        use_remat = bool(self.args.get("remat", False))

        def loss_fn(params, batch_stats, batch):
            img = batch["img"]
            # BGR->RGB flip is a 3-channel concept; multispectral bands keep order
            x = (img[..., ::-1] if img.shape[-1] == 3 else img).astype(jnp.float32) / 255.0
            extra = {"txt_feats": batch["prompts"]} if "prompts" in batch else {}

            def fwd(params, x):
                return module.apply(
                    {"params": params, "batch_stats": batch_stats}, x, train=True,
                    mutable=["batch_stats"], dn=batch.get("dn"), **extra,
                )

            if use_remat:
                # trade FLOPs for HBM: recompute activations in the backward
                # pass, keeping only matmul/conv outputs (`remat=True` arg;
                # lets batch sizes ~2x on memory-bound configs)
                fwd = jax.checkpoint(
                    fwd, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
            preds, updates = fwd(params, x)
            # imgsz from the batch: multi-scale resizes on device, and each
            # distinct size is its own jit specialization (a small fixed set)
            total, parts = criterion(preds, batch, (x.shape[1], x.shape[2]))
            return total, (parts, updates["batch_stats"])

        def step(state, batch, lr_vec, momentum, do_step):
            """One micro-batch: grads accumulate into `grad_buf`; the optimizer
            (clip + 3-group nesterov SGD + EMA tick) applies only when
            `do_step` is true — the reference steps every `accumulate` batches
            (trainer.py:674 optimizer_step, :402-413 warmup-interp accumulate).
            `do_step` is a traced scalar so one compiled step serves both."""
            params, batch_stats, mom_buf, ema, ema_updates, grad_buf = state
            (total, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, batch
            )
            grad_buf = jax.tree.map(jnp.add, grad_buf, grads)

            # global-norm clip at 10.0 over the ACCUMULATED grads (reference
            # optimizer_step trainer.py:674 clips at step time)
            gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grad_buf)))
            scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))

            groups = make_group_labels(params)

            def upd(p, g, m, grp, lr):
                g = g * scale + wd * p * (grp == 0)  # decay only group 0
                m_new = momentum * m + g
                u = g + momentum * m_new  # nesterov
                # where() (NOT arithmetic blending): a non-finite grad leaf
                # must not leak into params on skipped micro-steps (0*nan=nan)
                return (jnp.where(do_step, p - lr * u, p),
                        jnp.where(do_step, m_new, m))

            flat_p, treedef = jax.tree_util.tree_flatten(params)
            flat_g = jax.tree.leaves(grad_buf)
            flat_m = jax.tree.leaves(mom_buf)
            flat_grp = jax.tree.leaves(groups)
            new_p, new_m = [], []
            for p, g, m, grp in zip(flat_p, flat_g, flat_m, flat_grp):
                pn, mn = upd(p, g, m, grp, lr_vec[grp])
                new_p.append(pn)
                new_m.append(mn)
            params = jax.tree_util.tree_unflatten(treedef, new_p)
            mom_buf = jax.tree_util.tree_unflatten(treedef, new_m)
            grad_buf = jax.tree.map(lambda g: jnp.where(do_step, jnp.zeros_like(g), g), grad_buf)

            # EMA ticks only on optimizer steps, with ramp
            # d = decay * (1 - exp(-updates/2000)) (torch_utils.py:606)
            ema_updates = ema_updates + do_step.astype(jnp.int32)
            d = ema_base * (1 - jnp.exp(-ema_updates / 2000.0))
            ema = jax.tree.map(
                lambda e, p: jnp.where(do_step, e * d + (1 - d) * p, e), ema, params
            )
            return (params, new_bs, mom_buf, ema, ema_updates, grad_buf), total, parts

        data_sharding = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec("data"))
        repl = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())

        jit_step = jax.jit(step, donate_argnums=(0,))
        self._data_sharding = data_sharding
        self._repl_sharding = repl
        return jit_step

    # -- main loop ------------------------------------------------------------
    def train(self, train_loader, val_fn=None):
        """train_loader yields collated host batches; val_fn(model_with_ema) ->
        fitness float or None."""
        self.wdir.mkdir(parents=True, exist_ok=True)
        if self.model.variables is None:
            self.model.init_params(imgsz=self.imgsz)
        # resume (reference check_resume trainer.py:788 / resume_training:863)
        resume_ckpt = None
        if self.args.get("resume"):
            from ultralytics_pro_tpu.utils.files import get_latest_run

            path = self.args["resume"] if isinstance(self.args["resume"], str) else (
                str(self.wdir / "last.ckpt") if (self.wdir / "last.ckpt").exists()
                else get_latest_run(str(self.save_dir.parent))
            )
            if path:
                resume_ckpt = load_pickle(path)
                self.start_epoch = resume_ckpt["epoch"] + 1
                self.best_fitness = resume_ckpt.get("best_fitness") or 0.0
                LOGGER.info(f"resuming from {path} at epoch {self.start_epoch + 1}")
        variables = self.model.variables
        if resume_ckpt is not None:
            params = resume_ckpt["params"]
            batch_stats = resume_ckpt["batch_stats"]
            mom_buf = resume_ckpt.get("momentum_buffer") or jax.tree.map(jnp.zeros_like, params)
            ema = resume_ckpt.get("ema") or jax.tree.map(jnp.copy, params)
            ema_updates = jnp.asarray(resume_ckpt.get("ema_updates", 0), jnp.int32)
        else:
            params = variables["params"]
            batch_stats = variables["batch_stats"]
            mom_buf = jax.tree.map(jnp.zeros_like, params)
            ema = jax.tree.map(jnp.copy, params)  # real copies: donation rejects aliased buffers
            ema_updates = jnp.zeros((), jnp.int32)
        grad_buf = jax.tree.map(jnp.zeros_like, params)
        state = (params, batch_stats, mom_buf, ema, ema_updates, grad_buf)

        step_fn = self.build_train_step()
        # replicate state over the mesh so the sharded step has consistent
        # input placement (the grad all-reduce then rides the data axis)
        state = jax.device_put(state, self._repl_sharding)
        nb = len(train_loader)
        # warmup iters (reference trainer.py:396): 100-iter floor, but
        # warmup_epochs=0 disables warmup entirely (nw=-1)
        nw = max(round(self.warmup_epochs * nb), 100) if self.warmup_epochs > 0 else -1
        last_opt_step = -1

        LOGGER.info(colorstr("green", "bold", f"Starting training for {self.epochs} epochs..."))
        self.run_callbacks("on_train_start")
        t0 = time.time()
        ni = 0
        self.opt_steps = 0  # optimizer steps actually applied (grad accumulation)
        self.loss_history = []  # per-epoch mean loss dicts
        for epoch in range(self.start_epoch, self.epochs):
            self._epoch = epoch
            self.run_callbacks("on_train_epoch_start")
            if epoch == self.epochs - self.close_mosaic:
                LOGGER.info("Closing dataloader mosaic")
                train_loader.reset()

            lf = self.lr_lambda(epoch)
            losses_sum = {}
            pbar = TQDM(enumerate(train_loader), total=nb, desc=f"epoch {epoch + 1}/{self.epochs}")
            for i, batch in pbar:
                ni = i + nb * epoch
                # warmup interpolation (reference trainer.py:402-413): lr,
                # momentum, AND accumulate ramp from [1 .. nbs/batch]
                if ni <= nw:
                    xi = [0, nw]
                    accumulate = max(1, round(np.interp(ni, xi, [1, self.nbs / self.batch_size])))
                    lr_by_group = [
                        float(np.interp(ni, xi, [0.0, self.lr0 * lf])),
                        float(np.interp(ni, xi, [0.0, self.lr0 * lf])),
                        float(np.interp(ni, xi, [self.warmup_bias_lr, self.lr0 * lf])),
                    ]
                    momentum = float(np.interp(ni, xi, [self.warmup_momentum, self.momentum]))
                else:
                    accumulate = self.accumulate
                    lr = self.lr0 * lf
                    lr_by_group = [lr, lr, lr]
                    momentum = self.momentum
                do_step = ni - last_opt_step >= accumulate
                if do_step:
                    last_opt_step = ni
                    self.opt_steps += 1

                # multi-scale: random imgsz in [0.5, 1.5]x rounded to stride,
                # resized ON DEVICE after transfer (reference detect/train.py:120)
                device_batch = self.put_batch(batch)
                if self.args.get("multi_scale"):
                    device_batch = self._multi_scale(device_batch, ni)
                state, total, parts = step_fn(
                    state, device_batch, jnp.asarray(lr_by_group, jnp.float32),
                    jnp.float32(momentum), jnp.asarray(do_step),
                )
                for k, v in parts.items():
                    losses_sum[k] = losses_sum.get(k, 0.0) + float(v)
                if i % 10 == 0:
                    desc = " ".join(f"{k} {losses_sum[k] / (i + 1):.3f}" for k in sorted(losses_sum))
                    pbar.set_description(f"epoch {epoch + 1}/{self.epochs} {desc}")

            self.epoch_losses = {k: v / nb for k, v in losses_sum.items()}
            self.loss_history.append(dict(self.epoch_losses))

            # NaN recovery (reference _handle_nan_recovery trainer.py:832):
            # reload last good checkpoint, up to 3 attempts
            if any(not np.isfinite(v) for v in self.epoch_losses.values()):
                self._nan_attempts = getattr(self, "_nan_attempts", 0) + 1
                ckpt_path = self.wdir / "last.ckpt"
                if self._nan_attempts > 3 or not ckpt_path.exists():
                    raise FloatingPointError(
                        f"non-finite loss {self.epoch_losses} (attempt {self._nan_attempts}); aborting"
                    )
                LOGGER.info(f"non-finite loss; restoring {ckpt_path} (attempt {self._nan_attempts}/3)")
                ck = load_pickle(ckpt_path)
                state = jax.device_put(
                    (ck["params"], ck["batch_stats"], ck["momentum_buffer"], ck["ema"],
                     jnp.asarray(ck.get("ema_updates", 0), jnp.int32),
                     jax.tree.map(lambda p: jnp.zeros_like(jnp.asarray(p)), ck["params"])),
                    self._repl_sharding,
                )
                continue

            # validation with EMA weights
            params, batch_stats, mom_buf, ema, ema_updates, _grad_buf = state
            self.model.variables = {"params": jax.device_get(ema), "batch_stats": jax.device_get(batch_stats)}
            fitness = val_fn(self.model) if val_fn is not None else None
            self.last_fitness = fitness
            self.run_callbacks("on_fit_epoch_end")

            self.save_checkpoint(state, epoch, fitness)
            if self.stopper(epoch, fitness):
                break
            # timed stop (reference trainer.py:434: `time` arg in hours)
            if self.args.get("time") and (time.time() - t0) / 3600 > float(self.args["time"]):
                LOGGER.info(f"time limit {self.args['time']}h reached; stopping")
                break
            LOGGER.info(
                f"epoch {epoch + 1}: " + " ".join(f"{k}={v:.4f}" for k, v in self.epoch_losses.items())
                + (f" fitness={fitness:.4f}" if fitness is not None else "")
            )

        self.run_callbacks("on_train_end")
        LOGGER.info(f"training complete in {(time.time() - t0) / 3600:.3f} hours; results in {self.save_dir}")
        # leave the EMA weights on the model
        params, batch_stats, mom_buf, ema = state[:4]
        self.model.variables = {"params": jax.device_get(ema), "batch_stats": jax.device_get(batch_stats)}
        return self.model

    def _multi_scale(self, device_batch: Dict, ni: int) -> Dict:
        """Random-size resize ON DEVICE spanning the reference's full
        [0.5, 1.5] range (detect/train.py:120 picks any stride multiple; a
        7-rung ladder keeps jit specializations bounded while matching the
        augmentation strength)."""
        import random

        ladder = sorted({max(32, round(self.imgsz * f / 32) * 32)
                         for f in (0.5, 0.667, 0.833, 1.0, 1.167, 1.333, 1.5)})
        sz = random.Random(ni).choice(ladder)
        img = device_batch["img"]
        if sz != img.shape[1]:
            b, h, w, c = img.shape
            img = jax.image.resize(img.astype(jnp.float32), (b, sz, sz, c), method="bilinear")
            device_batch = {**device_batch, "img": img.astype(jnp.uint8)}
        return device_batch

    def host_preprocess_batch(self, batch: Dict) -> Dict:
        """Per-step host-side batch hook (e.g. RT-DETR CDN query synthesis)."""
        return batch

    def put_batch(self, batch: Dict) -> Dict:
        """Host batch -> device arrays sharded over the data axis."""
        batch = self.host_preprocess_batch(batch)
        out = {}
        for k in ("img", "cls", "bboxes", "mask_gt", "masks", "keypoints"):
            if k in batch and isinstance(batch[k], np.ndarray):
                out[k] = jax.device_put(batch[k], self._data_sharding)
        if "dn" in batch:
            out["dn"] = {k: jax.device_put(v, self._data_sharding)
                         for k, v in batch["dn"].items()}
        if "prompts" in batch:
            # prompts are pre-broadcast to (B, ...) by the attaching trainer,
            # so they shard over the data axis like any other batch leaf.
            # YOLOE passes a dict {tpe, vp, vpe}; world passes the raw
            # (B, T, 512) text-feature array.
            p = batch["prompts"]
            out["prompts"] = (
                {k: jax.device_put(np.asarray(v), self._data_sharding) for k, v in p.items()}
                if isinstance(p, dict)
                else jax.device_put(np.asarray(p), self._data_sharding))
        return out

    # -- checkpointing (reference save_model trainer.py:579) -------------------
    def save_checkpoint(self, state, epoch: int, fitness: Optional[float]):
        params, batch_stats, mom_buf, ema, ema_updates = state[:5]
        ckpt = {
            "epoch": epoch,
            "best_fitness": self.best_fitness,
            "fitness": fitness,
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
            "ema": jax.device_get(ema),
            "ema_updates": int(jax.device_get(ema_updates)),
            "momentum_buffer": jax.device_get(mom_buf),
            "train_args": {k: v for k, v in self.args.items() if isinstance(v, (int, float, str, bool, type(None)))},
            "model_yaml": self.model.yaml if isinstance(self.model.yaml, dict) else None,
            "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        # provenance (reference trainer.py:599-604 embeds the package repo's
        # git state, not the caller's cwd)
        from ultralytics_pro_tpu.utils.git import GIT

        ckpt.update(GIT(Path(__file__).parent).as_dict())
        if str(self.args.get("ckpt_format", "pickle")) == "orbax":
            # production multi-host path (SURVEY §5.4): Orbax writes each
            # array shard from its owning host — required on real pods where
            # no single host holds the full state
            self._save_orbax(self.wdir / "last.orbax", ckpt)
            if fitness is not None and fitness >= self.best_fitness:
                self.best_fitness = fitness
                self._save_orbax(self.wdir / "best.orbax", ckpt)
            return
        save_pickle(self.wdir / "last.ckpt", ckpt)
        if fitness is not None and fitness >= self.best_fitness:
            self.best_fitness = fitness
            save_pickle(self.wdir / "best.ckpt", ckpt)
        sp = int(self.args.get("save_period") or -1)
        if sp > 0 and (epoch + 1) % sp == 0:
            save_pickle(self.wdir / f"epoch{epoch + 1}.ckpt", ckpt)

    def _save_orbax(self, path, ckpt):
        import orbax.checkpoint as ocp

        trees = {k: ckpt[k] for k in ("params", "batch_stats", "ema", "momentum_buffer")}
        meta = {k: v for k, v in ckpt.items()
                if k not in trees and isinstance(v, (int, float, str, bool, dict, type(None)))}
        path = Path(path).resolve()
        if path.exists():
            import shutil

            shutil.rmtree(path)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path / "state", trees)
        import json as _json

        (path / "meta.json").write_text(_json.dumps(meta, default=str))

    @staticmethod
    def load_orbax(path):
        """Restore an Orbax checkpoint dir written by _save_orbax."""
        import json as _json

        import orbax.checkpoint as ocp

        path = Path(path).resolve()
        with ocp.StandardCheckpointer() as ckptr:
            trees = ckptr.restore(path / "state")
        meta = _json.loads((path / "meta.json").read_text())
        return {**meta, **trees}

    def resume_from(self, ckpt_path):
        ckpt = load_pickle(ckpt_path)
        self.model.variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
        self.start_epoch = ckpt["epoch"] + 1
        self.best_fitness = ckpt.get("best_fitness", 0.0)
        return ckpt


def save_pickle(path, obj):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # materialize device arrays only; leave python/yaml metadata untouched
    obj = jax.tree.map(lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, obj)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


class DetectionTrainer(BaseTrainer):
    """Detect-task trainer (reference models/yolo/detect/train.py:24)."""

    def criterion(self):
        from ultralytics_pro_tpu.utils.loss import E2EDetectLoss, v8DetectionLoss

        head = self.model._head_spec()
        if head is not None and head.type_name == "AnchorDetect":
            from ultralytics_pro_tpu.utils.loss import v5AnchorLoss

            kw = dict(head.kwargs)
            # v5/v7 anchor-based lineage uses its own gain scale (box=0.05 CIoU,
            # obj=1.0 BCE) — the v8 default box=7.5 from default.yaml would
            # overweight the box term ~150x (ADVICE r2, high). Only honour the
            # shared "box"/"cls" keys when the user actually overrode them.
            box = self.args.get("box", 7.5)
            cls = self.args.get("cls", 0.5)
            return v5AnchorLoss(
                nc=self.model.nc, anchors=kw["anchors"], strides=self.model.stride,
                hyp={"box": 0.05 if box == 7.5 else box, "cls": cls,
                     "obj": self.args.get("obj", 1.0)},
            )
        if head is not None and head.type_name == "v10Detect":
            return E2EDetectLoss(
                nc=self.model.nc, reg_max=16, strides=self.model.stride,
                hyp={"box": self.args.get("box", 7.5), "cls": self.args.get("cls", 0.5),
                     "dfl": self.args.get("dfl", 1.5)},
            )
        return v8DetectionLoss(
            nc=self.model.nc, reg_max=16, strides=self.model.stride,
            hyp={"box": self.args.get("box", 7.5), "cls": self.args.get("cls", 0.5),
                 "dfl": self.args.get("dfl", 1.5)},
        )


class WorldTrainer(DetectionTrainer):
    """Open-vocabulary (grounding/multimodal) world training (reference
    models/yolo/world/train_world.py:196 + RandomLoadText augment.py:2326):
    every batch re-samples a fixed-size text vocabulary — the batch's positive
    class names plus random negatives — remaps labels into it, and embeds it
    with the text tower as the guide stream. Deviation from the reference
    (documented): sampling is per-BATCH rather than per-image so the text
    tensor keeps one static (B, T, 512) shape under jit.
    """

    def __init__(self, model, args, class_texts=None, max_texts: int = 32):
        super().__init__(model, args)
        names = getattr(model, "names", None) or {}
        self.class_texts = list(class_texts) if class_texts else \
            [str(names.get(i, f"object{i}")) for i in range(model.nc)]
        self.max_texts = int(max_texts)
        self._text_cache = {}

    def _embed(self, texts):
        from ultralytics_pro_tpu.nn.modules.world import encode_text

        key = tuple(texts)
        if key not in self._text_cache:
            if len(self._text_cache) > 256:
                self._text_cache.clear()
            self._text_cache[key] = encode_text(list(texts))
        return self._text_cache[key]

    def host_preprocess_batch(self, batch):
        cls = np.asarray(batch["cls"], np.float32)
        mask = np.asarray(batch.get("mask_gt", np.ones(cls.shape[:2], bool)))
        pos = sorted({int(c) for c in cls[mask].reshape(-1)})[: self.max_texts]
        pool = [i for i in range(len(self.class_texts)) if i not in pos]
        rng = np.random.default_rng(None)
        neg = list(rng.permutation(pool)[: max(self.max_texts - len(pos), 0)])
        chosen = pos + [int(i) for i in neg]
        # classes beyond the text budget are DROPPED (masked), never silently
        # remapped to another class
        remap = np.full(max(len(self.class_texts), 1), -1.0, np.float32)
        for new, old in enumerate(chosen):
            remap[old] = new
        batch = dict(batch)
        mapped = remap[cls.astype(np.int64).clip(0, len(remap) - 1)].reshape(cls.shape)
        batch["mask_gt"] = mask & (mapped >= 0)
        batch["cls"] = np.maximum(mapped, 0.0)
        texts = [self.class_texts[i] for i in chosen]
        texts += [" "] * (self.max_texts - len(texts))
        tf = self._embed(texts)  # (T, 512)
        b = cls.shape[0]
        batch["prompts"] = np.broadcast_to(tf[None], (b, *tf.shape)).copy()
        return batch

    def criterion(self):
        from ultralytics_pro_tpu.utils.loss import v8DetectionLoss

        # classification logits span the sampled text budget, not model.nc
        return v8DetectionLoss(
            nc=self.max_texts, reg_max=16, strides=self.model.stride,
            hyp={"box": self.args.get("box", 7.5), "cls": self.args.get("cls", 0.5),
                 "dfl": self.args.get("dfl", 1.5)},
        )


class SegmentationTrainer(BaseTrainer):
    def criterion(self):
        from ultralytics_pro_tpu.utils.loss import v8SegmentationLoss

        return v8SegmentationLoss(
            nc=self.model.nc, reg_max=16, strides=self.model.stride,
            hyp={"box": self.args.get("box", 7.5), "cls": self.args.get("cls", 0.5),
                 "dfl": self.args.get("dfl", 1.5)},
            overlap_mask=self.args.get("overlap_mask", True),
        )


class _ClassifyCriterion:
    """Adapter: cross-entropy over (logits, batch['cls']) with the uniform
    criterion(preds, batch, imgsz) interface."""

    def __call__(self, preds, batch, imgsz_hw):
        import jax

        logp = jax.nn.log_softmax(preds, axis=-1)
        labels = batch["cls"].astype(jnp.int32)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
        return nll * preds.shape[0], {"cls": nll}


class ClassificationTrainer(BaseTrainer):
    """Classify-task trainer (reference models/yolo/classify/train.py:202)."""

    def criterion(self):
        return _ClassifyCriterion()

    def put_batch(self, batch):
        out = {}
        for k in ("img", "cls"):
            if k in batch and isinstance(batch[k], np.ndarray):
                out[k] = jax.device_put(batch[k], self._data_sharding)
        return out


class PoseTrainer(BaseTrainer):
    """Pose-task trainer (reference models/yolo/pose/train.py:116)."""

    def criterion(self):
        from ultralytics_pro_tpu.utils.loss import v8PoseLoss

        head = self.model._head_spec()
        kpt_shape = dict(head.kwargs).get("kpt_shape", (17, 3))
        return v8PoseLoss(
            nc=self.model.nc, reg_max=16, strides=self.model.stride,
            hyp={"box": self.args.get("box", 7.5), "cls": self.args.get("cls", 0.5),
                 "dfl": self.args.get("dfl", 1.5), "pose": self.args.get("pose", 12.0),
                 "kobj": self.args.get("kobj", 1.0)},
            kpt_shape=kpt_shape,
        )


class OBBTrainer(BaseTrainer):
    """OBB-task trainer (reference models/yolo/obb/train.py:79)."""

    def criterion(self):
        from ultralytics_pro_tpu.utils.loss import v8OBBLoss

        return v8OBBLoss(
            nc=self.model.nc, reg_max=16, strides=self.model.stride,
            hyp={"box": self.args.get("box", 7.5), "cls": self.args.get("cls", 0.5),
                 "dfl": self.args.get("dfl", 1.5)},
        )


def make_visual_prompts(bboxes: np.ndarray, cls: np.ndarray, mask_gt: np.ndarray,
                        imgsz_hw, nc: int, scale: float = 1 / 8) -> np.ndarray:
    """Per-class binary prompt masks at P3 resolution (reference
    LoadVisualPrompt, data/augment.py:2231). Static-shape variant: one mask
    slot per class index (Q = nc) instead of unique-class compaction — the
    reference requires continuous class indices anyway, and fixed Q keeps the
    train step single-compile.

    bboxes (B, G, 4) normalized xywh; cls (B, G); mask_gt (B, G) bool.
    Returns (B, nc, h, w) float32."""
    b, g = cls.shape[:2]
    h = int(imgsz_hw[0] * scale)
    w = int(imgsz_hw[1] * scale)
    out = np.zeros((b, nc, h, w), np.float32)
    for i in range(b):
        for j in range(g):
            if not mask_gt[i, j]:
                continue
            cx, cy, bw, bh = bboxes[i, j, :4]
            x1 = int(np.floor((cx - bw / 2) * w))
            x2 = int(np.ceil((cx + bw / 2) * w))
            y1 = int(np.floor((cy - bh / 2) * h))
            y2 = int(np.ceil((cy + bh / 2) * h))
            c = int(cls[i, j])
            out[i, c, max(y1, 0):max(y2, 0), max(x1, 0):max(x2, 0)] = 1.0
    return out


class YOLOETrainer(DetectionTrainer):
    """YOLOE text-prompt training (reference models/yolo/yoloe/train.py): the
    dataset's class names become the text vocabulary; loss is the standard
    v8 criterion over the contrastive class logits."""

    def put_batch(self, batch):
        out = super().put_batch(batch)
        if "prompts" in out:  # a subclass hook already attached richer prompts
            return out
        b = batch["img"].shape[0]
        prompts = self.model._batched_prompts(b)
        if prompts is not None:
            out["prompts"] = {k: jax.device_put(np.asarray(v), self._data_sharding)
                              for k, v in prompts.items()}
        return out


class YOLOEVPTrainer(YOLOETrainer):
    """YOLOE text+visual-prompt training (reference yoloe train w/ visual
    prompts + TVPDetectLoss loss.py:1018): per-class box-union masks ride the
    batch; the head emits [box | text cls | vp cls] and only the vp slice
    trains."""

    def criterion(self):
        from ultralytics_pro_tpu.utils.loss import TVPDetectLoss

        nc = self.model.nc
        return TVPDetectLoss(
            nc_text=nc, vnc=nc, reg_max=16, strides=self.model.stride,
            hyp={"box": self.args.get("box", 7.5), "cls": self.args.get("cls", 0.5),
                 "dfl": self.args.get("dfl", 1.5)},
        )

    def host_preprocess_batch(self, batch):
        h, w = batch["img"].shape[1:3]
        vp = make_visual_prompts(batch["bboxes"], batch["cls"], batch["mask_gt"],
                                 (h, w), self.model.nc)
        tpe = np.asarray(self.model.prompts["tpe"], np.float32)
        batch["prompts"] = {
            "tpe": np.broadcast_to(tpe, (vp.shape[0], *tpe.shape[1:])),
            "vp": vp,
        }
        return batch
