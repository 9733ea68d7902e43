"""Dataloading: fixed-shape padded batches with background prefetch.

TPU-native replacement for the reference loaders (ultralytics/data/build.py:37
InfiniteDataLoader, :285 build_dataloader): instead of ragged per-image label
tensors concatenated with a batch_idx column, the collate emits dense padded
arrays — img (B, S, S, 3) uint8, cls (B, G), bboxes (B, G, 4) normalized xywh,
mask_gt (B, G) — so the whole train step jits with static shapes. A thread
pool decodes/augments images concurrently (cv2 releases the GIL) and a
double-buffered queue keeps the device fed.
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def collate_detect(samples, max_gt: int = 128, mask_ratio: int = 4) -> Dict[str, np.ndarray]:
    """Stack label dicts into a fixed-shape batch. Boxes are renormalized to
    the letterboxed image (matching the reference Format transform,
    augment.py:2017). Handles optional keypoints (pose), segments->masks
    (segment, rasterized at 1/mask_ratio), and rotated 5-col boxes (obb)."""
    import cv2

    b = len(samples)
    s0 = samples[0]["img"]
    imgs = np.stack([s["img"] for s in samples])  # (B, H, W, 3) uint8 BGR
    h, w = s0.shape[:2]
    rotated = len(samples[0].get("bboxes", np.zeros((0, 4)))) and samples[0]["bboxes"].shape[1] == 5
    nb = 5 if rotated else 4
    cls = np.zeros((b, max_gt), np.float32)
    bboxes = np.zeros((b, max_gt, nb), np.float32)
    mask = np.zeros((b, max_gt), bool)
    has_kpts = samples[0].get("keypoints") is not None
    has_segs = samples[0].get("segments") is not None
    kpts = None
    masks = None
    if has_kpts:
        k = samples[0]["keypoints"].shape[1] if len(samples[0]["keypoints"]) else 17
        kpts = np.zeros((b, max_gt, k, 3), np.float32)
    if has_segs:
        mh, mw = h // mask_ratio, w // mask_ratio
        masks = np.zeros((b, max_gt, mh, mw), np.float32)

    for i, s in enumerate(samples):
        n = min(len(s["cls"]), max_gt)
        if not n:
            continue
        bx = s["bboxes"][:n]
        if rotated:
            bboxes[i, :n, 0] = bx[:, 0] / w
            bboxes[i, :n, 1] = bx[:, 1] / h
            bboxes[i, :n, 2] = bx[:, 2] / w
            bboxes[i, :n, 3] = bx[:, 3] / h
            bboxes[i, :n, 4] = bx[:, 4]
        else:
            bboxes[i, :n, 0] = (bx[:, 0] + bx[:, 2]) / 2 / w
            bboxes[i, :n, 1] = (bx[:, 1] + bx[:, 3]) / 2 / h
            bboxes[i, :n, 2] = (bx[:, 2] - bx[:, 0]) / w
            bboxes[i, :n, 3] = (bx[:, 3] - bx[:, 1]) / h
        cls[i, :n] = s["cls"][:n]
        mask[i, :n] = True
        if has_kpts and len(s.get("keypoints", [])):
            kk = s["keypoints"][:n].copy()
            kk[..., 0] /= w
            kk[..., 1] /= h
            kpts[i, :n] = kk
        if has_segs:
            # reference semantics (data/utils.py:295-363): rasterize each
            # polygon at FULL resolution, cv2.resize down by mask_ratio, then
            # resolve overlaps area-sorted (smaller instances win) and reorder
            # the instance rows to the sorted order — the validator's mask IoU
            # sees non-overlapping GT binaries exactly like the reference's
            # overlap-mask reconstruction.
            ms = np.zeros((n, mh, mw), np.float32)
            for j, poly in enumerate(s["segments"][:n]):
                if len(poly) >= 3:
                    full = np.zeros((h, w), np.uint8)
                    cv2.fillPoly(full, [np.asarray(poly, np.int32).reshape(-1, 2)], 1)
                    ms[j] = cv2.resize(full, (mw, mh))
            areas = ms.reshape(n, -1).sum(1)
            order = np.argsort(-areas, kind="stable")
            winner = np.zeros((mh, mw), np.int32)
            for rank, j in enumerate(order, start=1):
                winner[ms[j] > 0] = rank
            for rank, j in enumerate(order, start=1):
                masks[i, rank - 1] = winner == rank
            cls[i, :n] = cls[i, :n][order]
            bboxes[i, :n] = bboxes[i, :n][order]
            if kpts is not None:
                kpts[i, :n] = kpts[i, :n][order]

    out = {
        "img": imgs,
        "cls": cls,
        "bboxes": bboxes,
        "mask_gt": mask,
        "im_files": [s.get("im_file") for s in samples],
        "ori_shapes": [s.get("ori_shape") for s in samples],
        "ratio_pads": [s.get("ratio_pad") for s in samples],
    }
    if kpts is not None:
        out["keypoints"] = kpts
    if masks is not None:
        out["masks"] = masks
    return out


def collate_classify(samples) -> Dict[str, np.ndarray]:
    return {
        "img": np.stack([s["img"] for s in samples]),
        "cls": np.array([s["cls"] for s in samples], np.int64),
    }


class DataLoader:
    """Iterable over shuffled fixed-size batches with threaded prefetch.

    Drops the last partial batch when training (static shapes); for val the
    final batch is padded by repeating the last sample and a `pad_count` is
    reported so the validator can ignore the duplicates.
    """

    def __init__(self, dataset, batch_size: int = 16, shuffle: bool = False,
                 workers: int = 8, collate_fn=collate_detect, drop_last: bool = False,
                 seed: int = 0, max_gt: int = 128, infinite: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.drop_last = drop_last
        self.seed = seed
        self.max_gt = max_gt
        self.infinite = infinite
        self.epoch = 0
        if collate_fn is collate_detect:
            self.collate_fn = lambda s: collate_detect(s, max_gt=self.max_gt)
        else:
            self.collate_fn = collate_fn

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        batches = []
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            pad = 0
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    continue
                pad = self.batch_size - len(chunk)
                chunk = chunk + [chunk[-1]] * pad
            batches.append((chunk, pad))
        return batches

    def __iter__(self) -> Iterator[Dict]:
        while True:
            batches = self._index_batches()
            with ThreadPoolExecutor(max_workers=self.workers) as pool:
                # SAMPLE-level fan-out: every __getitem__ (decode + mosaic +
                # warp — cv2 releases the GIL) is its own pool task, so all
                # `workers` threads stay busy; batches assemble in order with
                # a 3-batch-deep pipeline. (Batch-level submission serialized
                # the whole aug chain inside one thread: 27 img/s measured;
                # sample-level keeps the chip fed.)
                pending = []  # [(futures, pad)]
                for chunk, pad in batches:
                    futs = [pool.submit(self.dataset.__getitem__, i) for i in chunk]
                    pending.append((futs, pad))
                    if len(pending) > 3:
                        yield self._assemble(*pending.pop(0))
                for futs, pad in pending:
                    yield self._assemble(futs, pad)
            self.epoch += 1
            if not self.infinite:
                break

    def _assemble(self, futures, pad: int = 0):
        batch = self.collate_fn([f.result() for f in futures])
        # trailing `pad` images are repeats of the last real sample so the
        # batch keeps a static shape; the validator skips them
        batch["pad_count"] = pad
        return batch

    def reset(self):
        """Rebuild transforms after close_mosaic (reference build.py:37)."""
        if hasattr(self.dataset, "close_mosaic"):
            self.dataset.close_mosaic()


# ---------------------------------------------------------------------------
# Process-pool loader: true multi-core augmentation (reference build.py:37
# InfiniteDataLoader wraps torch's multi-process workers; threads only scale
# the cv2 portion here because label building/collate hold the GIL).
# ---------------------------------------------------------------------------

_WORKER_DATASET = None


def _pool_init(dataset, seed):
    """Runs once in each worker: pin the dataset and tame cv2's own pool."""
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    try:
        import cv2

        cv2.setNumThreads(0)  # one process == one core; no nested pools
    except Exception:  # noqa: BLE001
        pass
    random.seed(seed)
    np.random.seed(seed % (2**32 - 1))


def _pool_get(i: int):
    return _WORKER_DATASET[i]


class ProcessDataLoader(DataLoader):
    """DataLoader whose augmentation chain runs in OS processes.

    The thread loader tops out when the Python parts of __getitem__ (label
    geometry, mosaic bookkeeping, collate) serialize on the GIL; processes
    scale the whole chain with cores. Workers are forked (default), so a
    RAM-cached dataset is shared copy-on-write instead of duplicated; use
    mp_context="spawn" where fork is unsafe. Results return via pickle —
    ~1 MB per 640px image; the pipe cost is why `workers=0/1` should stay on
    the thread loader (build_dataloader picks automatically).

    In-flight work is bounded by a semaphore (workers + 2*batch samples) so
    an epoch never buffers unboundedly when the consumer is slow.
    """

    def __init__(self, dataset, batch_size: int = 16, shuffle: bool = False,
                 workers: int = 8, collate_fn=collate_detect, drop_last: bool = False,
                 seed: int = 0, max_gt: int = 128, infinite: bool = False,
                 mp_context: str = "fork"):
        super().__init__(dataset, batch_size=batch_size, shuffle=shuffle,
                         workers=workers, collate_fn=collate_fn, drop_last=drop_last,
                         seed=seed, max_gt=max_gt, infinite=infinite)
        self.mp_context = mp_context
        self._pool = None

    def _ensure_pool(self):
        if self._pool is None:
            import multiprocessing as mp

            ctx = mp.get_context(self.mp_context)
            self._pool = ctx.Pool(self.workers, initializer=_pool_init,
                                  initargs=(self.dataset, self.seed))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):  # best-effort; explicit close() preferred
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass

    def reset(self):
        # close_mosaic mutates dataset state: restart workers so they see it
        super().reset()
        self.close()

    def __iter__(self) -> Iterator[Dict]:
        while True:
            pool = self._ensure_pool()
            batches = self._index_batches()
            window = threading.Semaphore(self.workers + 2 * self.batch_size)
            done = queue.Queue()

            def _feed():
                seq = 0
                for chunk, _pad in batches:
                    for i in chunk:
                        window.acquire()
                        pool.apply_async(
                            _pool_get, (i,),
                            callback=(lambda res, s=seq: (done.put((s, "ok", res)),
                                                          window.release())),
                            error_callback=(lambda e, s=seq: (done.put((s, "err", e)),
                                                              window.release())))
                        seq += 1

            feeder = threading.Thread(target=_feed, daemon=True)
            feeder.start()
            # results arrive in completion order; reorder to submission order
            # so samples land in their intended batch (val alignment + pads)
            buf: Dict[int, tuple] = {}
            next_seq = 0
            for chunk, pad in batches:
                samples = []
                for _ in chunk:
                    while next_seq not in buf:
                        s, kind, res = done.get()
                        buf[s] = (kind, res)
                    kind, res = buf.pop(next_seq)
                    next_seq += 1
                    if kind == "err":
                        raise res
                    samples.append(res)
                batch = self.collate_fn(samples)
                batch["pad_count"] = pad
                yield batch
            feeder.join()
            self.epoch += 1
            if not self.infinite:
                break


def build_dataloader(dataset, batch: int, workers: int = 8, shuffle: bool = True,
                     drop_last: bool = True, max_gt: int = 128, seed: int = 0,
                     use_processes: Optional[bool] = None):
    """Reference build_dataloader equivalent (build.py:285). Picks process
    workers when the host has cores to use them (os.cpu_count() > 2) unless
    overridden via use_processes."""
    import os

    if use_processes is None:
        use_processes = (os.cpu_count() or 1) > 2 and workers > 1
    cls = ProcessDataLoader if use_processes else DataLoader
    return cls(dataset, batch_size=batch, shuffle=shuffle, workers=workers,
               drop_last=drop_last, max_gt=max_gt, seed=seed)
