"""ProcessDataLoader: multi-core augmentation workers (SURVEY §2.6; the
process analog of the reference's torch DataLoader workers, build.py:37)."""

import numpy as np
import pytest

from ultralytics_pro_tpu.data.build import (DataLoader, ProcessDataLoader,
                                            build_dataloader)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import yaml

    from ultralytics_pro_tpu.data.dataset import YOLODataset
    from ultralytics_pro_tpu.data.synth import make_synth_dataset

    root = tmp_path_factory.mktemp("procload")
    data_yaml = make_synth_dataset(str(root), n_images=12, imgsz=96, nc=8,
                                   seed=3, max_objects=5)
    d = yaml.safe_load(open(data_yaml))
    d["names"] = {int(k): v for k, v in d["names"].items()}
    import os

    return YOLODataset(os.path.join(str(root), "images/train"), imgsz=96,
                       augment=False, hyp={}, data=d, task="detect")


def test_process_loader_matches_thread_loader(dataset):
    """augment=False makes __getitem__ deterministic: both loaders must
    produce identical batches in identical order."""
    kw = dict(batch_size=4, shuffle=True, seed=11, drop_last=True, max_gt=16)
    ref_batches = list(DataLoader(dataset, workers=2, **kw))
    loader = ProcessDataLoader(dataset, workers=2, **kw)
    try:
        got_batches = list(loader)
    finally:
        loader.close()
    assert len(got_batches) == len(ref_batches) == 3
    for got, ref in zip(got_batches, ref_batches):
        for k in ("img", "cls", "bboxes", "mask_gt"):
            np.testing.assert_array_equal(got[k], ref[k], err_msg=k)
        assert got["im_files"] == ref["im_files"]
        assert got["pad_count"] == ref["pad_count"]


def test_process_loader_multiple_epochs_and_padding(dataset):
    loader = ProcessDataLoader(dataset, batch_size=5, shuffle=False,
                               workers=2, drop_last=False, max_gt=16)
    try:
        for _ in range(2):  # pool persists across epochs
            batches = list(loader)
            assert len(batches) == 3
            assert batches[-1]["pad_count"] == 3  # 12 imgs -> 5+5+2(+3 pad)
            assert batches[-1]["img"].shape[0] == 5
    finally:
        loader.close()


def test_process_loader_worker_error_propagates(dataset):
    loader = ProcessDataLoader(dataset, batch_size=4, workers=2, max_gt=16)

    class Boom(Exception):
        pass

    # out-of-range index raises inside the worker; must surface in parent
    loader._index_batches = lambda: [([0, 1, 10**9, 3], 0)]
    try:
        with pytest.raises(Exception):
            list(loader)
    finally:
        loader.close()


def test_build_dataloader_picks_by_core_count(dataset):
    dl = build_dataloader(dataset, batch=4, workers=4, use_processes=True)
    assert isinstance(dl, ProcessDataLoader)
    dl.close()
    dl = build_dataloader(dataset, batch=4, workers=4, use_processes=False)
    assert type(dl) is DataLoader
