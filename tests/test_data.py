"""Data pipeline tests: COCO JSON parsing, polygon/RLE rasterization,
transforms (static-shape buckets), and the grouped loader."""

import json
import os

import numpy as np
import cv2
import pytest

from sipmask_tpu.config import DataConfig
from sipmask_tpu.data.coco import (CocoDataset, rasterize_polygons,
                                   decode_rle_counts)
from sipmask_tpu.data.transforms import (TrainTransform, TestTransform,
                                         imrescale_size)
from sipmask_tpu.data.loader import build_train_loader, build_test_loader


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    sizes = [(120, 160), (160, 120), (100, 140)]  # (h, w)
    for i, (h, w) in enumerate(sizes):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append(dict(id=i + 1, file_name=f"{i}.jpg", width=w, height=h))
        for _ in range(2):
            x, y = rng.randint(5, w // 2), rng.randint(5, h // 2)
            bw, bh = rng.randint(10, w // 2), rng.randint(10, h // 2)
            poly = [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
            annotations.append(dict(
                id=aid, image_id=i + 1, category_id=[1, 18][aid % 2],
                bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0,
                segmentation=[poly]))
            aid += 1
    categories = [dict(id=1, name="person"), dict(id=18, name="dog")]
    ann = dict(images=images, annotations=annotations, categories=categories)
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir)


class TestCoco:
    def test_parse_and_labels(self, tiny_coco):
        ds = CocoDataset(*tiny_coco, min_size=1)
        assert len(ds) == 3
        boxes, labels, masks = ds.get_ann(0)
        assert boxes.shape[1] == 4 and len(labels) == 2
        assert set(labels).issubset({1, 2})  # contiguous ids
        assert masks.shape[0] == 2
        # mask roughly fills the box
        x1, y1, x2, y2 = boxes[0].astype(int)
        assert masks[0, (y1 + y2) // 2, (x1 + x2) // 2] == 1
        assert masks[0].sum() >= 0.8 * (x2 - x1) * (y2 - y1)

    def test_rle_roundtrip_uncompressed(self):
        m = np.zeros((7, 9), np.uint8)
        m[2:5, 3:6] = 1
        # build column-major runs
        flat = m.T.reshape(-1)
        runs, last, cnt = [], 0, 0
        for v in flat:
            if v == last:
                cnt += 1
            else:
                runs.append(cnt)
                last, cnt = v, 1
        runs.append(cnt)
        out = decode_rle_counts(runs, 7, 9)
        np.testing.assert_array_equal(out, m)

    def test_polygon_raster_triangle(self):
        m = rasterize_polygons([[0, 0, 10, 0, 0, 10]], 12, 12)
        assert m[1, 1] == 1 and m[11, 11] == 0


class TestTransforms:
    def test_keep_ratio_size(self):
        assert imrescale_size(480, 640, (1333, 800)) == (800, 1067)
        h, w = imrescale_size(640, 480, (1333, 800))
        assert (h, w) == (1067, 800)

    def test_train_transform_buckets(self, tiny_coco):
        ds = CocoDataset(*tiny_coco, min_size=1)
        cfg = DataConfig(img_scale=(160, 96), max_gts=8)
        tf = TrainTransform(cfg, seed=0)
        s = tf(ds.load_image(0), *ds.get_ann(0), image_id=1)
        assert s.image.shape == (96, 160, 3)  # landscape bucket, div 32
        assert s.gt_bboxes.shape == (8, 4)
        assert s.gt_masks.shape == (8, 48, 80)
        assert s.gt_labels[2:].sum() == 0  # padded
        # boxes stay inside resized shape
        oh, ow = s.img_shape
        assert s.gt_bboxes[:, 2].max() <= ow
        assert s.gt_bboxes[:, 3].max() <= oh
        # portrait image -> portrait bucket
        s2 = tf(ds.load_image(1), *ds.get_ann(1), image_id=2)
        assert s2.image.shape == (160, 96, 3)

    def test_mask_box_consistency(self, tiny_coco):
        """gt mask (stride-2) must lie roughly inside gt box / 2."""
        ds = CocoDataset(*tiny_coco, min_size=1)
        cfg = DataConfig(img_scale=(160, 96), max_gts=8, flip_ratio=0.0)
        tf = TrainTransform(cfg, seed=3)
        s = tf(ds.load_image(0), *ds.get_ann(0), image_id=1)
        for i in range(2):
            ys, xs = np.where(s.gt_masks[i])
            if not len(ys):
                continue
            x1, y1, x2, y2 = s.gt_bboxes[i] / 2
            assert xs.min() >= x1 - 2 and xs.max() <= x2 + 2
            assert ys.min() >= y1 - 2 and ys.max() <= y2 + 2


    def test_train_size_stretch_vs_fixed_size(self, tiny_coco):
        """RT semantics: train at train_size (576-style stretch), test at
        fixed_size; a plain fixed_size override (no train_size) controls
        BOTH train and test (regression: train once misread img_scale as
        the train shape, breaking data.fixed_size overrides)."""
        from sipmask_tpu.data.transforms import TestTransform
        ds = CocoDataset(*tiny_coco, min_size=1)
        # RT-style: fixed_size 64, train_size 96
        cfg = DataConfig(fixed_size=(64, 64), train_size=(96, 96), max_gts=8)
        tr, te = TrainTransform(cfg, seed=0), TestTransform(cfg)
        s = tr(ds.load_image(0), *ds.get_ann(0), image_id=1)
        assert s.image.shape == (96, 96, 3)
        assert s.gt_masks.shape[1:] == (48, 48)
        assert te(ds.load_image(0)).image.shape == (64, 64, 3)
        # plain fixed_size (the documented --cfg-options override path)
        cfg2 = DataConfig(fixed_size=(64, 64), img_scale=(1333, 800),
                          max_gts=8)
        tr2, te2 = TrainTransform(cfg2, seed=0), TestTransform(cfg2)
        assert tr2(ds.load_image(0), *ds.get_ann(0)).image.shape == (64, 64, 3)
        assert te2(ds.load_image(0)).image.shape == (64, 64, 3)

    def test_vis_pair_image_matches_bucket(self, tiny_coco):
        """VISPairTransform image canvas and bucket_shape must agree under
        fixed_size/train_size (regression: bucket once returned the train
        stretch while the image resized to fixed_size)."""
        from sipmask_tpu.data.transforms import VISPairTransform
        ds = CocoDataset(*tiny_coco, min_size=1)
        for kw in (dict(fixed_size=(64, 64)),
                   dict(fixed_size=(64, 64), train_size=(96, 96))):
            cfg = DataConfig(max_gts=8, **kw)
            tf = VISPairTransform(cfg, seed=0)
            img = ds.load_image(0)
            boxes, labels, masks = ds.get_ann(0)
            pair = dict(img=img, ref_img=img, boxes=boxes, labels=labels,
                        masks=masks, ref_boxes=boxes, ref_labels=labels,
                        gt_pids=np.arange(1, len(boxes) + 1))
            out = tf(pair)
            ph, pw = tf.bucket_shape(True)
            assert out["image"].shape == (ph, pw, 3)
            assert out["ref_image"].shape == (ph, pw, 3)


    def test_ssd_augs_run(self, tiny_coco):
        ds = CocoDataset(*tiny_coco, min_size=1)
        cfg = DataConfig(fixed_size=(64, 64), img_scale=(64, 64),
                         ssd_augs=True, max_gts=8)
        tf = TrainTransform(cfg, seed=1)
        for i in range(3):
            s = tf(ds.load_image(i), *ds.get_ann(i), image_id=i)
            assert s.image.shape == (64, 64, 3)
            assert np.isfinite(s.image).all()
            n = int((s.gt_labels > 0).sum())
            assert n >= 1


class TestLoader:
    def test_train_loader_batches(self, tiny_coco):
        ds = CocoDataset(*tiny_coco, min_size=1)
        cfg = DataConfig(img_scale=(160, 96), max_gts=8)
        it, steps = build_train_loader(ds, TrainTransform(cfg, 0),
                                       batch_size=2, num_workers=2)
        assert steps >= 1
        b = next(it)
        assert b["images"].shape[0] == 2
        # aspect-grouped: all images in a batch share a bucket shape
        assert b["images"].shape[1:] in ((96, 160, 3), (160, 96, 3))
        assert b["gt_masks"].dtype == np.uint8

    def test_test_loader_covers_all(self, tiny_coco):
        ds = CocoDataset(*tiny_coco, min_size=1, test_mode=True)
        cfg = DataConfig(img_scale=(160, 96))
        seen = set()
        for batch, n_valid in build_test_loader(ds, TestTransform(cfg),
                                                batch_size=2, num_workers=2):
            seen.update(batch["image_ids"][:n_valid].tolist())
        assert seen == {1, 2, 3}


class TestCorruptions:
    def test_all_corruptions_run_and_preserve_shape(self):
        from sipmask_tpu.data.corruptions import (CORRUPTIONS,
                                                  EXTRA_CORRUPTIONS, corrupt)
        rng = np.random.RandomState(0)
        img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
        for name in list(CORRUPTIONS) + list(EXTRA_CORRUPTIONS):
            out = corrupt(img, name, 3)
            assert out.shape == img.shape and out.dtype == np.uint8, name
            assert not np.array_equal(out, img), f"{name} was a no-op"

    def test_severity_monotone_distortion(self):
        # higher severity should distort more (L1 from clean), at least
        # for the deterministic digital corruptions
        from sipmask_tpu.data.corruptions import corrupt
        rng = np.random.RandomState(1)
        img = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
        for name in ("contrast", "pixelate", "defocus_blur"):
            d1 = np.abs(corrupt(img, name, 1).astype(int) - img).mean()
            d5 = np.abs(corrupt(img, name, 5).astype(int) - img).mean()
            assert d5 > d1, (name, d1, d5)

    def test_unknown_corruption_raises(self):
        from sipmask_tpu.data.corruptions import corrupt
        img = np.zeros((8, 8, 3), np.uint8)
        try:
            corrupt(img, "not_a_corruption", 3)
            assert False
        except KeyError as e:
            assert "not_a_corruption" in str(e)


class TestMultiScaleTrain:
    def test_scales_sampled_and_bucket_covers_largest(self):
        import dataclasses
        from sipmask_tpu.config import DataConfig
        from sipmask_tpu.data.transforms import TrainTransform
        cfg = DataConfig(img_scale=(160, 96),
                         ms_scales=((160, 96), (200, 128)), max_gts=4)
        t = TrainTransform(cfg, seed=0)
        assert t.bucket_shape(True) == (128, 224)  # padded largest scale
        rng = np.random.RandomState(0)
        img = (rng.rand(100, 150, 3) * 255).astype(np.uint8)
        boxes = np.array([[10, 10, 60, 60]], np.float32)
        labels = np.array([1], np.int32)
        masks = np.zeros((1, 100, 150), np.uint8)
        masks[0, 10:60, 10:60] = 1
        shapes = set()
        for _ in range(20):
            s = t(img, boxes, labels, masks)
            assert s.image.shape == (128, 224, 3)  # static bucket
            shapes.add(tuple(s.img_shape.astype(int)))
        assert len(shapes) >= 2  # both scales seen


class TestProcessWorkers:
    """num_worker_procs > 0: REAL worker processes (the reference's
    workers_per_gpu analog) — spawn context, per-worker reseeded aug rng."""

    def test_train_loader_with_process_workers(self, tiny_coco):
        from sipmask_tpu.data.loader import build_train_loader
        ds = CocoDataset(*tiny_coco, min_size=1)
        cfg = DataConfig(img_scale=(160, 96), max_gts=8)
        tf = TrainTransform(cfg, seed=0)
        it, spe = build_train_loader(ds, tf, batch_size=2, seed=0,
                                     num_worker_procs=2)
        for _ in range(2):
            b = next(it)
            assert b["images"].shape[0] == 2
            assert b["images"].shape[3] == 3
            assert np.isfinite(b["images"]).all()
            assert b["gt_bboxes"].shape == (2, 8, 4)
        assert spe >= 1
