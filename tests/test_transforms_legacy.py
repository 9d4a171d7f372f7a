"""Legacy single-image transform tests."""

import numpy as np
import pytest
from PIL import Image

from agrl_tpu.data.transforms_legacy import (
    ElasticTransform,
    MisAlignAugment,
    Random2DTranslation,
    RandomErasing,
    RandomPoseAugmentation,
    RectScale,
    ToRange255,
    ToSpaceBGR,
)


def pil_image(h=64, w=32, seed=0):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))


def test_to_space_bgr():
    chw = np.arange(12).reshape(3, 2, 2).astype(np.float32)
    out = ToSpaceBGR(True)(chw)
    np.testing.assert_array_equal(out[0], chw[2])
    np.testing.assert_array_equal(out[2], chw[0])
    np.testing.assert_array_equal(ToSpaceBGR(False)(chw), chw)


def test_to_range_255():
    t = np.full((3, 2, 2), 0.5, np.float32)
    assert (ToRange255(True)(t) == 127.5).all()
    assert (ToRange255(False)(t) == 0.5).all()


def test_random_2d_translation_shapes():
    img = pil_image(100, 50)
    out = Random2DTranslation(64, 32, p=1.0, rng=np.random.RandomState(0))(img)
    assert out.size == (32, 64)
    out = Random2DTranslation(64, 32, p=0.0, rng=np.random.RandomState(0))(img)
    assert out.size == (32, 64)


def test_rect_scale():
    img = pil_image(100, 50)
    out = RectScale(64, 32)(img)
    assert out.size == (32, 64)
    assert RectScale(100, 50)(img) is img  # no-op when already sized


def test_elastic_transform_preserves_shape():
    img = pil_image(32, 16)
    out = ElasticTransform(alpha=100, sigma=5, rng=np.random.RandomState(0))(img)
    assert out.size == img.size
    assert not np.array_equal(np.asarray(out), np.asarray(img))


def test_random_erasing_single_rect():
    chw = np.ones((3, 32, 16), np.float32)
    out = RandomErasing(probability=1.0, rng=np.random.RandomState(0))(chw)
    changed = (out != 1.0).any(axis=0)
    rows = np.flatnonzero(changed.any(axis=1))
    cols = np.flatnonzero(changed.any(axis=0))
    assert len(rows) and len(cols)
    # solid single rectangle
    assert changed[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1].all()
    # erased value is the per-channel mean
    assert np.isclose(out[0, rows[0], cols[0]], 0.4914)


def test_misalign_keeps_shape():
    hwc = np.random.RandomState(0).rand(40, 16, 3).astype(np.float32)
    out = MisAlignAugment(rng=np.random.RandomState(1))(hwc)
    assert out.shape == hwc.shape


def test_random_pose_augmentation_swaps_patches():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (4, 64, 32, 3), dtype=np.uint8)
    pose = np.zeros((18, 3))
    pose[0] = [16, 32, 0.9]  # one confident keypoint at center
    aug = RandomPoseAugmentation(
        {"k.jpg": pose}, key_fn=lambda p: "k.jpg", radius=4, p=1.0,
        rng=np.random.RandomState(3),
    )
    out = aug(frames, ["k.jpg"] * 4, [(32, 64)] * 4)
    assert out.shape == frames.shape
    assert not np.array_equal(out, frames)
    # total pixel content preserved (patches swapped, not lost)
    assert out.sum() == frames.sum()


def test_image_dataset(tmp_path):
    from agrl_tpu.data.loader import ImageDataset

    p = str(tmp_path / "img.png")
    pil_image(80, 40).save(p)
    ds = ImageDataset([(p, 3, 1)], height=64, width=32)
    img, pid, camid = ds.get_item(0)
    assert img.shape == (64, 32, 3) and pid == 3 and camid == 1


def test_image_dataset_through_cliploader(tmp_path):
    """ImageDataset items (no adjacency) collate through ClipLoader with a
    placeholder all-ones adj."""
    from agrl_tpu.data.loader import ClipLoader, ImageDataset

    paths = []
    for i in range(4):
        p = str(tmp_path / f"img{i}.png")
        pil_image(80, 40).save(p)
        paths.append(p)
    ds = ImageDataset([(p, i % 2, 0) for i, p in enumerate(paths)], height=64, width=32)
    loader = ClipLoader(ds, batch_size=2, num_workers=1)
    batches = list(loader)
    assert len(batches) == 2
    imgs, pids, camids, adjs = batches[0]
    assert imgs.shape == (2, 64, 32, 3)
    assert adjs.shape == (2, 1, 1) and (adjs == 1).all()
