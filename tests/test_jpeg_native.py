"""Native batched JPEG decoder: parity vs PIL, fallback, frame cache."""

import os

import numpy as np
import pytest
from PIL import Image

from agrl_tpu.data import jpeg_native
from agrl_tpu.data.transforms import host_decode_resize

pytestmark = pytest.mark.skipif(
    not jpeg_native.available(), reason="libjpeg_decode.so not built"
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    paths, arrays = [], []
    for i, (w, h) in enumerate([(128, 256), (128, 256), (64, 128), (300, 500)]):
        # smooth content so resize comparisons are meaningful
        small = (rng.rand(h // 8, w // 8, 3) * 255).astype(np.uint8)
        img = Image.fromarray(small).resize((w, h), Image.BILINEAR)
        p = str(root / f"{i}.jpg")
        img.save(p, quality=92)
        paths.append(p)
        arrays.append(np.asarray(Image.open(p).convert("RGB")))
    return paths, arrays


def test_native_decode_at_size_is_bit_exact(jpegs):
    paths, arrays = jpegs
    imgs, sizes, ok = jpeg_native.decode_resize_batch(paths[:2], 256, 128)
    assert ok.all()
    np.testing.assert_array_equal(imgs[0], arrays[0])
    np.testing.assert_array_equal(sizes[0], [128, 256])


def test_native_decode_resize_close_to_pil(jpegs):
    paths, arrays = jpegs
    imgs, sizes, ok = jpeg_native.decode_resize_batch(paths, 256, 128)
    assert ok.all()
    for i, p in enumerate(paths):
        want = np.asarray(
            Image.open(p).convert("RGB").resize((128, 256), Image.BILINEAR)
        )
        diff = np.abs(imgs[i].astype(int) - want.astype(int))
        # different (but both correct) bilinear implementations; the DCT
        # downscale path (300x500 source) adds a little more smoothing
        assert diff.mean() < 6.0, (i, diff.mean())
    np.testing.assert_array_equal(sizes[3], [300, 500])


def test_native_decode_bad_file_falls_back(tmp_path, jpegs):
    paths, _ = jpegs
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    imgs, sizes, ok = jpeg_native.decode_resize_batch([paths[0], bad], 64, 32)
    assert ok[0] and not ok[1]


def test_host_decode_resize_cache_avoids_reread(tmp_path):
    rng = np.random.RandomState(1)
    img = Image.fromarray((rng.rand(32, 16, 3) * 255).astype(np.uint8))
    p = str(tmp_path / "x.jpg")
    img.save(p)
    cache = {}
    first, sizes1 = host_decode_resize([p], 32, 16, cache=cache)
    os.remove(p)  # cached -> second call must not touch the file
    second, sizes2 = host_decode_resize([p], 32, 16, cache=cache)
    np.testing.assert_array_equal(first, second)
    assert sizes1 == sizes2


def test_host_decode_resize_native_matches_pil_path(jpegs, monkeypatch):
    paths, _ = jpegs
    native_imgs, native_sizes = host_decode_resize(paths[:2], 256, 128)
    monkeypatch.setattr(jpeg_native, "_lib", None)
    pil_imgs, pil_sizes = host_decode_resize(paths[:2], 256, 128)
    np.testing.assert_array_equal(native_imgs, pil_imgs)  # at-size: exact
    assert list(native_sizes) == list(pil_sizes)


def test_decode_mode_pil_bypasses_native(jpegs):
    """decode='pil' must produce the reference's exact pixels (PIL
    bilinear) even with the native decoder built — the migrated-checkpoint
    eval path (--decode pil)."""
    paths, _ = jpegs
    pil_imgs, _ = host_decode_resize(paths, 256, 128, decode="pil")
    for i, p in enumerate(paths):
        want = np.asarray(
            Image.open(p).convert("RGB").resize((128, 256), Image.BILINEAR)
        )
        np.testing.assert_array_equal(pil_imgs[i], want)
    # the downscale source (300x500) must actually differ from native —
    # otherwise this test wouldn't be proving a real switch
    nat_imgs, _ = host_decode_resize(paths, 256, 128, decode="native")
    assert np.abs(nat_imgs[3].astype(int) - pil_imgs[3].astype(int)).max() > 0


def test_decode_mode_native_errors_when_unbuilt(jpegs, monkeypatch):
    paths, _ = jpegs
    monkeypatch.setattr(jpeg_native, "_lib", None)
    with pytest.raises(RuntimeError, match="native"):
        host_decode_resize(paths[:1], 64, 32, decode="native")


def test_decode_mode_native_rejects_non_jpeg(tmp_path, jpegs):
    """An explicit decode='native' on a PNG dataset (iLIDS-VID/PRID2011
    frames) must raise, not silently decode via PIL — the user asked to
    measure/require the native path."""
    png = str(tmp_path / "frame.png")
    Image.fromarray(np.zeros((16, 8, 3), np.uint8)).save(png)
    with pytest.raises(ValueError, match="not a JPEG"):
        host_decode_resize([png], 16, 8, decode="native")
    # auto still quietly uses PIL for non-JPEGs (correct pixels, no error)
    imgs, sizes = host_decode_resize([png], 16, 8, decode="auto")
    assert imgs.shape == (1, 16, 8, 3) and sizes[0] == (8, 16)


def test_effective_decoder_resolution(monkeypatch):
    from agrl_tpu.data.transforms import effective_decoder

    assert effective_decoder("pil") == "pil"
    assert effective_decoder("auto") == "native"
    assert effective_decoder("native") == "native"
    monkeypatch.setattr(jpeg_native, "_lib", None)
    assert effective_decoder("auto") == "pil"


def test_dataset_decode_mode_threads_through(jpegs):
    """VideoClipDataset(decode='pil') flows to the decoder."""
    from agrl_tpu.data.loader import VideoClipDataset

    paths, _ = jpegs
    ds_pil = VideoClipDataset(
        [(tuple(paths), 0, 0)], seq_len=4, sample="evenly",
        height=256, width=128, enable_pose=False, decode="pil",
    )
    imgs, _, _, _ = ds_pil.get_item(0)
    want = np.asarray(
        Image.open(paths[3]).convert("RGB").resize((128, 256), Image.BILINEAR)
    )
    np.testing.assert_array_equal(imgs[3], want)


def test_truncated_jpeg_is_rejected(jpegs, tmp_path):
    """libjpeg 'recovers' from premature EOF by gray-filling scanlines; the
    decoder must flag that as failure so the PIL fallback handles it."""
    paths, _ = jpegs
    data = open(paths[0], "rb").read()
    trunc = str(tmp_path / "trunc.jpg")
    open(trunc, "wb").write(data[: len(data) // 2])
    imgs, _, ok = jpeg_native.decode_resize_batch([paths[0], trunc], 256, 128)
    assert ok[0] and not ok[1]
    assert not imgs[1].any()  # failed entries are zero-filled


def test_failed_entries_are_zero_filled(tmp_path):
    bogus = str(tmp_path / "nope.jpg")
    imgs, sizes, ok = jpeg_native.decode_resize_batch([bogus], 8, 8)
    assert not ok[0]
    assert not imgs[0].any()
    assert (sizes[0] == 0).all()


def test_garbage_bytes_are_rejected(tmp_path):
    p = str(tmp_path / "garbage.jpg")
    open(p, "wb").write(b"\xff\xd8" + os.urandom(4096))
    imgs, _, ok = jpeg_native.decode_resize_batch([p], 16, 16)
    assert not ok[0]
    assert not imgs[0].any()
