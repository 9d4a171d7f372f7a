"""Batched on-device clip preprocessing (the TPU replacement for the
reference's per-frame PIL Group* transforms, torchreid/transforms.py).

Host side does only decode + resize-to-target (variable input sizes);
everything else runs as ONE jitted program over the whole (B, S, H, W, 3)
uint8 batch with clip-consistent randomness: one key per clip, broadcast
to its frames — the same "single param draw per clip" semantics as
GroupOperation (transforms.py:31-40).

Pipeline order matches the reference driver (train_vidreid_xent_htri.py:
192-218): [misalign] -> [random crop] -> resize (host) -> [flip] ->
to-float+normalize -> [random erase].

Deliberate deviations (documented):
  * GroupRandomErasing in the reference lacks the early return
    (transforms.py:298-321) and can stamp up to 100 rectangles per frame;
    here a single rectangle is erased per frame (the standard Zhong et al.
    formulation the reference clearly intended). Like the reference, the
    erase decision is PER FRAME and fills with [0.485, 0.456, 0.406] in
    post-normalization units (reference applies it after GroupNormalize).
  * rand-crop (GroupRandomCrop (240, 120) pre-resize) and misalign run
    AFTER the host resize with the equivalent fractional geometry:
    crop a (240/256, 120/128) window then stretch back; misalign crops or
    edge-pads 5% at the top/bottom and rescales to the original height
    (the reference's later GroupResize performs that stretch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def host_decode_resize(
    paths, height: int, width: int, cache=None, disk_cache=None,
    threads: int = 1, decode: str = "auto",
) -> tuple[np.ndarray, list]:
    """Read + resize frames on host. Returns (S, H, W, 3) uint8 and the
    ORIGINAL (w, h) sizes (the graph builder needs them).

    Fast path: the native batched libjpeg decoder (native/jpeg_decode.cpp)
    when built — one C call per clip instead of per-image PIL. Per-image
    failures (and non-JPEG files) fall back to the robust PIL reader, which
    retries IO errors forever like the reference (dataset_loader.py:23-36).

    `cache`: optional {path: (img_u8, (w, h))} mapping (a plain dict or
    a data.cache.BoundedCache) — decoded frames are reused across epochs
    (the reference re-decodes every epoch; on a few-core TPU host the
    cache keeps the input pipeline off the critical path after epoch one).

    `disk_cache`: optional data.cache.FrameDiskCache — a persistent store
    consulted after `cache` and before decode; decode results are written
    back, so the dataset's decode cost is paid once per machine.

    `threads`: OpenMP width for the native decoder (0 = hardware default;
    keep 1 when the caller already runs a decode thread pool).

    `decode`: which decoder produces the pixels —
      * "auto"   — native libjpeg when built, PIL otherwise (fast default);
      * "pil"    — force the PIL path: bit-identical to the reference's
        reader+GroupResize (dataset_loader.py:23-36, driver :216), the
        right choice when evaluating a MIGRATED reference checkpoint whose
        weights saw PIL-resized pixels (native DCT-scaled downscale drifts
        a few gray levels from PIL bilinear);
      * "native" — require the native decoder (raises if not built, or
        if a frame is not a JPEG — the native decoder is libjpeg-only).
    Caches store DECODED frames, so their pixels carry the decoder's
    fingerprint: `FrameDiskCache` records its decoder tag and refuses to
    serve across modes (see `effective_decoder`); the RAM `cache` is
    per-run (decode mode is fixed per run) and needs no tag.

    The clip array is preallocated and every source (RAM cache, disk
    store, decoder) fills its rows in place — disk-store hits land via
    preadv with NO intermediate per-frame arrays (the assembly copy
    dominated the disk-backed cold pipeline otherwise)."""
    if cache is None and disk_cache is None:
        return _decode_batch(paths, height, width, threads, decode)

    n = len(paths)
    out = np.empty((n, height, width, 3), np.uint8)
    sizes: list = [None] * n
    missing: list[int] = []
    for i, p in enumerate(paths):
        v = cache.get(p) if cache is not None else None
        if v is None:
            missing.append(i)
        else:
            out[i] = v[0]
            sizes[i] = v[1]
    if missing and disk_cache is not None:
        got = disk_cache.read_many_into([paths[i] for i in missing], out, missing)
        still = []
        for k, i in enumerate(missing):
            if got[k] is None:
                still.append(i)
            else:
                sizes[i] = got[k]
                if cache is not None:
                    # own copy: a view into this clip array would pin the
                    # whole clip in the LRU under one frame's accounting
                    cache[paths[i]] = (out[i].copy(), got[k])
        missing = still
    if missing:
        # decode each distinct path once (dense padding repeats frames)
        uniq = list(dict.fromkeys(paths[i] for i in missing))
        imgs_m, sizes_m = _decode_batch(uniq, height, width, threads, decode)
        by_path = {p: j for j, p in enumerate(uniq)}
        for i in missing:
            j = by_path[paths[i]]
            out[i] = imgs_m[j]
            sizes[i] = sizes_m[j]
        for p, j in by_path.items():
            if cache is not None:
                # own copy: a row VIEW would pin the whole decode-batch
                # array while the LRU accounts one frame — the cap math
                # (and eviction) would be wrong by up to the batch size
                cache[p] = (imgs_m[j].copy(), sizes_m[j])
            if disk_cache is not None:
                disk_cache.put(p, imgs_m[j], sizes_m[j])
    return out, sizes


def effective_decoder(decode: str) -> str:
    """Which decoder a run's JPEG pixels actually come from: 'native'
    unless the user forced PIL or the native library is not built.
    (Non-JPEG frames always decode via PIL in every mode — identical
    pixels across modes, so they never affect cache provenance.) This is
    the tag `FrameDiskCache` uses to keep stores single-decoder.

    An explicit decode='native' with the library unbuilt raises HERE —
    before any FrameDiskCache is opened — because opening a warm
    native-tagged store under a fallback 'pil' tag would WIPE it
    (cache.py tag mismatch) for a run that is doomed to fail at the
    first _decode_batch anyway."""
    from agrl_tpu.data import jpeg_native

    if decode == "native" and not jpeg_native.available():
        raise RuntimeError(
            "decode='native' but the native decoder is not built "
            "(make -C native builds libjpeg_decode.so)"
        )
    return "pil" if decode == "pil" or not jpeg_native.available() else "native"


def _decode_batch(
    paths, height: int, width: int, threads: int = 1, decode: str = "auto"
) -> tuple[np.ndarray, list]:
    from agrl_tpu.data import jpeg_native

    if decode == "native":
        if not jpeg_native.available():
            raise RuntimeError(
                "decode='native' but the native decoder is not built "
                "(make -C native builds libjpeg_decode.so)"
            )
        bad = next(
            (p for p in paths if not p.lower().endswith((".jpg", ".jpeg"))), None
        )
        if bad is not None:
            # an explicit 'native' must not silently benchmark/verify the
            # PIL path — the native decoder is libjpeg-only
            raise ValueError(
                f"decode='native' but '{bad}' is not a JPEG; the native "
                "decoder only handles .jpg/.jpeg — use --decode auto or pil "
                "for this dataset"
            )
    use_native = (
        decode != "pil"
        and jpeg_native.available()
        and all(p.lower().endswith((".jpg", ".jpeg")) for p in paths)
    )
    if use_native:
        imgs, sizes, ok = jpeg_native.decode_resize_batch(
            paths, height, width, threads=threads
        )
        if not ok.all():  # corrupt/missing entries -> robust PIL reader
            for i in np.flatnonzero(~ok):
                imgs[i], sizes[i] = _pil_decode_one(paths[i], height, width)
        return imgs, [tuple(s) for s in sizes]

    frames, sizes = [], []
    for p in paths:
        img, size = _pil_decode_one(p, height, width)
        sizes.append(size)
        frames.append(img)
    return np.stack(frames), sizes


def _pil_decode_one(path: str, height: int, width: int):
    from PIL import Image

    img = robust_read(path)
    size = img.size
    return np.asarray(img.resize((width, height), Image.BILINEAR)), size


def robust_read(path: str):
    from PIL import Image
    import os.path as osp

    if not osp.exists(path):
        raise IOError(f"{path} does not exist")
    while True:
        try:
            return Image.open(path).convert("RGB")
        except IOError:
            print(f"IOError reading '{path}'; retrying.")


def _erase_mask(key, H: int, W: int, sl=0.02, sh=0.4, r1=0.3, attempts: int = 10):
    """Random-erasing rectangle mask (1 inside the rect), Zhong et al.
    parameterization as used by transforms.py:274-321.

    The reference REJECTION-RESAMPLES (area, aspect) until the rectangle
    fits (w < W and h < H) — clipping instead would produce full-width
    bands the reference never draws. Vectorized here: `attempts` iid
    candidate pairs, first fitting one wins (the all-miss probability at
    256x128 is ~1e-13); if none fit, no erase — like the reference
    exhausting its tries."""
    k_area, k_ratio, k_x, k_y = jax.random.split(key, 4)
    area = H * W
    target_area = jax.random.uniform(k_area, (attempts,), minval=sl, maxval=sh) * area
    aspect = jax.random.uniform(k_ratio, (attempts,), minval=r1, maxval=1.0 / r1)
    hs = jnp.sqrt(target_area * aspect).astype(jnp.int32)
    ws = jnp.sqrt(target_area / aspect).astype(jnp.int32)
    valid = (hs < H) & (ws < W) & (hs > 0) & (ws > 0)
    first = jnp.argmax(valid)
    any_valid = valid.any()
    h = jnp.where(any_valid, hs[first], 0)
    w = jnp.where(any_valid, ws[first], 0)
    x1 = jax.random.randint(k_x, (), 0, H - h + 1)
    y1 = jax.random.randint(k_y, (), 0, W - w + 1)
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    return (
        (rows >= x1) & (rows < x1 + h) & (cols >= y1) & (cols < y1 + w)
    )  # (H, W) bool


def _random_crop(clip, key, frac_h: float = 240 / 256, frac_w: float = 120 / 128):
    """GroupRandomCrop((240, 120)) equivalent post-resize: crop a
    fractional window at a random offset from EVERY clip, then stretch
    back to the original size (the reference crops pre-resize so the
    subsequent GroupResize performs the stretch; driver :198-200)."""
    S, H, W, C = clip.shape
    ch, cw = max(1, int(round(H * frac_h))), max(1, int(round(W * frac_w)))
    k_x, k_y = jax.random.split(key)
    y1 = jax.random.randint(k_y, (), 0, H - ch + 1)
    x1 = jax.random.randint(k_x, (), 0, W - cw + 1)
    window = jax.lax.dynamic_slice(clip, (0, y1, x1, 0), (S, ch, cw, C))
    return jax.image.resize(window, (S, H, W, C), method="bilinear")


def _misalign(clip, key, ratio: float = 0.05):
    """GroupMisAlignAugment (transforms.py:327-361): with prob 0.5,
    randomly crop OR edge-pad `ratio` of the height at the top or bottom;
    the reference's later GroupResize stretches back to full height, so
    each variant here rescales to (H, W)."""
    S, H, W, C = clip.shape
    d = max(int(H * ratio), 1)
    k_apply, k_side, k_op = jax.random.split(key, 3)

    def stretch(x):
        return jax.image.resize(x, (S, H, W, C), method="bilinear")

    crop_top = stretch(clip[:, d:])
    crop_bot = stretch(clip[:, :-d])
    pad_top = stretch(jnp.pad(clip, ((0, 0), (d, 0), (0, 0), (0, 0)), mode="edge"))
    pad_bot = stretch(jnp.pad(clip, ((0, 0), (0, d), (0, 0), (0, 0)), mode="edge"))

    top = jax.random.uniform(k_side) < 0.5
    crop = jax.random.uniform(k_op) < 0.5
    out = jnp.where(
        crop,
        jnp.where(top, crop_top, crop_bot),
        jnp.where(top, pad_top, pad_bot),
    )
    return jnp.where(jax.random.uniform(k_apply) < 0.5, out, clip)


def _preprocess_one_clip(
    clip_u8,
    key,
    train: bool,
    flip_aug: bool,
    rand_erase: bool,
    misalign_aug: bool,
    rand_translate: bool,
):
    """(S, H, W, 3) uint8 -> (S, H, W, 3) float32, clip-consistent augs."""
    S, H, W, C = clip_u8.shape
    k_flip, k_erase, k_mis, k_trans = jax.random.split(key, 4)

    x = clip_u8.astype(jnp.float32) / 255.0

    if train and misalign_aug:
        x = _misalign(x, k_mis)
    if train and rand_translate:
        x = _random_crop(x, k_trans)
    if train and flip_aug:
        x = jnp.where(jax.random.uniform(k_flip) < 0.5, x[:, :, ::-1, :], x)

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = (x - mean) / std

    if train and rand_erase:
        # per-frame decision + per-frame rectangle (GroupRandomErasing runs
        # per instance, transforms.py:288-296); fill value = raw means in
        # post-normalization units (reference erases after GroupNormalize)
        fill = jnp.asarray(IMAGENET_MEAN)

        def erase_frame(frame, key):
            k_p, k_rect = jax.random.split(key)
            mask = _erase_mask(k_rect, H, W)[:, :, None]
            erased = jnp.where(mask, fill, frame)
            return jnp.where(jax.random.uniform(k_p) < 0.5, erased, frame)

        x = jax.vmap(erase_frame)(x, jax.random.split(k_erase, S))
    return x


@partial(
    jax.jit,
    static_argnames=("train", "flip_aug", "rand_erase", "misalign_aug", "rand_translate"),
)
def preprocess_clips(
    imgs_u8: jnp.ndarray,
    key: jax.Array,
    train: bool = False,
    flip_aug: bool = True,
    rand_erase: bool = False,
    misalign_aug: bool = False,
    rand_translate: bool = False,
) -> jnp.ndarray:
    """(B, S, H, W, 3) uint8 -> normalized float32, one key per clip."""
    B = imgs_u8.shape[0]
    keys = jax.random.split(key, B)
    fn = partial(
        _preprocess_one_clip,
        train=train,
        flip_aug=flip_aug,
        rand_erase=rand_erase,
        misalign_aug=misalign_aug,
        rand_translate=rand_translate,
    )
    return jax.vmap(fn)(imgs_u8, keys)
