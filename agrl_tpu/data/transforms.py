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
    here a single rectangle is erased per clip (the standard Zhong et al.
    formulation the reference clearly intended).
  * rand-crop/misalign run AFTER the host resize with proportionally
    scaled sizes (geometry-equivalent up to resampling order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def host_decode_resize(paths, height: int, width: int) -> tuple[np.ndarray, list]:
    """Read + resize frames on host. Returns (S, H, W, 3) uint8 and the
    ORIGINAL (w, h) sizes (the graph builder needs them).

    IO errors retry forever like the reference's robust reader
    (dataset_loader.py:23-36)."""
    from PIL import Image

    frames, sizes = [], []
    for p in paths:
        img = robust_read(p)
        sizes.append(img.size)
        frames.append(np.asarray(img.resize((width, height), Image.BILINEAR)))
    return np.stack(frames), sizes


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


def _erase_mask(key, H: int, W: int, sl=0.02, sh=0.4, r1=0.3):
    """Random-erasing rectangle mask (1 inside the rect), Zhong et al.
    parameterization as used by transforms.py:274-321."""
    k_area, k_ratio, k_x, k_y = jax.random.split(key, 4)
    area = H * W
    target_area = jax.random.uniform(k_area, (), minval=sl, maxval=sh) * area
    aspect = jax.random.uniform(k_ratio, (), minval=r1, maxval=1.0 / r1)
    h = jnp.sqrt(target_area * aspect).astype(jnp.int32)
    w = jnp.sqrt(target_area / aspect).astype(jnp.int32)
    h = jnp.clip(h, 1, H - 1)
    w = jnp.clip(w, 1, W - 1)
    x1 = jax.random.randint(k_x, (), 0, H - h + 1)
    y1 = jax.random.randint(k_y, (), 0, W - w + 1)
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    return (
        (rows >= x1) & (rows < x1 + h) & (cols >= y1) & (cols < y1 + w)
    )  # (H, W) bool


def _translate_crop(clip, key, p: float):
    """GroupRandom2DTranslation (transforms.py:220-271): with prob p,
    upscale by 1.125 and take a random crop back to the original size."""
    S, H, W, C = clip.shape
    k_p, k_x, k_y = jax.random.split(key, 3)
    bigger = jax.image.resize(
        clip, (S, int(H * 1.125), int(W * 1.125), C), method="bilinear"
    )
    max_x = int(W * 1.125) - W
    max_y = int(H * 1.125) - H
    x1 = jax.random.randint(k_x, (), 0, max_x + 1)
    y1 = jax.random.randint(k_y, (), 0, max_y + 1)
    cropped = jax.lax.dynamic_slice(bigger, (0, y1, x1, 0), (S, H, W, C))
    return jnp.where(jax.random.uniform(k_p) < p, cropped, clip)


def _misalign(clip, key, ratio: float = 0.05):
    """GroupMisAlignAugment (transforms.py:327-361): with prob 0.5 crop
    `ratio` off the top or bottom and pad the opposite side (replicate via
    zero-pad like the reference's pad-with-0 then, keeping size)."""
    S, H, W, C = clip.shape
    d = max(int(H * ratio), 1)
    k_apply, k_side = jax.random.split(key)
    top_cut = jnp.pad(clip[:, d:], ((0, 0), (0, d), (0, 0), (0, 0)))
    bot_cut = jnp.pad(clip[:, :-d], ((0, 0), (d, 0), (0, 0), (0, 0)))
    cut = jnp.where(jax.random.uniform(k_side) < 0.5, top_cut, bot_cut)
    return jnp.where(jax.random.uniform(k_apply) < 0.5, cut, clip)


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
        x = _translate_crop(x, k_trans, p=0.5)
    if train and flip_aug:
        x = jnp.where(jax.random.uniform(k_flip) < 0.5, x[:, :, ::-1, :], x)

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = (x - mean) / std

    if train and rand_erase:
        k_p, k_rect = jax.random.split(k_erase)
        mask = _erase_mask(k_rect, H, W)[None, :, :, None]
        erased = jnp.where(mask, 0.0, x)  # erase to 0 == per-channel mean
        x = jnp.where(jax.random.uniform(k_p) < 0.5, erased, x)
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
