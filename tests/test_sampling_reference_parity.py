"""Draw-for-draw clip-sampler parity vs the imported reference.

The 7 sampling strategies live inline in the reference's
VideoDataset.__getitem__ (torchreid/dataset_loader.py:91-170) and draw
from GLOBAL RNG streams: np.random for `random`/`restricted`, the python
stdlib `random` module for `consecutive`'s window start. Here the real
reference class runs with a stubbed image reader that records which frame
paths it fetches, so the exact chosen index stream is compared against
agrl_tpu.data.sampling.sample_clip_indices under identically seeded RNG.

Documented deviations (asserted below as the ONLY differences):
  * `consecutive` on short tracklets: the reference's replication loop is
    dead code (np.append result discarded, :134-136) and yields a short
    clip; ours pads with the last frame to seq_len.
  * `consecutive` draws its window start from python `random`; ours from
    the numpy RNG. The test aligns the streams by shimming the reference
    module's `random.randint` to consume the same seeded RandomState
    (inclusive-high adjusted), proving index parity GIVEN the same draw.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from agrl_tpu.data.sampling import sample_clip_indices  # noqa: E402


def _stub_torchvision():
    if "torchvision" in sys.modules and hasattr(
        sys.modules["torchvision"], "transforms"
    ):
        return
    tv = types.ModuleType("torchvision")
    tv.models = types.SimpleNamespace()
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.transforms.functional = types.ModuleType("torchvision.transforms.functional")
    for cls in ("ToPILImage", "Resize", "RandomHorizontalFlip",
                "ToTensor", "Normalize", "Compose"):
        setattr(tv.transforms, cls, type(cls, (), {}))
    tv.transforms.__all__ = ["ToPILImage", "Resize", "RandomHorizontalFlip",
                             "ToTensor", "Normalize", "Compose"]
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.transforms.functional"] = tv.transforms.functional


@pytest.fixture(scope="module")
def ref_dl():
    import importlib

    _stub_torchvision()
    sys.path.insert(0, "/root/reference")
    try:
        return importlib.import_module("torchreid.dataset_loader")
    finally:
        sys.path.remove("/root/reference")


def _reference_indices(ref_dl, monkeypatch, num, seq_len, sample, seed,
                       max_len=1000):
    """Run the real VideoDataset.__getitem__ and recover the chosen frame
    indices from the order the (stubbed) reader fetches paths."""
    fetched = []

    class _FakeImg:
        size = (64, 128)

    def fake_read(path):
        fetched.append(int(path))
        return _FakeImg()

    monkeypatch.setattr(ref_dl, "read_image", fake_read)
    # `consecutive` consumes python random.randint(0, hi) INCLUSIVE; feed
    # it the same seeded numpy stream our sampler uses so the window-start
    # draw is shared (numpy randint's high is exclusive -> hi + 1)
    py_rng = np.random.RandomState(seed)
    monkeypatch.setattr(
        ref_dl, "random",
        types.SimpleNamespace(randint=lambda lo, hi: int(py_rng.randint(lo, hi + 1))),
    )

    def fake_transform(imgs):
        return [types.SimpleNamespace(img=torch.zeros(3, 4, 4)) for _ in imgs]

    ds = ref_dl.VideoDataset(
        [(tuple(str(i) for i in range(num)), 0, 0)],
        seq_len=seq_len, sample=sample, transform=fake_transform,
        pose_info={}, enable_pose=False, num_split=4, pyramid_part=True,
        num_scale=1, max_len=max_len,
    )
    np.random.seed(seed)  # the reference consumes the GLOBAL numpy stream
    ds[0]
    return np.asarray(fetched, dtype=np.int64)


# (num, seq_len) grid: short / exact / ragged / multiple-of-seq_len /
# long tracklets — incl. the dense extra-clip quirk (num % seq_len == 0)
CASES = [
    (3, 8), (5, 4), (8, 8), (16, 8), (15, 4), (37, 8), (64, 8), (100, 6),
]


@pytest.mark.parametrize("sample", ["evenly", "all", "dense", "skipdense", "restricted", "random"])
@pytest.mark.parametrize("num,seq_len", CASES)
def test_sampler_bit_equal_vs_reference(ref_dl, monkeypatch, sample, num, seq_len):
    for seed in (0, 1, 2):
        want = _reference_indices(ref_dl, monkeypatch, num, seq_len, sample, seed)
        got = sample_clip_indices(
            num, seq_len, sample, rng=np.random.RandomState(seed)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"{sample} n={num} S={seq_len} seed={seed}")


@pytest.mark.parametrize("num,seq_len", CASES)
def test_consecutive_bit_equal_where_defined(ref_dl, monkeypatch, num, seq_len):
    """`consecutive`: bit-equal on tracklets >= seq_len; on short ones the
    reference emits a SHORT clip (its replication loop is dead code) and
    ours appends last-frame padding — asserted as the only difference."""
    for seed in (0, 1, 2):
        want = _reference_indices(ref_dl, monkeypatch, num, seq_len, "consecutive", seed)
        got = sample_clip_indices(
            num, seq_len, "consecutive", rng=np.random.RandomState(seed)
        )
        if num >= seq_len:
            np.testing.assert_array_equal(got, want)
        else:
            assert len(want) == num and len(got) == seq_len
            np.testing.assert_array_equal(got[:num], want)
            assert (got[num:] == want[-1]).all()  # last-frame padding


def test_max_len_truncation_matches(ref_dl, monkeypatch):
    """Over-length tracklets truncate to max_len before sampling
    (reference :77-89)."""
    want = _reference_indices(
        ref_dl, monkeypatch, 30, 4, "evenly", seed=0, max_len=12
    )
    got = sample_clip_indices(30, 4, "evenly", max_len=12)
    np.testing.assert_array_equal(got, want)
    assert got.max() < 12


def test_restricted_consumes_stream_like_reference(ref_dl, monkeypatch):
    """After a `restricted` item, both RNG streams must be at the same
    position: drawing one more value gives the same result. Guards against
    silent consumption drift (extra/fewer draws) that per-item equality
    alone could mask when draws collide."""
    rng = np.random.RandomState(123)
    _ = sample_clip_indices(37, 8, "restricted", rng=rng)
    ours_next = rng.randint(0, 1 << 30)

    _reference_indices(ref_dl, monkeypatch, 37, 8, "restricted", seed=123)
    ref_next = np.random.randint(0, 1 << 30)
    assert ours_next == ref_next
