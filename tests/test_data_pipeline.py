"""End-to-end data pipeline tests on the synthetic dataset: catalogs,
pose selection, host decode, device transforms, batched loader."""

import jax
import numpy as np
import pytest

from agrl_tpu.data.datasets import get_names, init_vidreid_dataset
from agrl_tpu.data.loader import ClipLoader, VideoClipDataset
from agrl_tpu.data.pose import pose_key_for_path, select_best_body
from agrl_tpu.data.samplers import RandomIdentitySamplerV1
from agrl_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, preprocess_clips


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return init_vidreid_dataset(
        "synthetic", root=str(root), num_pids=4, tracklets_per_pid=2,
        frames_per_tracklet=(5, 12), height=64, width=32, verbose=False,
    )


class TestPose:
    def test_single_body_passthrough(self):
        joints = list(np.arange(54, dtype=float))
        out = select_best_body([{"joints": joints, "score": 1.0}])
        assert out.shape == (18, 3)

    def test_multi_body_score_walk(self):
        mk = lambda s: {"joints": list(np.random.RandomState(int(s * 10)).rand(54)), "score": s}  # noqa: E731
        # scores 1.0 then 1.05 (not > 1.1x) -> keeps first
        out = select_best_body([mk(1.0), mk(1.05)])
        np.testing.assert_array_equal(out, np.asarray(mk(1.0)["joints"]).reshape(-1, 3))
        # 1.0 then 1.5 (> 1.1x) -> takes second
        out = select_best_body([mk(1.0), mk(1.5)])
        np.testing.assert_array_equal(out, np.asarray(mk(1.5)["joints"]).reshape(-1, 3))

    def test_key_rules(self):
        assert pose_key_for_path(
            "data/ilids-vid/i-LIDS-VID/sequences/cam1/person238/cam1_person238_02519.png"
        ) == "cam1_person238_02519.png"
        assert pose_key_for_path(
            "data/prid2011/prid_2011/multi_shot/cam_a/person_0115/0006.png"
        ) == "cam_a-person_0115-0006.png"
        assert pose_key_for_path("data/mars/bbox_train/0999/0999C1T0001F002.jpg") == (
            "0999C1T0001F002.jpg"
        )
        assert pose_key_for_path(
            "data/dukemtmc-vidreid/DukeMTMC-VideoReID/train/0148/0212/0148_C5_F0006_X89499.jpg"
        ) == "0148-0212-0148_C5_F0006_X89499.jpg"
        with pytest.raises(ValueError):
            pose_key_for_path("somewhere/else.jpg")


class TestSyntheticCatalog:
    def test_registry(self):
        assert set(get_names()) == {
            "mars", "ilidsvid", "prid2011", "dukemtmcvidreid", "synthetic",
        }
        with pytest.raises(KeyError):
            init_vidreid_dataset("market1501")

    def test_contract(self, synth):
        assert synth.num_train_pids == 4
        assert len(synth.train) == 8
        paths, pid, camid = synth.train[0]
        assert isinstance(paths, tuple) and len(paths) >= 5
        assert pose_key_for_path(paths[0]) in synth.process_poses


class TestLoader:
    def test_train_batches(self, synth):
        ds = VideoClipDataset(
            synth.train, seq_len=4, sample="restricted", height=64, width=32,
            pose_info=synth.process_poses, num_split=4, pyramid_part=True,
        )
        sampler = RandomIdentitySamplerV1(synth.train, num_instances=2, seed=0)
        loader = ClipLoader(ds, batch_size=4, sampler=sampler, drop_last=True, num_workers=4)
        n_batches = 0
        for imgs, pids, camids, adjs in loader:
            assert imgs.shape == (4, 4, 64, 32, 3) and imgs.dtype == np.uint8
            assert pids.shape == (4,)
            V = ds.num_vertices
            assert adjs.shape == (4, V, V)
            # PxK structure: 2 pids x 2 instances
            assert len(set(pids.tolist())) == 2
            n_batches += 1
        assert n_batches == len(loader) == 2

    def test_dense_eval_item(self, synth):
        ds = VideoClipDataset(
            synth.query, seq_len=4, sample="dense", height=64, width=32,
            pose_info=synth.process_poses,
        )
        imgs, pid, camid, adjs = ds.get_item(0, np.random.RandomState(0))
        n = imgs.shape[0]
        assert imgs.shape == (n, 4, 64, 32, 3)
        assert adjs.shape == (n, ds.num_vertices, ds.num_vertices)

    def test_pose_adjacency_nonzero(self, synth):
        ds = VideoClipDataset(
            synth.train, seq_len=4, sample="evenly", height=64, width=32,
            pose_info=synth.process_poses,
        )
        _, _, _, adj = ds.get_item(0, np.random.RandomState(0))
        assert adj.sum() > 0  # synthetic poses produce real part cliques

    def test_no_pose_gives_ones(self, synth):
        ds = VideoClipDataset(
            synth.train, seq_len=4, sample="evenly", height=64, width=32,
            enable_pose=False,
        )
        _, _, _, adj = ds.get_item(0, np.random.RandomState(0))
        assert (adj == 1).all()

    def test_no_pose_all_sampling_adj_sized_by_clip(self, synth):
        """`--test-sample all` without pose: the adjacency must be sized by
        the ACTUAL tracklet length, not seq_len — the bucketed evaluator
        derives vertices-per-frame from adj.shape[0] / num_frames
        (regression: ones(seq_len) crashed `all` eval on sta/res50tp)."""
        ds = VideoClipDataset(
            synth.query, seq_len=4, sample="all", height=64, width=32,
            enable_pose=False, num_split=4, pyramid_part=True,
        )
        ts = ds.graph_builder.total_split * ds.graph_builder.num_scale
        for i in range(len(ds)):
            imgs, _, _, adj = ds.get_item(i, np.random.RandomState(0))
            num = imgs.shape[0]
            assert adj.shape == (num * ts, num * ts)
            assert (adj == 1).all()


class TestDeviceTransforms:
    def make(self, B=2, S=4, H=16, W=8):
        rng = np.random.RandomState(0)
        return rng.randint(0, 256, (B, S, H, W, 3)).astype(np.uint8)

    def test_eval_is_resize_normalize_only(self):
        u8 = self.make()
        out = np.asarray(preprocess_clips(u8, jax.random.PRNGKey(0), train=False))
        want = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_flip_is_clip_consistent(self):
        u8 = self.make(B=16)
        out = np.asarray(
            preprocess_clips(u8, jax.random.PRNGKey(1), train=True, flip_aug=True)
        )
        want = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        flipped = want[:, :, :, ::-1, :]
        some_flipped = 0
        for b in range(16):
            is_plain = np.allclose(out[b], want[b], atol=1e-5)
            is_flip = np.allclose(out[b], flipped[b], atol=1e-5)
            assert is_plain or is_flip  # whole clip flips together
            some_flipped += int(is_flip)
        assert 0 < some_flipped < 16  # p=0.5 both outcomes appear

    def test_erase_stamps_one_rect_per_frame(self):
        u8 = np.full((8, 2, 32, 16, 3), 255, np.uint8)
        out = np.asarray(
            preprocess_clips(
                u8, jax.random.PRNGKey(0), train=True, flip_aug=False, rand_erase=True
            )
        )
        base = (1.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        n_erased = 0
        for b in range(8):
            for s in range(2):
                frame = out[b, s]
                changed = ~np.isclose(frame, base, atol=1e-5).all(axis=-1)
                if changed.any():
                    n_erased += 1
                    rows = np.flatnonzero(changed.any(axis=1))
                    cols = np.flatnonzero(changed.any(axis=0))
                    # erased region is one solid rectangle...
                    assert changed[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1].all()
                    # ...filled with the raw means in normalized units
                    np.testing.assert_allclose(
                        frame[rows[0], cols[0]], IMAGENET_MEAN, atol=1e-5
                    )
        assert 0 < n_erased < 16  # p=0.5 per frame

    def test_deterministic_given_key(self):
        u8 = self.make()
        a = np.asarray(preprocess_clips(u8, jax.random.PRNGKey(3), train=True))
        b = np.asarray(preprocess_clips(u8, jax.random.PRNGKey(3), train=True))
        np.testing.assert_array_equal(a, b)


def test_erase_mask_rejection_resamples_oversize_rects():
    """The reference retries (area, aspect) draws until the rect fits
    (w < W and h < H); clipping would produce full-width bands it never
    generates. Over many keys, no mask may span the full width/height."""
    from agrl_tpu.data.transforms import _erase_mask

    H, W = 256, 128
    masks = jax.vmap(lambda k: _erase_mask(k, H, W))(
        jax.random.split(jax.random.PRNGKey(0), 256)
    )
    masks = np.asarray(masks)
    assert masks.any(axis=(1, 2)).all()  # every draw produced a rect
    col_spans = masks.any(axis=1).sum(axis=1)  # erased width per draw
    row_spans = masks.any(axis=2).sum(axis=1)
    assert col_spans.max() < W, "full-width erase band: oversize rect not resampled"
    assert row_spans.max() < H


def test_load_weights_partial_restores_batch_stats(tmp_path):
    """--load-weights must carry BN running statistics, not just params —
    the reference's torch state_dict load includes running_mean/var."""
    from agrl_tpu.core import load_weights_partial, save_checkpoint

    params = {"dense": {"kernel": np.ones((3, 3), np.float32)}}
    stats = {"bn": {"mean": np.full((3,), 7.0, np.float32),
                    "var": np.full((3,), 2.0, np.float32)}}
    f = str(tmp_path / "ck.msgpack")
    save_checkpoint({"params": params, "batch_stats": stats, "opt_state": {}},
                    f, epoch=0)

    fresh = {
        "params": {"dense": {"kernel": np.zeros((3, 3), np.float32)}},
        "batch_stats": {"bn": {"mean": np.zeros(3, np.float32),
                               "var": np.ones(3, np.float32)}},
    }
    new_vars, matched, skipped = load_weights_partial(fresh, f)
    assert not skipped
    np.testing.assert_array_equal(new_vars["batch_stats"]["bn"]["mean"], stats["bn"]["mean"])
    np.testing.assert_array_equal(new_vars["params"]["dense"]["kernel"], params["dense"]["kernel"])
    assert any(m.startswith("batch_stats/") for m in matched)
