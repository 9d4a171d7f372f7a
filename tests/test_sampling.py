"""Tests for clip index sampling strategies and P x K identity samplers."""

import numpy as np
import pytest

from agrl_tpu.data.sampling import num_clips, sample_clip_indices
from agrl_tpu.data.samplers import (
    RandomIdentitySampler,
    RandomIdentitySamplerV1,
    init_sampler,
)


def rng():
    return np.random.RandomState(0)


class TestClipSampling:
    def test_random_long(self):
        idx = sample_clip_indices(100, 8, "random", rng())
        assert idx.shape == (8,)
        assert (np.diff(idx) >= 0).all()
        assert len(set(idx)) == 8  # no replacement when long enough

    def test_random_short_replicates(self):
        idx = sample_clip_indices(3, 8, "random", rng())
        assert idx.shape == (8,)
        assert idx.max() < 3

    def test_evenly_long(self):
        # num=100, seq=8: truncate to 96, stride 12
        idx = sample_clip_indices(100, 8, "evenly", rng())
        np.testing.assert_array_equal(idx, np.arange(0, 96, 12))

    def test_evenly_short_pads_last(self):
        idx = sample_clip_indices(5, 8, "evenly", rng())
        np.testing.assert_array_equal(idx, [0, 1, 2, 3, 4, 4, 4, 4])

    def test_all(self):
        np.testing.assert_array_equal(sample_clip_indices(7, 8, "all", rng()), np.arange(7))

    def test_consecutive_window(self):
        idx = sample_clip_indices(100, 8, "consecutive", rng())
        assert idx.shape == (8,)
        np.testing.assert_array_equal(np.diff(idx), np.ones(7))

    def test_consecutive_short_pads(self):
        idx = sample_clip_indices(5, 8, "consecutive", rng())
        assert idx.shape == (8,)
        assert (idx[5:] == idx[4]).all() or (idx <= 4).all()

    def test_dense_pads_to_clip_multiple(self):
        idx = sample_clip_indices(10, 8, "dense", rng())
        assert idx.shape == (16,)
        np.testing.assert_array_equal(idx[:10], np.arange(10))
        assert (idx[10:] == 9).all()

    def test_dense_exact_multiple_quirk(self):
        # reference quirk: num % seq_len == 0 appends a FULL extra clip
        idx = sample_clip_indices(16, 8, "dense", rng())
        assert idx.shape == (24,)
        assert (idx[16:] == 15).all()
        assert num_clips(16, 8, "dense") == 3

    def test_restricted_one_per_chunk(self):
        # 80 frames pad (dense quirk) to 88 -> chunk size 11 over the padded list
        idx = sample_clip_indices(80, 8, "restricted", rng())
        assert idx.shape == (8,)
        padded = np.concatenate([np.arange(80), np.full(8, 79)])
        for s in range(8):
            assert idx[s] in padded[11 * s : 11 * (s + 1)]

    def test_skipdense_strided_clips(self):
        idx = sample_clip_indices(16, 8, "skipdense", rng())
        n = 3  # 16 -> padded to 24 -> 3 clips
        assert idx.shape == (n * 8,)
        # clip i visits padded positions i, i+n, i+2n, ...
        padded = np.concatenate([np.arange(16), np.full(8, 15)])
        for i in range(n):
            np.testing.assert_array_equal(idx[i * 8 : (i + 1) * 8], padded[i::n])

    def test_max_len_truncation(self):
        idx = sample_clip_indices(5000, 8, "dense", rng(), max_len=1000)
        assert idx.max() == 999

    def test_unknown_method_raises(self):
        with pytest.raises(KeyError):
            sample_clip_indices(10, 8, "bogus", rng())


def fake_dataset(num_pids=10, tracklets_per_pid=6):
    data = []
    for pid in range(num_pids):
        for t in range(tracklets_per_pid):
            data.append(((f"img_{pid}_{t}.jpg",), pid, t % 3))
    return data


class TestIdentitySamplers:
    def test_v1_structure(self):
        data = fake_dataset(num_pids=10, tracklets_per_pid=6)
        s = RandomIdentitySamplerV1(data, num_instances=4, seed=0)
        idxs = list(s)
        assert len(idxs) == len(s) == 10 * 4
        # every consecutive group of 4 shares one pid
        pids = [data[i][1] for i in idxs]
        for b in range(10):
            group = pids[b * 4 : (b + 1) * 4]
            assert len(set(group)) == 1
        # all 10 identities appear
        assert len(set(pids)) == 10

    def test_v1_replacement_for_rare_pids(self):
        data = fake_dataset(num_pids=4, tracklets_per_pid=2)
        s = RandomIdentitySamplerV1(data, num_instances=4, seed=0)
        idxs = list(s)
        assert len(idxs) == 16

    def test_pk_sampler_batches(self):
        data = fake_dataset(num_pids=12, tracklets_per_pid=8)
        s = RandomIdentitySampler(data, batch_size=16, num_instances=4, seed=0)
        idxs = list(s)
        assert len(idxs) % 16 == 0
        pids = [data[i][1] for i in idxs]
        # within each batch: exactly 4 pids x 4 instances
        for b in range(len(idxs) // 16):
            batch = pids[b * 16 : (b + 1) * 16]
            from collections import Counter

            counts = Counter(batch)
            assert len(counts) == 4
            assert all(c == 4 for c in counts.values())

    def test_pk_sampler_length_estimate(self):
        data = fake_dataset(num_pids=5, tracklets_per_pid=7)
        s = RandomIdentitySampler(data, batch_size=8, num_instances=4, seed=0)
        assert len(s) == 5 * 4  # 7 -> 4 usable per pid

    def test_init_sampler_registry(self):
        data = fake_dataset()
        s = init_sampler("RandomIdentitySamplerV1", data, 16, 4, seed=0)
        assert isinstance(s, RandomIdentitySamplerV1)
        with pytest.raises(KeyError):
            init_sampler("eval_me", data, 16, 4)


class TestSamplersVsReferenceClasses:
    """Structural equivalence with the imported reference samplers
    (torchreid/samplers.py): epoch lengths and batch-composition
    invariants must match (the reference mixes random/np.random/torch
    RNG streams, so draw-for-draw parity is not defined)."""

    def _dataset(self, rng, num_pids=6, max_per_pid=7):
        data = []
        for pid in range(num_pids):
            for _ in range(rng.randint(1, max_per_pid)):
                data.append((("x",), pid, 0))
        return data

    def _ref_samplers(self):
        import importlib
        import sys

        sys.path.insert(0, "/root/reference")
        try:
            return importlib.import_module("torchreid.samplers")
        finally:
            sys.path.remove("/root/reference")

    def test_v1_length_and_composition(self):
        import numpy as np

        from agrl_tpu.data.samplers import init_sampler

        ref = self._ref_samplers()
        rng = np.random.RandomState(0)
        data = self._dataset(rng)
        K = 4
        ref_s = ref.RandomIdentitySamplerV1(data, num_instances=K)
        ours = init_sampler("RandomIdentitySamplerV1", data, batch_size=8,
                            num_instances=K, seed=0)
        assert len(ours) == len(ref_s) == 6 * K
        ref_idxs = list(iter(ref_s))
        our_idxs = list(iter(ours))
        assert len(ref_idxs) == len(our_idxs)
        pid_of = {i: pid for i, (_, pid, _) in enumerate(data)}
        for idxs in (ref_idxs, our_idxs):
            # K consecutive samples share one pid; every pid appears once
            pids_seen = [pid_of[int(i)] for i in idxs]
            chunks = [pids_seen[i * K:(i + 1) * K] for i in range(6)]
            assert all(len(set(c)) == 1 for c in chunks)
            assert sorted(c[0] for c in chunks) == list(range(6))

    def test_v0_length_estimate_and_batches(self):
        import numpy as np

        from agrl_tpu.data.samplers import init_sampler

        ref = self._ref_samplers()
        rng = np.random.RandomState(3)
        data = self._dataset(rng, num_pids=8, max_per_pid=9)
        B, K = 8, 2
        ref_s = ref.RandomIdentitySampler(data, batch_size=B, num_instances=K)
        ours = init_sampler("RandomIdentitySampler", data, batch_size=B,
                            num_instances=K, seed=0)
        assert len(ours) == len(ref_s)  # same epoch-length estimate formula
        pid_of = {i: pid for i, (_, pid, _) in enumerate(data)}
        P = B // K
        for idxs in (list(iter(ref_s)), list(iter(ours))):
            assert len(idxs) % B == 0
            for b in range(len(idxs) // B):
                batch = [pid_of[int(i)] for i in idxs[b * B:(b + 1) * B]]
                # P distinct pids, K instances each
                assert len(set(batch)) == P
                assert all(batch.count(p) == K for p in set(batch))


def test_init_sampler_rejects_batch_smaller_than_instances():
    from agrl_tpu.data.samplers import init_sampler

    data = [((f"{i}.jpg",), i % 3, 0) for i in range(12)]
    with pytest.raises(ValueError, match="num_instances"):
        init_sampler("RandomIdentitySampler", data, batch_size=4, num_instances=8)
