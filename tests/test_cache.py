"""Host cache tests: byte-capped LRU, persistent frame store, and their
wiring through host_decode_resize / VideoClipDataset / ClipLoader."""

import os

import numpy as np
import pytest
from PIL import Image

from agrl_tpu.data.cache import BoundedCache, FrameDiskCache, estimate_cache_gb
from agrl_tpu.data.transforms import host_decode_resize


def _frame(seed, h=8, w=6):
    return (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)


class TestBoundedCache:
    def test_cap_honored_with_lru_eviction(self):
        item_bytes = 1000 + 64  # payload + per-array overhead
        cache = BoundedCache(max_bytes=3 * item_bytes)
        for i in range(5):
            cache[f"k{i}"] = np.zeros(1000, np.uint8)
        assert cache.nbytes <= cache.max_bytes
        assert len(cache) == 3
        assert cache.evictions == 2
        # oldest two evicted, newest three retained
        assert cache.get("k0") is None and cache.get("k1") is None
        assert cache.get("k4") is not None

    def test_get_refreshes_recency(self):
        item_bytes = 1000 + 64
        cache = BoundedCache(max_bytes=2 * item_bytes)
        cache["a"] = np.zeros(1000, np.uint8)
        cache["b"] = np.zeros(1000, np.uint8)
        assert cache.get("a") is not None  # refresh a
        cache["c"] = np.zeros(1000, np.uint8)  # evicts b, not a
        assert cache.get("a") is not None
        assert cache.get("b") is None

    def test_oversized_value_not_stored(self):
        cache = BoundedCache(max_bytes=100)
        cache["big"] = np.zeros(10_000, np.uint8)
        assert cache.get("big") is None and cache.nbytes == 0

    def test_unbounded_default(self):
        cache = BoundedCache()
        for i in range(100):
            cache[i] = np.zeros(1000, np.uint8)
        assert len(cache) == 100 and cache.evictions == 0

    def test_tuple_values_accounted(self):
        cache = BoundedCache(max_bytes=10_000)
        img = np.zeros((10, 10, 3), np.uint8)
        cache["x"] = (img, (10, 10))
        assert cache.nbytes >= img.nbytes
        got = cache.get("x")
        assert got[1] == (10, 10)

    def test_overwrite_replaces_accounting(self):
        cache = BoundedCache(max_bytes=10_000)
        cache["x"] = np.zeros(1000, np.uint8)
        n1 = cache.nbytes
        cache["x"] = np.zeros(2000, np.uint8)
        assert cache.nbytes == n1 + 1000
        assert len(cache) == 1

    def test_oversized_overwrite_keeps_prior_entry(self):
        """An over-cap update must not degrade an existing hit into a
        permanent miss (the old pop-then-bail deleted the entry)."""
        cache = BoundedCache(max_bytes=5000)
        small = np.arange(1000, dtype=np.uint8)
        cache["x"] = small
        cache["x"] = np.zeros(10_000, np.uint8)  # over the whole cap
        np.testing.assert_array_equal(cache.get("x"), small)
        assert cache.nbytes > 0


class TestFrameDiskCache:
    def test_roundtrip_and_persistence(self, tmp_path):
        d = str(tmp_path / "store")
        store = FrameDiskCache(d, 8, 6)
        img = _frame(0)
        store.put("/a/b.jpg", img, (64, 128))
        got = store.get("/a/b.jpg")
        np.testing.assert_array_equal(got[0], img)
        assert got[1] == (64, 128)
        assert store.get("/missing.jpg") is None
        store.close()

        # a fresh instance (new process) sees the same records
        store2 = FrameDiskCache(d, 8, 6)
        assert len(store2) == 1
        got2 = store2.get("/a/b.jpg")
        np.testing.assert_array_equal(got2[0], img)
        store2.close()

    def test_stale_source_files_discard_store(self, tmp_path, capsys):
        """Records fingerprint their source file's byte size; a dataset
        regenerated at the same paths (different sizes) marks the store
        stale at open — a writer wipes it, instead of serving old pixels
        forever. Missing files do NOT flag staleness (a store may outlive
        a tree whose frames are never requested)."""
        src = tmp_path / "img.jpg"
        src.write_bytes(b"x" * 100)
        d = str(tmp_path / "store")
        store = FrameDiskCache(d, 8, 6)
        store.put(str(src), _frame(0), (64, 128))
        store.put("/gone/elsewhere.jpg", _frame(1), (64, 128))
        store.close()

        # unchanged source: reopen preserves both records
        store2 = FrameDiskCache(d, 8, 6)
        assert len(store2) == 2
        store2.close()

        src.write_bytes(b"y" * 150)  # regenerated dataset: size changed
        store3 = FrameDiskCache(d, 8, 6)
        assert len(store3) == 0
        assert "stale" in capsys.readouterr().out
        # and the wiped store appends cleanly from scratch
        store3.put(str(src), _frame(2), (64, 128))
        np.testing.assert_array_equal(store3.get(str(src))[0], _frame(2))
        store3.close()

    def test_decoder_tag_guards_cross_mode_reuse(self, tmp_path, capsys):
        """A store remembers which decoder produced its pixels. Opening
        with the other tag must never serve them: a writer wipes, a
        read-only opener ignores. Same tag reopens normally; an empty
        tag skips the check (library use)."""
        d = str(tmp_path / "store")
        store = FrameDiskCache(d, 8, 6, decoder="native")
        store.put("/a/b.jpg", _frame(0), (64, 128))
        store.close()

        same = FrameDiskCache(d, 8, 6, decoder="native")
        assert len(same) == 1
        # read-only opener with the OTHER tag, while `same` holds the lock
        ro = FrameDiskCache(d, 8, 6, decoder="pil")
        assert ro.read_only and len(ro) == 0
        assert ro.get("/a/b.jpg") is None
        assert "ignoring it (read-only)" in capsys.readouterr().out
        ro.close()
        same.close()
        # ...and the store survived the read-only mismatch untouched
        check = FrameDiskCache(d, 8, 6, decoder="native")
        assert len(check) == 1
        check.close()

        other = FrameDiskCache(d, 8, 6, decoder="pil")  # writer: wipes
        assert len(other) == 0
        assert "decoded by 'native'" in capsys.readouterr().out
        other.put("/a/b.jpg", _frame(1), (64, 128))
        other.close()
        reopened = FrameDiskCache(d, 8, 6, decoder="pil")
        np.testing.assert_array_equal(reopened.get("/a/b.jpg")[0], _frame(1))
        reopened.close()

    def test_untagged_legacy_store_wiped_by_tagged_writer(self, tmp_path):
        """A store written before decoder tagging existed (no .dec file)
        could hold either decoder's pixels — a tagged open re-pays decode
        instead of trusting it."""
        d = str(tmp_path / "store")
        legacy = FrameDiskCache(d, 8, 6)  # untagged: no provenance check
        legacy.put("/a/b.jpg", _frame(0), (64, 128))
        legacy.close()
        tagged = FrameDiskCache(d, 8, 6, decoder="pil")
        assert len(tagged) == 0
        tagged.close()

    def test_partial_trailing_record_dropped(self, tmp_path):
        d = str(tmp_path / "store")
        store = FrameDiskCache(d, 8, 6)
        store.put("one.jpg", _frame(1), (6, 8))
        store.put("two.jpg", _frame(2), (6, 8))
        store.close()
        # simulate a crash mid-append: truncate the bin inside record 2
        bin_path = os.path.join(d, "frames_8x6.bin")
        size = os.path.getsize(bin_path)
        with open(bin_path, "r+b") as f:
            f.truncate(size - 10)
        store2 = FrameDiskCache(d, 8, 6)
        assert len(store2) == 1
        np.testing.assert_array_equal(store2.get("one.jpg")[0], _frame(1))
        assert store2.get("two.jpg") is None
        # appending after recovery lands in the right slot
        store2.put("three.jpg", _frame(3), (6, 8))
        np.testing.assert_array_equal(store2.get("three.jpg")[0], _frame(3))
        store2.close()

    def test_duplicate_put_is_noop(self, tmp_path):
        store = FrameDiskCache(str(tmp_path / "s"), 8, 6)
        store.put("p.jpg", _frame(4), (6, 8))
        store.put("p.jpg", _frame(5), (6, 8))  # ignored
        np.testing.assert_array_equal(store.get("p.jpg")[0], _frame(4))
        assert len(store) == 1
        store.close()

    def test_separate_stores_per_resolution(self, tmp_path):
        d = str(tmp_path / "s")
        a = FrameDiskCache(d, 8, 6)
        b = FrameDiskCache(d, 16, 12)
        a.put("p.jpg", _frame(6, 8, 6), (6, 8))
        assert b.get("p.jpg") is None
        a.close()
        b.close()


class TestDecodeIntegration:
    def _write_jpeg(self, tmp_path, name="x.jpg", h=32, w=16, seed=1):
        img = Image.fromarray(_frame(seed, h, w))
        p = str(tmp_path / name)
        img.save(p)
        return p

    def test_disk_cache_serves_after_file_removed(self, tmp_path):
        p = self._write_jpeg(tmp_path)
        store = FrameDiskCache(str(tmp_path / "store"), 32, 16)
        first, sizes1 = host_decode_resize([p], 32, 16, disk_cache=store)
        os.remove(p)  # persisted -> decode must not be needed again
        second, sizes2 = host_decode_resize([p], 32, 16, disk_cache=store)
        np.testing.assert_array_equal(first, second)
        assert list(map(tuple, sizes1)) == list(map(tuple, sizes2))
        store.close()

    def test_disk_hit_populates_ram_cache(self, tmp_path):
        p = self._write_jpeg(tmp_path)
        store = FrameDiskCache(str(tmp_path / "store"), 32, 16)
        host_decode_resize([p], 32, 16, disk_cache=store)
        ram = BoundedCache()
        host_decode_resize([p], 32, 16, cache=ram, disk_cache=store)
        assert ram.get(p) is not None
        store.close()

    def test_bounded_cache_as_ram_cache(self, tmp_path):
        p = self._write_jpeg(tmp_path)
        ram = BoundedCache(max_bytes=10**6)
        first, _ = host_decode_resize([p], 32, 16, cache=ram)
        os.remove(p)
        second, _ = host_decode_resize([p], 32, 16, cache=ram)
        np.testing.assert_array_equal(first, second)


class TestDatasetWiring:
    def _make_tracklets(self, tmp_path, n_track=3, frames=4, h=32, w=16):
        tracklets = []
        k = 0
        for t in range(n_track):
            paths = []
            for f in range(frames):
                img = Image.fromarray(_frame(k, h, w))
                p = str(tmp_path / f"t{t}_f{f}.jpg")
                img.save(p)
                paths.append(p)
                k += 1
            tracklets.append((tuple(paths), t, 0))
        return tracklets

    def test_dataset_cache_cap_honored(self, tmp_path):
        from agrl_tpu.data.loader import VideoClipDataset

        tracklets = self._make_tracklets(tmp_path)
        cap = 2 * (32 * 16 * 3 + 200)
        ds = VideoClipDataset(
            tracklets, seq_len=4, sample="random", height=32, width=16,
            enable_pose=False, cache_frames=True, cache_bytes=cap,
        )
        rng = np.random.RandomState(0)
        for i in range(len(tracklets)):
            ds.get_item(i, rng)
        assert ds.cache.nbytes <= cap
        assert ds.cache.evictions > 0

    def test_shared_cache_across_datasets(self, tmp_path):
        from agrl_tpu.data.loader import VideoClipDataset

        tracklets = self._make_tracklets(tmp_path)
        shared = BoundedCache(max_bytes=10**7)
        common = dict(seq_len=4, height=32, width=16, enable_pose=False,
                      cache_frames=True, cache=shared)
        ds_a = VideoClipDataset(tracklets[:2], sample="evenly", **common)
        ds_b = VideoClipDataset(tracklets[2:], sample="evenly", **common)
        ds_a.get_item(0)
        ds_b.get_item(0)
        assert ds_a.cache is shared and ds_b.cache is shared
        # item keys are namespaced per dataset: index 0 of each coexists
        assert shared.get((ds_a._item_tag, 0)) is not None
        assert shared.get((ds_b._item_tag, 0)) is not None

    def test_dataset_disk_cache_survives_instances(self, tmp_path):
        from agrl_tpu.data.loader import VideoClipDataset

        tracklets = self._make_tracklets(tmp_path)
        store_dir = str(tmp_path / "store")
        args = dict(seq_len=4, sample="evenly", height=32, width=16,
                    enable_pose=False, disk_cache=store_dir)
        ds = VideoClipDataset(tracklets, **args)
        items = [ds.get_item(i) for i in range(len(tracklets))]
        ds.disk_cache.close()
        for paths, _, _ in tracklets:  # delete every JPEG
            for p in paths:
                os.remove(p)
        ds2 = VideoClipDataset(tracklets, **args)
        items2 = [ds2.get_item(i) for i in range(len(tracklets))]
        for (a, *_), (b, *_) in zip(items, items2):
            np.testing.assert_array_equal(a, b)
        ds2.disk_cache.close()

    def test_dataset_disk_cache_tagged_by_effective_decoder(self, tmp_path):
        """A store built via the dataset's string-path constructor carries
        the run's effective decoder tag, so a later run in the other mode
        re-pays decode instead of reusing cross-mode pixels."""
        from agrl_tpu.data.loader import VideoClipDataset
        from agrl_tpu.data.transforms import effective_decoder

        tracklets = self._make_tracklets(tmp_path)
        store_dir = str(tmp_path / "store")
        args = dict(seq_len=4, sample="evenly", height=32, width=16,
                    enable_pose=False, disk_cache=store_dir)
        ds = VideoClipDataset(tracklets, decode="pil", **args)
        assert ds.disk_cache.decoder == "pil"
        ds.get_item(0)
        n_put = len(ds.disk_cache)
        assert n_put > 0
        ds.disk_cache.close()

        ds2 = VideoClipDataset(tracklets, decode="auto", **args)
        assert ds2.disk_cache.decoder == effective_decoder("auto")
        if effective_decoder("auto") == "native":
            assert len(ds2.disk_cache) == 0  # pil-tagged store was wiped
        else:  # native lib not built: auto == pil, store reused
            assert len(ds2.disk_cache) == n_put
        ds2.disk_cache.close()

    def test_loader_resolves_decode_threads(self, tmp_path):
        from agrl_tpu.data.loader import ClipLoader, VideoClipDataset

        tracklets = self._make_tracklets(tmp_path, n_track=2)
        ds = VideoClipDataset(
            tracklets, seq_len=4, sample="evenly", height=32, width=16,
            enable_pose=False,
        )
        assert ds.decode_threads is None
        ClipLoader(ds, batch_size=2, num_workers=1)
        # single-worker loading hands the core budget to the decoder's team
        assert ds.decode_threads == 0

        ds2 = VideoClipDataset(
            tracklets, seq_len=4, sample="evenly", height=32, width=16,
            enable_pose=False,
        )
        ClipLoader(ds2, batch_size=2, num_workers=4)
        assert ds2.decode_threads == 1

        # an explicit setting is never overridden
        ds3 = VideoClipDataset(
            tracklets, seq_len=4, sample="evenly", height=32, width=16,
            enable_pose=False, decode_threads=2,
        )
        ClipLoader(ds3, batch_size=2, num_workers=1)
        assert ds3.decode_threads == 2

    def _counting_dataset(self, tmp_path, sample="evenly", **kw):
        """A cached VideoClipDataset whose _build_item calls are counted."""
        from agrl_tpu.data.loader import VideoClipDataset

        tracklets = self._make_tracklets(tmp_path, n_track=5)
        ds = VideoClipDataset(
            tracklets, seq_len=4, sample=sample, height=32, width=16,
            enable_pose=False, cache_frames=True, **kw,
        )
        ds.builds = 0
        inner = ds._build_item

        def counting(index, rng=None):
            ds.builds += 1
            return inner(index, rng)

        ds._build_item = counting
        return ds

    @pytest.mark.parametrize("workers", [1, 2])
    def test_loader_batch_cache_second_epoch_is_buildless(self, tmp_path, workers):
        """Deterministic loaders cache the COLLATED batch: epoch 2 yields
        byte-identical batches with zero item builds (the warm host path
        behind repeat `--eval-step` evals)."""
        from agrl_tpu.data.loader import ClipLoader

        ds = self._counting_dataset(tmp_path)
        loader = ClipLoader(ds, batch_size=2, num_workers=workers)
        ep1 = [tuple(np.array(x, copy=True) for x in b) for b in loader]
        assert ds.builds == 5
        ep2 = list(loader)
        assert ds.builds == 5, "second epoch must be served from the batch cache"
        assert len(ep1) == len(ep2) == 3  # 5 tracklets, bs 2, ragged tail kept
        for a, b in zip(ep1, ep2):
            for xa, xb in zip(a, b):
                np.testing.assert_array_equal(xa, xb)
        # batch values are accounted against the byte budget
        assert ds.cache.nbytes > 0

    def test_loader_batch_cache_keyed_by_member_indices(self, tmp_path):
        """Two loaders with different batch sizes over one dataset must not
        serve each other's batches."""
        from agrl_tpu.data.loader import ClipLoader

        ds = self._counting_dataset(tmp_path)
        b2 = [b[0].shape for b in ClipLoader(ds, batch_size=2, num_workers=1)]
        b3 = [b[0].shape for b in ClipLoader(ds, batch_size=3, num_workers=1)]
        assert [s[0] for s in b2] == [2, 2, 1]
        assert [s[0] for s in b3] == [3, 2]

    def test_loader_batch_cache_survives_eviction(self, tmp_path):
        """Evicting the cache mid-stream just re-pays the build."""
        from agrl_tpu.data.loader import ClipLoader

        ds = self._counting_dataset(tmp_path)
        loader = ClipLoader(ds, batch_size=5, num_workers=1)
        (ep1,) = list(loader)
        ds.cache.clear()
        (ep2,) = list(loader)
        assert ds.builds == 10
        np.testing.assert_array_equal(ep1[0], ep2[0])

    @staticmethod
    def _batch_keys(cache):
        return [
            k for k in list(cache._d)
            if isinstance(k, tuple) and len(k) == 3 and k[1] == "batch"
        ]

    def test_loader_batch_cache_off_for_nondeterministic(self, tmp_path):
        """Shuffle and rng-consuming strategies must not store batches —
        their composition is not reproducible across epochs."""
        from agrl_tpu.data.loader import ClipLoader

        # shuffle=True: falls back to the per-item cache (items ARE
        # deterministic under 'evenly'; only the batch grouping shuffles)
        ds = self._counting_dataset(tmp_path)
        loader = ClipLoader(ds, batch_size=5, num_workers=1, shuffle=True, seed=0)
        list(loader), list(loader)
        assert ds.builds == 5  # epoch 2 hits the item cache
        assert self._batch_keys(ds.cache) == []

        # rng-consuming sampling strategy ('random'): nothing cacheable
        ds2 = self._counting_dataset(tmp_path, sample="random")
        loader2 = ClipLoader(ds2, batch_size=5, num_workers=1)
        list(loader2), list(loader2)
        assert ds2.builds == 10  # rebuilt every epoch
        assert self._batch_keys(ds2.cache) == []


class TestResolveCacheBudget:
    """--cache-gb auto default (VERDICT r04 weak #4): the budget raises
    itself to hold the collated eval set when host RAM allows, so the
    warm-eval projection's precondition holds at DEFAULTS."""

    def test_mars_shaped_auto_raise(self):
        from agrl_tpu.data.cache import resolve_cache_budget

        # MARS evenly at 256x128x8: (1980+9330) clips ~ 8.9 GB — above the
        # 8 GB legacy default; this rig's ~123 GB MemAvailable fits it
        eval_gb = (1980 + 9330) * 8 * 256 * 128 * 3 / 1e9
        cap, reason = resolve_cache_budget(None, eval_gb, avail_gb=123.0)
        assert cap >= eval_gb * 1e9
        assert "auto-raised" in reason

    def test_ram_cap_keeps_default_and_warns(self):
        from agrl_tpu.data.cache import resolve_cache_budget

        eval_gb = 8.9
        cap, reason = resolve_cache_budget(None, eval_gb, avail_gb=20.0)
        assert cap == int(8.0 * 1e9)  # 9.8 GB > 40% of 20 GB
        assert "disk/decode rate" in reason

    def test_explicit_flag_always_wins(self):
        from agrl_tpu.data.cache import resolve_cache_budget

        cap, reason = resolve_cache_budget(4.0, eval_gb=50.0, avail_gb=500.0)
        assert cap == int(4.0 * 1e9) and "--cache-gb" in reason
        cap, reason = resolve_cache_budget(0, eval_gb=50.0)
        assert cap is None and "UNBOUNDED" in reason

    def test_small_eval_set_keeps_default(self):
        from agrl_tpu.data.cache import resolve_cache_budget

        cap, reason = resolve_cache_budget(None, eval_gb=0.5, avail_gb=16.0)
        assert cap == int(8.0 * 1e9) and "default" in reason


def test_auto_budget_keeps_repeat_evals_host_free(tmp_path, monkeypatch):
    """End to end at test scale: with the legacy fixed default UNDER the
    eval set the cyclic eval scan thrashes the LRU (epoch 2 rebuilds);
    the auto-resolved budget holds the batch set and epoch 2 is
    buildless — the 7.17x warm projection's precondition at defaults."""
    from agrl_tpu.data import cache as cache_mod
    from agrl_tpu.data.cache import BoundedCache, resolve_cache_budget
    from agrl_tpu.data.loader import ClipLoader

    helper = TestDatasetWiring()
    # measure the TRUE collated working set (imgs + adjacency + ids; at
    # this tiny scale the (V, V) adjacency is ~35% of the bytes — at the
    # production 256x128x8 shape it is ~1.6%, inside the resolver's 10%
    # headroom over the CLI's imgs-only estimate)
    probe = helper._counting_dataset(tmp_path, cache=BoundedCache(None))
    list(ClipLoader(probe, batch_size=2, num_workers=1))
    eval_gb = probe.cache.nbytes / 1e9

    monkeypatch.setattr(cache_mod, "DEFAULT_CACHE_GB", eval_gb * 0.5)
    cap, reason = resolve_cache_budget(None, eval_gb, avail_gb=1.0)
    assert "auto-raised" in reason and cap >= eval_gb * 1e9

    undersized = BoundedCache(int(eval_gb * 0.5 * 1e9))
    ds = helper._counting_dataset(tmp_path, cache=undersized)
    loader = ClipLoader(ds, batch_size=2, num_workers=1)
    list(loader), list(loader)
    assert ds.builds > 5, "an undersized LRU must thrash on the cyclic scan"

    ds2 = helper._counting_dataset(tmp_path, cache=BoundedCache(cap))
    loader2 = ClipLoader(ds2, batch_size=2, num_workers=1)
    list(loader2)
    n = ds2.builds
    list(loader2)
    assert ds2.builds == n, "auto budget must keep epoch 2 host-free"


def test_estimate_cache_gb():
    tracklets = [
        (("a.jpg", "b.jpg"), 0, 0),
        (("b.jpg", "c.jpg"), 1, 0),  # b.jpg shared -> 3 distinct
    ]
    gb = estimate_cache_gb([tracklets], 256, 128)
    assert gb == pytest.approx(3 * 256 * 128 * 3 / 1e9)
    # image datasets carry bare string paths
    imgs = [("d.jpg", 0, 0)]
    gb2 = estimate_cache_gb([tracklets, imgs], 256, 128)
    assert gb2 == pytest.approx(4 * 256 * 128 * 3 / 1e9)


class TestReadManyInto:
    def test_contiguous_noncontiguous_and_missing(self, tmp_path):
        store = FrameDiskCache(str(tmp_path / "s"), 4, 4)
        frames = {f"p{i}.jpg": _frame(i, 4, 4) for i in range(6)}
        for p, img in frames.items():
            store.put(p, img, (4, 4))
        # reversed + duplicate + missing: runs break correctly
        paths = ["p3.jpg", "p4.jpg", "p5.jpg", "p1.jpg", "p1.jpg", "nope.jpg", "p0.jpg"]
        out = np.zeros((len(paths), 4, 4, 3), np.uint8)
        sizes = store.read_many_into(paths, out, list(range(len(paths))))
        for k, p in enumerate(paths):
            if p == "nope.jpg":
                assert sizes[k] is None
            else:
                assert sizes[k] == (4, 4)
                np.testing.assert_array_equal(out[k], frames[p])
        store.close()

    def test_run_longer_than_iov_chunk(self, tmp_path):
        store = FrameDiskCache(str(tmp_path / "s"), 2, 2)
        n = 600  # > MAX_RUN=256 -> several preadv calls for one run
        for i in range(n):
            store.put(f"f{i}", _frame(i, 2, 2), (2, 2))
        paths = [f"f{i}" for i in range(n)]
        out = np.zeros((n, 2, 2, 3), np.uint8)
        sizes = store.read_many_into(paths, out, list(range(n)))
        assert all(s == (2, 2) for s in sizes)
        for i in (0, 255, 256, 511, 599):
            np.testing.assert_array_equal(out[i], _frame(i, 2, 2))
        store.close()


class TestReviewRegressions:
    """Round-3 review findings: crash-recovery index desync, writer
    locking, cache-entry ownership, item-tag reuse."""

    def test_crash_recovery_truncates_index_too(self, tmp_path):
        d = str(tmp_path / "s")
        store = FrameDiskCache(d, 4, 4)
        for i in range(3):
            store.put(f"p{i}", _frame(i, 4, 4), (4, 4))
        store.close()
        # crash leaves the bin one record short of the idx
        bin_path = os.path.join(d, "frames_4x4.bin")
        with open(bin_path, "r+b") as f:
            f.truncate(2 * 4 * 4 * 3)
        s2 = FrameDiskCache(d, 4, 4)
        s2.put("newpath", _frame(9, 4, 4), (4, 4))
        s2.close()
        # the stale 'p2' idx line must NOT have realigned onto newpath's
        # record — that would serve wrong pixels for a real path forever
        s3 = FrameDiskCache(d, 4, 4)
        assert s3.get("p2") is None
        np.testing.assert_array_equal(s3.get("newpath")[0], _frame(9, 4, 4))
        np.testing.assert_array_equal(s3.get("p1")[0], _frame(1, 4, 4))
        s3.close()

    def test_second_process_opens_read_only(self, tmp_path):
        d = str(tmp_path / "s")
        a = FrameDiskCache(d, 4, 4)
        a.put("p0", _frame(0, 4, 4), (4, 4))
        b = FrameDiskCache(d, 4, 4)  # writer lock held by `a`
        assert not a.read_only and b.read_only
        np.testing.assert_array_equal(b.get("p0")[0], _frame(0, 4, 4))
        b.put("px", _frame(5, 4, 4), (4, 4))  # silently ignored
        assert b.get("px") is None
        # reader must not have truncated the writer's files
        a.put("p1", _frame(1, 4, 4), (4, 4))
        b.close()
        a.close()
        c = FrameDiskCache(d, 4, 4)  # lock released -> writer again
        assert not c.read_only
        np.testing.assert_array_equal(c.get("p1")[0], _frame(1, 4, 4))
        c.close()

    def test_decoded_cache_entries_own_their_memory(self, tmp_path):
        from PIL import Image

        p = str(tmp_path / "x.jpg")
        Image.fromarray(_frame(1, 32, 16)).save(p)
        ram = BoundedCache()
        host_decode_resize([p], 32, 16, cache=ram)
        entry = ram.get(p)
        # a view into the decode batch would pin the whole batch while
        # the LRU accounts a single frame
        assert entry[0].base is None

    def test_item_tags_not_reused_across_dataset_lifetimes(self, tmp_path):
        import gc

        from agrl_tpu.data.loader import VideoClipDataset

        tags = set()
        for _ in range(5):
            ds = VideoClipDataset([(("a.jpg",), 0, 0)], enable_pose=False)
            tags.add(ds._item_tag)
            del ds
            gc.collect()  # id(self) WOULD be reused here
        assert len(tags) == 5


def test_batchnorm_fast_variance_gated_on_flax_clamp():
    """The one-pass variance is only used when flax's _compute_stats
    clamps the negative cancellation residue; otherwise the two-pass
    fallback keeps the NaN guarantee on unpinned flax versions."""
    from agrl_tpu.models.backbone import BatchNorm, _flax_clamps_fast_variance

    assert _flax_clamps_fast_variance()  # this environment's flax has it
    assert BatchNorm.keywords["use_fast_variance"] is True
