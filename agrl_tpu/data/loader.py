"""Clip dataset + batched loader with threaded host prefetch.

The host-side analogue of the reference's VideoDataset + torch DataLoader
(dataset_loader.py:58-215, driver :222-247), restructured for the TPU
input pipeline: items are assembled as uint8 numpy batches (decode +
resize only — every other transform runs on device, see
agrl_tpu.data.transforms), and a thread pool overlaps image IO with
device compute (the counterpart of `-j` DataLoader workers).

Item contract (parity with dataset_loader.py:83-215):
  * clip strategies (random/evenly/consecutive/restricted):
      imgs (S, H, W, 3) u8, pid, camid, adj (V, V)
  * dense/skipdense: the tracklet folds into n clips:
      imgs (n, S, H, W, 3), pid, camid, adj (n, V, V) — one graph PER CLIP
  * enable_pose=False -> all-ones adjacency.
"""

from __future__ import annotations

import os.path as osp
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from agrl_tpu.data.cache import BoundedCache, FrameDiskCache
from agrl_tpu.data.graph import GraphBuilder
from agrl_tpu.data.pose import pose_key_for_path
from agrl_tpu.data.sampling import sample_clip_indices
from agrl_tpu.data.transforms import effective_decoder, host_decode_resize


class ImageDataset:
    """Image re-id dataset (parity: dataset_loader.py:39-55): items are
    single (img, pid, camid) records; decode+resize on host, device-side
    transforms apply downstream."""

    def __init__(self, dataset: list, height: int = 256, width: int = 128):
        self.dataset = dataset
        self.height = height
        self.width = width

    def __len__(self):
        return len(self.dataset)

    def get_item(self, index: int, rng=None):
        img_path, pid, camid = self.dataset[index]
        imgs, _ = host_decode_resize([img_path], self.height, self.width)
        return imgs[0], pid, camid


class VideoClipDataset:
    """Host-side per-tracklet item assembly."""

    _instance_counter = 0

    def __init__(
        self,
        tracklets: list,
        seq_len: int = 8,
        sample: str = "evenly",
        height: int = 256,
        width: int = 128,
        pose_info: dict | None = None,
        num_split: int = 4,
        num_parts: int = 3,
        num_scale: int = 1,
        pyramid_part: bool = True,
        enable_pose: bool = True,
        max_len: int = 1000,
        key_fn=None,
        cache_frames: bool = False,
        cache: BoundedCache | None = None,
        cache_bytes: int | None = None,
        disk_cache: FrameDiskCache | str | None = None,
        decode_threads: int | None = None,
        decode: str = "auto",
    ):
        self.tracklets = tracklets
        self.seq_len = seq_len
        self.sample = sample
        self.height = height
        self.width = width
        self.pose_info = pose_info if pose_info is not None else {}
        self.max_len = max_len
        # RAM reuse across epochs (opt-in): ONE byte-capped LRU holds both
        # decoded frames (key = image path; shareable across datasets) and,
        # for deterministic eval samplers (evenly/all/dense/skipdense never
        # consume rng), whole assembled items (key = (tag, index)) so
        # repeat epochs skip decode, graph build AND frame stacking.
        # `cache_bytes` caps the budget (None = unbounded, round-2
        # behavior); pass a shared `cache` so several datasets draw from
        # one budget with one LRU order.
        if cache is None and cache_frames:
            cache = BoundedCache(cache_bytes)
        self.cache = cache
        self._cache_items = sample in ("evenly", "all", "dense", "skipdense")
        # monotonic tag, NOT id(self): CPython reuses addresses, so a new
        # dataset could otherwise read a dead dataset's cached items out
        # of a shared longer-lived cache
        VideoClipDataset._instance_counter += 1
        self._item_tag = f"item:{VideoClipDataset._instance_counter}"
        # persistent decoded-frame store (see data.cache.FrameDiskCache):
        # survives processes; decode is paid once per machine per dataset
        if isinstance(disk_cache, str):
            disk_cache = FrameDiskCache(
                disk_cache, height, width,
                decoder=effective_decoder(decode),
            )
        self.disk_cache = disk_cache
        # native-decoder OpenMP width: None = resolved by the ClipLoader
        # (hardware default when it runs single-worker, 1 under its pool)
        self.decode_threads = decode_threads
        # decoder choice (auto/native/pil) — see transforms.host_decode_resize;
        # "pil" reproduces the reference's pixels exactly for migrated weights
        self.decode = decode
        self.graph_builder = GraphBuilder(
            num_split=num_split,
            num_parts=num_parts,
            num_scale=num_scale,
            pyramid_part=pyramid_part,
            enable_pose=enable_pose,
        )
        self.key_fn = key_fn or pose_key_for_path

    def __len__(self):
        return len(self.tracklets)

    @property
    def num_vertices(self):
        return self.graph_builder.num_vertices(self.seq_len)

    def _clip_adj(self, paths, sizes):
        if not self.graph_builder.enable_pose:
            # size by the ACTUAL clip length: under `--test-sample all` a
            # clip carries the whole tracklet (len != seq_len), and the
            # bucketed evaluator derives vertices-per-frame from the
            # adjacency shape (engine/evaluator.py)
            return self.graph_builder.ones(len(paths))
        keys = []
        for p in paths:
            try:
                keys.append(self.key_fn(p))
            except Exception:
                keys.append(None)  # unparseable path -> empty part sets
        # missing/malformed poses degrade per frame (reference fallback,
        # dataset_loader.py:332-333) — from_pose_dict owns that contract
        return self.graph_builder.from_pose_dict(keys, sizes, self.pose_info)

    def get_item(self, index: int, rng: np.random.RandomState | None = None):
        if self.cache is not None and self._cache_items:
            key = (self._item_tag, index)
            hit = self.cache.get(key)
            if hit is not None:
                return hit
            item = self._build_item(index, rng)
            self.cache[key] = item
            return item
        return self._build_item(index, rng)

    def peek_or_build(self, index: int, rng=None):
        """get_item without the item-cache WRITE: reuses an existing item
        entry (e.g. written by a shuffled loader over this dataset) but
        never stores one — the caller (ClipLoader's batch cache) holds the
        same bytes in collated form, and a second copy would double the
        budget for no reuse."""
        if self.cache is not None and self._cache_items:
            hit = self.cache.get((self._item_tag, index))
            if hit is not None:
                return hit
        return self._build_item(index, rng)

    def _build_item(self, index: int, rng: np.random.RandomState | None = None):
        img_paths, pid, camid = self.tracklets[index]
        num = min(len(img_paths), self.max_len)
        img_paths = img_paths[:num]
        indices = sample_clip_indices(num, self.seq_len, self.sample, rng, self.max_len)

        chosen = [img_paths[int(i)] for i in indices]
        # when whole items are cached the frame cache would hold a second
        # decoded copy of every frame for no reuse — skip it
        frame_cache = self.cache if not self._cache_items else None
        imgs, sizes = host_decode_resize(
            chosen, self.height, self.width, cache=frame_cache,
            disk_cache=self.disk_cache,
            threads=1 if self.decode_threads is None else self.decode_threads,
            decode=self.decode,
        )

        if self.sample in ("dense", "skipdense"):
            n = len(indices) // self.seq_len
            imgs = imgs.reshape(n, self.seq_len, *imgs.shape[1:])
            adjs = np.stack(
                [
                    self._clip_adj(
                        chosen[i * self.seq_len : (i + 1) * self.seq_len],
                        sizes[i * self.seq_len : (i + 1) * self.seq_len],
                    )
                    for i in range(n)
                ]
            )
            return imgs, pid, camid, adjs
        adj = self._clip_adj(chosen, sizes)
        return imgs, pid, camid, adj


class ClipLoader:
    """Batched iterator with a thread pool for decode parallelism.

    `sampler` yields dataset indices (e.g. RandomIdentitySamplerV1); when
    None, iterates sequentially (test loaders, driver :239-247)."""

    def __init__(
        self,
        dataset: VideoClipDataset,
        batch_size: int,
        sampler=None,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        seed: int | None = None,
        process_shard: tuple[int, int] | None = None,
        malloc_tuning: bool = False,
    ):
        """`process_shard=(process_id, num_processes)`: multi-host data
        loading — every host runs the SAME (identically seeded) sampler but
        materializes only its contiguous `batch_size/num_processes` slice of
        each batch; parallel.mesh.put_global reassembles the global batch
        from the per-host shards.

        `malloc_tuning=True` applies utils.hostmem.tune_malloc_for_streaming
        — a PROCESS-WIDE glibc policy (freed heap blocks up to 1 GB are
        retained for reuse instead of returned to the OS). It makes batch
        buffers land on warm pages, which dominates throughput on
        lazily-faulting VMs; the CLI and bench opt in explicitly. Off by
        default so merely constructing a loader inside a larger service
        never changes that process's allocator behavior."""
        if malloc_tuning:
            from agrl_tpu.utils.hostmem import tune_malloc_for_streaming

            tune_malloc_for_streaming()  # batch buffers reuse warm heap pages
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        # decode parallelism placement: with a worker pool, each native
        # decode call stays single-threaded (the pool IS the parallelism);
        # single-worker loading hands the full core budget to the decoder's
        # own OpenMP team instead (threads=0 = hardware default)
        if getattr(dataset, "decode_threads", 1) is None:
            dataset.decode_threads = 0 if self.num_workers == 1 else 1
        self.rng = np.random.RandomState(seed)
        if process_shard is not None:
            pid, nproc = process_shard
            assert 0 <= pid < nproc
            assert batch_size % nproc == 0, (
                f"batch {batch_size} must divide over {nproc} processes"
            )
        self.process_shard = process_shard

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        nb = n // self.batch_size
        rem = n % self.batch_size
        if self.drop_last:
            return nb
        if rem and self.process_shard is not None and rem < self.process_shard[1]:
            # a ragged tail smaller than the process count yields nothing
            return nb
        return nb + (1 if rem else 0)

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idxs)
        return idxs.tolist()

    def __iter__(self):
        indices = self._indices()
        nb = len(indices) // self.batch_size
        rem = len(indices) % self.batch_size
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        if rem and not self.drop_last:
            batches.append(indices[nb * self.batch_size :])

        # per-item rng seeds drawn from the GLOBAL batch stream first, so a
        # sharded host sees the same seed an unsharded run would assign to
        # that item (identical sampler+rng state on every host)
        seeded = [
            (b, self.rng.randint(0, 2**31 - 1, size=len(b))) for b in batches
        ]
        if self.process_shard is not None:
            # each host keeps its contiguous slice of every batch (ragged
            # tails drop the indivisible remainder)
            pid, nproc = self.process_shard
            sharded = []
            for b, s in seeded:
                k = len(b) // nproc
                if k:
                    sharded.append((b[pid * k : (pid + 1) * k], s[pid * k : (pid + 1) * k]))
            seeded = sharded

        # Deterministic loaders (no sampler, no shuffle, rng-free sampling
        # strategy) yield byte-identical batches every epoch, so the
        # COLLATED batch is cached whole: a warm epoch then costs one LRU
        # lookup per batch instead of 64 item gets + a 50 MB np.stack —
        # this is what makes repeat evals (the driver evaluates every
        # --eval-step epochs on the same query/gallery) host-free. Keyed
        # by the member indices, so different batch sizes / process shards
        # over one dataset never collide. Cached batches are yielded by
        # reference: consumers treat loader output as read-only (all
        # engine paths only device_put or copy out of it).
        cache = getattr(self.dataset, "cache", None)
        batch_cacheable = (
            self.sampler is None
            and not self.shuffle
            and cache is not None
            and getattr(self.dataset, "_cache_items", False)
        )
        pool = (
            ThreadPoolExecutor(max_workers=self.num_workers)
            if self.num_workers > 1
            else None
        )
        try:
            for batch_idxs, seeds in seeded:
                if batch_cacheable:
                    key = (self.dataset._item_tag, "batch", tuple(batch_idxs))
                    hit = cache.get(key)
                    if hit is not None:
                        yield hit
                        continue
                    # build items WITHOUT the per-item cache write (the
                    # collated batch below holds the same bytes), but DO
                    # read any existing item entries
                    build = self.dataset.peek_or_build
                else:
                    build = self.dataset.get_item
                if pool is None:
                    # single-worker fast path skips the thread pool (on a
                    # 1-core TPU host the pool only adds contention)
                    items = [
                        build(i, np.random.RandomState(s))
                        for i, s in zip(batch_idxs, seeds)
                    ]
                else:
                    items = list(
                        pool.map(
                            lambda a: build(a[0], np.random.RandomState(a[1])),
                            zip(batch_idxs, seeds),
                        )
                    )
                batch = self._collate(items)
                if batch_cacheable:
                    cache[key] = batch
                yield batch
        finally:
            if pool is not None:
                # cancel queued work, then WAIT for in-flight build() calls:
                # a consumer that abandons the generator mid-batch
                # (GeneratorExit) may close the dataset's FrameDiskCache
                # next — an unawaited worker would race its pread fd
                pool.shutdown(wait=True, cancel_futures=True)

    @staticmethod
    def _collate(items):
        imgs = np.stack([it[0] for it in items])
        pids = np.asarray([it[1] for it in items], dtype=np.int32)
        camids = np.asarray([it[2] for it in items], dtype=np.int32)
        if len(items[0]) < 4:  # ImageDataset items carry no adjacency
            adjs = np.ones((len(items), 1, 1), dtype=np.float32)
        else:
            adjs = np.stack([it[3] for it in items]).astype(np.float32)
        return imgs, pids, camids, adjs


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Overlap host batch assembly + H2D transfer with device compute.

    Wraps a batch iterator: up to `size` upcoming batches are device_put
    (optionally with a sharding) while the current step runs — the JAX
    equivalent of DataLoader's pin_memory+workers overlap."""
    import collections

    import jax

    queue = collections.deque()

    from agrl_tpu.parallel.mesh import put_global

    def put(batch):
        if sharding is not None:
            return tuple(put_global(a, s) for a, s in zip(batch, sharding))
        return tuple(jax.device_put(a) for a in batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
