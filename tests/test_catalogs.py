"""Real dataset catalog parsers exercised on synthesized on-disk formats.

Each fixture reproduces the REAL dataset's metadata layout (MARS .mat
files + name lists, iLIDS-VID 10-fold .mat splits, PRID2011 split json,
DukeMTMC-VideoReID directory walk with both filename formats) so the
parsing logic a user hits with the actual data is tested, not just the
synthetic fixture dataset.
"""

import json
import os
import os.path as osp

import numpy as np
import pytest
from scipy.io import savemat

from agrl_tpu.data.datasets import init_vidreid_dataset


def touch(path):
    os.makedirs(osp.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"x")


# ---------------------------------------------------------------------------
# MARS
# ---------------------------------------------------------------------------


def make_mars(root):
    """2 train pids (7, 9) x 2 tracklets; test pids (11, 12, -1) with the
    distractor excluded from the query index."""
    d = osp.join(root, "mars")
    info = osp.join(d, "info")
    os.makedirs(info, exist_ok=True)

    def names_for(pid, cam, tid, n):
        return [f"{pid:04d}C{cam}T{tid:04d}F{f + 1:03d}.jpg" for f in range(n)]

    train_names, train_rows = [], []
    start = 1
    for pid, cam, tid, n in [(7, 1, 1, 3), (7, 2, 2, 4), (9, 1, 1, 3), (9, 3, 2, 2)]:
        ns = names_for(pid, cam, tid, n)
        train_names += ns
        train_rows.append([start, start + n - 1, pid, cam])
        start += n

    test_names, test_rows = [], []
    start = 1
    for pid, cam, tid, n in [(11, 1, 1, 3), (11, 2, 1, 3), (12, 4, 1, 2), (-1, 5, 1, 2)]:
        ns = names_for(pid if pid > 0 else 0, cam, tid, n)
        if pid < 0:  # distractor names use the 0000/00-1 prefix in MARS
            ns = [f"00-1C{cam}T{1:04d}F{f + 1:03d}.jpg" for f in range(n)]
        test_names += ns
        test_rows.append([start, start + n - 1, pid, cam])
        start += n

    with open(osp.join(info, "train_name.txt"), "w") as f:
        f.write("\n".join(train_names) + "\n")
    with open(osp.join(info, "test_name.txt"), "w") as f:
        f.write("\n".join(test_names) + "\n")
    savemat(
        osp.join(info, "tracks_train_info.mat"),
        {"track_train_info": np.asarray(train_rows, np.int64)},
    )
    savemat(
        osp.join(info, "tracks_test_info.mat"),
        {"track_test_info": np.asarray(test_rows, np.int64)},
    )
    # query = tracklets 1 and 3 (1-based into the test rows)
    savemat(osp.join(info, "query_IDX.mat"), {"query_IDX": np.asarray([[1, 3]])})
    return d


def test_mars_catalog(tmp_path):
    make_mars(str(tmp_path))
    ds = init_vidreid_dataset("mars", root=str(tmp_path), verbose=False, use_pose=False)
    assert ds.num_train_pids == 2
    assert len(ds.train) == 4
    # relabel: labels are 0..1; camids shift to 0-based
    labels = sorted({pid for _, pid, _ in ds.train})
    assert labels == [0, 1]
    cams = sorted({cam for _, _, cam in ds.train})
    assert cams == [0, 1, 2]
    # paths: bbox_train/<pid-prefix>/<name>
    paths0 = ds.train[0][0]
    assert len(paths0) == 3 and "bbox_train" in paths0[0] and "0007" in paths0[0]
    # gallery = ALL test tracklets (incl. the -1 distractor); query subset
    assert len(ds.gallery) == 4
    assert len(ds.query) == 2
    assert {pid for _, pid, _ in ds.query} == {11, 12}
    assert -1 in {pid for _, pid, _ in ds.gallery}


def test_mars_integrity_assert_fires(tmp_path):
    d = make_mars(str(tmp_path))
    # corrupt: tracklet 1 spans two different persons
    with open(osp.join(d, "info", "train_name.txt")) as f:
        names = f.read().splitlines()
    names[1] = "0008" + names[1][4:]
    with open(osp.join(d, "info", "train_name.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with pytest.raises(AssertionError, match="different person"):
        init_vidreid_dataset("mars", root=str(tmp_path), verbose=False, use_pose=False)


# ---------------------------------------------------------------------------
# iLIDS-VID
# ---------------------------------------------------------------------------


def test_ilidsvid_catalog(tmp_path):
    root = str(tmp_path)
    d = osp.join(root, "ilids-vid")
    seq = osp.join(d, "i-LIDS-VID", "sequences")
    for cam in ("cam1", "cam2"):
        for i in range(1, 301):
            touch(osp.join(seq, cam, f"person{i:03d}", "frame0001.png"))
            touch(osp.join(seq, cam, f"person{i:03d}", "frame0002.png"))
    # ls_set: 10 rows of 1-based permutations; first half = TEST ids
    rng = np.random.RandomState(0)
    ls = np.stack([rng.permutation(300) + 1 for _ in range(10)])
    os.makedirs(osp.join(d, "train-test people splits"), exist_ok=True)
    savemat(
        osp.join(d, "train-test people splits", "train_test_splits_ilidsvid.mat"),
        {"ls_set": ls},
    )

    ds = init_vidreid_dataset(
        "ilidsvid", root=root, split_id=3, verbose=False, use_pose=False
    )
    assert ds.num_train_pids == 150 and ds.num_query_pids == 150
    assert len(ds.train) == 300  # 150 ids x 2 cams
    assert len(ds.query) == 150 and len(ds.gallery) == 150
    # query strictly cam1 (camid 0), gallery strictly cam2 (camid 1)
    assert {c for _, _, c in ds.query} == {0}
    assert {c for _, _, c in ds.gallery} == {1}
    # split derivation matches the mat row: test = sorted first half
    test_dirs = sorted(f"person{int(i):03d}" for i in ls[3][:150])
    q0_dir = osp.basename(osp.dirname(ds.query[0][0][0]))
    assert q0_dir == test_dirs[0]
    # splits.json caching: second construction reuses it
    assert osp.exists(osp.join(d, "splits.json"))
    ds2 = init_vidreid_dataset(
        "ilidsvid", root=root, split_id=3, verbose=False, use_pose=False
    )
    assert [t[1] for t in ds2.query] == [t[1] for t in ds.query]


def _build_ilids_tree(root, n_ids=300):
    # 300 ids: the split converter asserts the real dataset's shape
    """Tiny iLIDS-VID directory tree + split .mat under `root`."""
    d = osp.join(root, "ilids-vid")
    seq = osp.join(d, "i-LIDS-VID", "sequences")
    for cam in ("cam1", "cam2"):
        for i in range(1, n_ids + 1):
            touch(osp.join(seq, cam, f"person{i:03d}", "frame0001.png"))
    rng = np.random.RandomState(0)
    ls = np.stack([rng.permutation(n_ids) + 1 for _ in range(10)])
    os.makedirs(osp.join(d, "train-test people splits"), exist_ok=True)
    savemat(
        osp.join(d, "train-test people splits", "train_test_splits_ilidsvid.mat"),
        {"ls_set": ls},
    )
    return d


def test_ilidsvid_download_path(tmp_path, monkeypatch):
    """download=True fetches + extracts the tar when the dataset dir is
    missing (reference ilidsvid.py:119-133). Network is mocked: the
    'downloaded' tar is a locally built fixture."""
    import tarfile

    import agrl_tpu.data.datasets.ilidsvid as mod

    # build the fixture tree elsewhere, tar it up as the fake remote file
    src_root = str(tmp_path / "remote")
    d = _build_ilids_tree(src_root)
    tar_path = str(tmp_path / "iLIDS-VID.tar")
    with tarfile.open(tar_path, "w") as tar:
        tar.add(osp.join(d, "i-LIDS-VID"), arcname="i-LIDS-VID")
        tar.add(
            osp.join(d, "train-test people splits"),
            arcname="train-test people splits",
        )

    calls = []

    def fake_urlretrieve(url, fpath):
        calls.append(url)
        import shutil

        shutil.copy(tar_path, fpath)

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)
    dest_root = str(tmp_path / "local")
    ds = init_vidreid_dataset(
        "ilidsvid", root=dest_root, split_id=0, verbose=False,
        use_pose=False, download=True,
    )
    assert calls == [mod.iLIDSVID.dataset_url]
    assert ds.num_train_pids == 150 and ds.num_query_pids == 150
    # second init: dataset present -> no second fetch
    init_vidreid_dataset(
        "ilidsvid", root=dest_root, split_id=0, verbose=False,
        use_pose=False, download=True,
    )
    assert len(calls) == 1


def test_ilidsvid_download_recovers_from_failed_fetch(tmp_path, monkeypatch):
    """An interrupted download must not wedge: the presence check is
    content-based (not the bare dataset dir the first attempt created),
    no partial tar survives, and the next download=True retries the
    fetch and succeeds."""
    import tarfile

    src_root = str(tmp_path / "remote")
    d = _build_ilids_tree(src_root)
    tar_path = str(tmp_path / "iLIDS-VID.tar")
    with tarfile.open(tar_path, "w") as tar:
        tar.add(osp.join(d, "i-LIDS-VID"), arcname="i-LIDS-VID")
        tar.add(
            osp.join(d, "train-test people splits"),
            arcname="train-test people splits",
        )

    import urllib.request

    attempts = []

    def flaky_urlretrieve(url, fpath):
        attempts.append(url)
        if len(attempts) == 1:
            with open(fpath, "wb") as f:
                f.write(b"partial bytes")  # connection died mid-transfer
            raise OSError("connection reset")
        import shutil

        shutil.copy(tar_path, fpath)

    monkeypatch.setattr(urllib.request, "urlretrieve", flaky_urlretrieve)
    dest_root = str(tmp_path / "local")
    with pytest.raises(OSError, match="connection reset"):
        init_vidreid_dataset(
            "ilidsvid", root=dest_root, verbose=False,
            use_pose=False, download=True,
        )
    dataset_dir = osp.join(dest_root, "ilids-vid")
    # no partial tar left behind to be mistaken for a download
    assert not [f for f in os.listdir(dataset_dir) if f.endswith((".tar", ".part"))]
    # retry fetches again (no "already downloaded" wedge) and succeeds
    ds = init_vidreid_dataset(
        "ilidsvid", root=dest_root, verbose=False,
        use_pose=False, download=True,
    )
    assert len(attempts) == 2
    assert ds.num_train_pids == 150


def test_ilidsvid_download_off_by_default(tmp_path):
    with pytest.raises(RuntimeError, match="not available"):
        init_vidreid_dataset(
            "ilidsvid", root=str(tmp_path / "nope"), verbose=False, use_pose=False
        )


# ---------------------------------------------------------------------------
# PRID2011
# ---------------------------------------------------------------------------


def test_prid2011_catalog(tmp_path):
    root = str(tmp_path)
    d = osp.join(root, "prid2011")
    ms = osp.join(d, "prid_2011", "multi_shot")
    people = [f"person_{i:04d}" for i in range(1, 7)]
    for cam in ("cam_a", "cam_b"):
        for p in people:
            for f in range(2):
                touch(osp.join(ms, cam, p, f"{f:04d}.png"))
    splits = [
        {"train": people[:3], "test": people[3:]},
        {"train": people[3:], "test": people[:3]},
    ]
    os.makedirs(d, exist_ok=True)
    with open(osp.join(d, "splits_prid2011.json"), "w") as f:
        json.dump(splits, f)

    ds = init_vidreid_dataset(
        "prid2011", root=root, split_id=1, verbose=False, use_pose=False
    )
    assert ds.num_train_pids == 3
    assert len(ds.train) == 6  # 3 ids x 2 cams
    assert {c for _, _, c in ds.query} == {0}
    assert {c for _, _, c in ds.gallery} == {1}
    # pids are indices within the split's dir list
    assert sorted({pid for _, pid, _ in ds.query}) == [0, 1, 2]
    with pytest.raises(ValueError, match="split_id exceeds"):
        init_vidreid_dataset("prid2011", root=root, split_id=5, verbose=False, use_pose=False)


# ---------------------------------------------------------------------------
# DukeMTMC-VideoReID
# ---------------------------------------------------------------------------


def test_dukemtmcvidreid_catalog(tmp_path):
    root = str(tmp_path)
    base = osp.join(root, "dukemtmc-vidreid", "DukeMTMC-VideoReID")
    # both filename formats; one tracklet with a missing frame index
    touch(osp.join(base, "train", "0148", "0001", "0148_C5_F0001_X1.jpg"))
    touch(osp.join(base, "train", "0148", "0001", "0148_C5_F0002_X2.jpg"))
    touch(osp.join(base, "train", "0152", "0001", "0152C3F0001X9.jpg"))
    touch(osp.join(base, "train", "0152", "0001", "0152C3F0003X9.jpg"))  # F0002 missing
    touch(osp.join(base, "query", "0148", "0002", "0148_C1_F0001_X3.jpg"))
    touch(osp.join(base, "gallery", "0148", "0003", "0148_C2_F0001_X4.jpg"))

    ds = init_vidreid_dataset(
        "dukemtmcvidreid", root=root, verbose=False, use_pose=False
    )
    assert ds.num_train_pids == 2
    assert len(ds.train) == 2 and len(ds.query) == 1 and len(ds.gallery) == 1
    by_cam = {cam for _, _, cam in ds.train}
    assert by_cam == {4, 2}  # C5 and C3, 0-based
    # the missing-index tracklet keeps only the frames it found
    lens = sorted(len(p) for p, _, _ in ds.train)
    assert lens == [1, 2]
    assert ds.query[0][2] == 0 and ds.gallery[0][2] == 1
    # split caching round-trip: second load reads the json
    ds2 = init_vidreid_dataset(
        "dukemtmcvidreid", root=root, verbose=False, use_pose=False
    )
    assert ds2.train == ds.train


def test_ilidsvid_download_recovers_from_failed_extraction(tmp_path, monkeypatch):
    """An extraction interrupted partway (ADVICE r04: tar.extractall dies
    after creating some top-level dirs) must not wedge: extraction goes to
    a temp dir promoted only when complete, so the next download=True run
    re-fetches and succeeds instead of cataloging a truncated tree."""
    import tarfile

    src_root = str(tmp_path / "remote")
    d = _build_ilids_tree(src_root)
    tar_path = str(tmp_path / "iLIDS-VID.tar")
    with tarfile.open(tar_path, "w") as tar:
        tar.add(osp.join(d, "i-LIDS-VID"), arcname="i-LIDS-VID")
        tar.add(
            osp.join(d, "train-test people splits"),
            arcname="train-test people splits",
        )

    import urllib.request

    def fake_urlretrieve(url, fpath):
        import shutil

        shutil.copy(tar_path, fpath)

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)

    orig_extractall = tarfile.TarFile.extractall
    calls = []

    def dying_extractall(self, path=None, members=None, **kw):
        calls.append(1)
        if len(calls) == 1:
            # extract only the FIRST top-level entry, then die mid-way
            first = self.getmembers()[: len(self.getmembers()) // 2]
            orig_extractall(self, path=path, members=first, **kw)
            raise OSError("disk full")
        return orig_extractall(self, path=path, members=members, **kw)

    monkeypatch.setattr(tarfile.TarFile, "extractall", dying_extractall)
    dest_root = str(tmp_path / "local")
    with pytest.raises(OSError, match="disk full"):
        init_vidreid_dataset(
            "ilidsvid", root=dest_root, verbose=False,
            use_pose=False, download=True,
        )
    # neither content dir was promoted -> no 'already downloaded' wedge
    dataset_dir = osp.join(dest_root, "ilids-vid")
    assert not (
        osp.exists(osp.join(dataset_dir, "i-LIDS-VID"))
        and osp.exists(osp.join(dataset_dir, "train-test people splits"))
    )
    ds = init_vidreid_dataset(
        "ilidsvid", root=dest_root, verbose=False,
        use_pose=False, download=True,
    )
    assert len(calls) == 2  # retried the extraction
    assert ds.num_train_pids == 150
