"""Disk cache for expensive trained test fixtures (VERDICT r04 weak #5 /
item 7: compile-heavy module fixtures re-trained every run, pushing the
full suite to ~41 min).

A fixture is cached under /tmp/agrl_test_fixtures keyed by a SHA-256 over
(a) the source files whose behavior produced it and (b) a caller-supplied
version/params tag. Any change to those files re-trains — a training-path
regression can never hide behind a stale cached fixture — while repeat
runs of an unchanged tree skip straight to scoring.
"""

from __future__ import annotations

import hashlib
import os
import os.path as osp
import pickle

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
CACHE_DIR = os.environ.get("AGRL_TEST_FIXTURE_DIR", "/tmp/agrl_test_fixtures")


def code_hash(rel_paths, tag: str = "") -> str:
    h = hashlib.sha256(tag.encode())
    for rel in sorted(rel_paths):
        p = rel if osp.isabs(rel) else osp.join(REPO, rel)
        h.update(rel.encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:24]


def disk_cached(name: str, rel_paths, tag: str, builder):
    """Return builder()'s result, loading/storing a pickle keyed by the
    contents of `rel_paths` (repo-relative) + `tag`. The builder must
    return plain numpy/python data (device arrays don't survive pickling
    across backends — convert with jax.tree.map(np.asarray, ...))."""
    key = code_hash(rel_paths, f"{name}:{tag}")
    path = osp.join(CACHE_DIR, f"{name}-{key}.pkl")
    if osp.exists(path):
        try:
            with open(path, "rb") as f:
                return pickle.load(f)
        except Exception:
            os.remove(path)  # corrupt/interrupted write: rebuild
    out = builder()
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(out, f)
    os.replace(tmp, path)  # atomic: parallel runs never see a torn file
    return out


# the files whose behavior shapes a TRAINED vmgn_tiny fixture: the train
# step, the model stack, the optimizer, the losses, and the input pipeline
TRAIN_PATH_KEYS = [
    "agrl_tpu/engine/trainer.py",
    "agrl_tpu/engine/train_state.py",
    "agrl_tpu/models/__init__.py",
    "agrl_tpu/models/vmgn.py",
    "agrl_tpu/models/layers.py",
    "agrl_tpu/models/backbone.py",
    "agrl_tpu/optim/optimizers.py",
    "agrl_tpu/optim/schedules.py",
    "agrl_tpu/losses/__init__.py",
    "agrl_tpu/data/loader.py",
    "agrl_tpu/data/sampling.py",
    "agrl_tpu/data/samplers.py",
    "agrl_tpu/data/transforms.py",
    "agrl_tpu/data/graph.py",
    "agrl_tpu/data/pose.py",
    "agrl_tpu/data/datasets/synthetic_mars.py",
]
