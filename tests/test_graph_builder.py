"""Parity tests: vectorized pose->adjacency vs the reference-semantics
set/bisect/permutations oracle."""

import numpy as np
import pytest

from agrl_tpu.data.graph import GraphBuilder, build_adjacency, pyramid_expansion_map
from agrl_tpu.utils.reidtools import calc_splits

from .oracles import graph_oracle


def random_poses(rng, seq_len, height=256, width=128, conf_drop=0.3):
    poses = np.zeros((seq_len, 18, 3))
    poses[..., 0] = rng.uniform(0, width, size=(seq_len, 18))
    poses[..., 1] = rng.uniform(-10, height + 10, size=(seq_len, 18))  # include out-of-bounds
    poses[..., 2] = rng.uniform(0, 1, size=(seq_len, 18))
    poses[rng.rand(seq_len, 18) < conf_drop, 2] = 0.0
    return poses


@pytest.mark.parametrize("num_split,pyramid", [(4, True), (4, False), (8, True), (2, True), (1, True)])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_adjacency_parity(num_split, pyramid, seed):
    rng = np.random.RandomState(seed)
    S = 8
    poses = random_poses(rng, S)
    heights = np.full(S, 256.0)
    got = build_adjacency(poses, heights, num_split=num_split, num_scale=1, pyramid_part=pyramid)
    want = graph_oracle([poses[i] for i in range(S)], heights, num_split, 1, pyramid)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("num_scale", [1, 2, 3])
def test_multiscale_parity(num_scale):
    rng = np.random.RandomState(3)
    S = 4
    poses = random_poses(rng, S)
    heights = np.full(S, 200.0)
    got = build_adjacency(poses, heights, num_split=4, num_scale=num_scale, pyramid_part=True)
    want = graph_oracle([poses[i] for i in range(S)], heights, 4, num_scale, True)
    np.testing.assert_array_equal(got, want)
    ts = sum(calc_splits(4))
    assert got.shape == (num_scale * S * ts,) * 2


def test_adjacent_method_parity():
    rng = np.random.RandomState(5)
    S = 4
    poses = random_poses(rng, S)
    heights = np.full(S, 256.0)
    got = build_adjacency(poses, heights, num_split=4, pyramid_part=True, method="adjacent")
    want = graph_oracle([poses[i] for i in range(S)], heights, 4, 1, True, method="adjacent")
    np.testing.assert_array_equal(got, want)


def test_missing_pose_gives_empty_graph():
    S = 4
    poses = np.zeros((S, 18, 3))  # all conf 0 -> no stripes
    heights = np.full(S, 256.0)
    adj = build_adjacency(poses, heights, num_split=4, pyramid_part=True)
    assert adj.sum() == 0


def test_variable_heights_parity():
    rng = np.random.RandomState(9)
    S = 6
    poses = random_poses(rng, S)
    heights = rng.randint(128, 512, size=S).astype(np.float64)
    got = build_adjacency(poses, heights, num_split=4, pyramid_part=True)
    want = graph_oracle([poses[i] for i in range(S)], heights, 4, 1, True)
    np.testing.assert_array_equal(got, want)


def test_pyramid_map_example():
    # num_split=8, k=3: stripe {1} -> {1, 9, 13, 15} (dataset_loader.py:364 comment)
    m = pyramid_expansion_map(8, True)
    assert set(np.nonzero(m[0])[0] + 1) == {1, 9, 13, 15}
    # {3} -> {3, 10, 13, 15}: ceil(3/2)+8=10, ceil(3/4)+12=13, ceil(3/8)+14=15
    assert set(np.nonzero(m[2])[0] + 1) == {3, 10, 13, 15}


def test_builder_ones_fallback():
    gb = GraphBuilder(num_split=4, pyramid_part=True, num_scale=2, enable_pose=False)
    adj = gb(np.zeros((8, 18, 3)), np.full(8, 256.0))
    assert adj.shape == (2 * 8 * 7, 2 * 8 * 7)
    assert (adj == 1).all()


def test_from_pose_dict_missing_keys():
    gb = GraphBuilder(num_split=4, pyramid_part=True)
    rng = np.random.RandomState(0)
    pose = random_poses(rng, 1)[0]
    adj = gb.from_pose_dict(
        keys=["a.jpg", "missing.jpg"],
        sizes=[(128, 256), (128, 256)],
        pose_dict={"a.jpg": pose},
    )
    ts = gb.total_split
    # frame 2's vertices have no intra-frame pose edges; frame 1 may
    assert adj.shape == (2 * ts, 2 * ts)


def test_from_pose_dict_malformed_entries_degrade_per_frame():
    """A ragged/short pose entry (detector dropped keypoints) must not
    kill the loader — the reference's bare except degrades that frame to
    empty part sets (dataset_loader.py:332-333); short entries keep the
    keypoints they have."""
    from agrl_tpu.data.graph import GraphBuilder

    gb = GraphBuilder(num_split=4, pyramid_part=True, enable_pose=True)
    good = np.zeros((18, 3))
    good[:, 1] = 64.0
    good[:, 2] = 0.9
    pose_dict = {
        "ok": good,
        "short": good[:17],           # 17 keypoints: used as-is
        "ragged": [[1.0, 2.0], [3.0]],  # unparseable: empty part sets
        "flat": np.arange(10.0),      # wrong rank: empty part sets
        "nulls": [[None, None, None]] * 18,  # JSON nulls: empty part sets
    }
    keys = ["ok", "short", "missing", "ragged", "flat", "nulls", None]
    sizes = [(64, 128)] * len(keys)
    adj = gb.from_pose_dict(keys, sizes, pose_dict)
    V = len(keys) * gb.total_split
    assert adj.shape == (V, V)
    assert np.isfinite(adj).all()
