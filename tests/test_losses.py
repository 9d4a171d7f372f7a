"""Loss parity tests vs per-anchor loop oracles and torch."""

import jax.numpy as jnp
import numpy as np
import pytest

from agrl_tpu.losses import (
    batch_hard_triplet,
    cross_entropy_label_smooth,
    deep_supervision,
    hard_mine,
    pairwise_euclidean,
)


def test_xent_label_smooth_oracle():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 10).astype(np.float32)
    labels = rng.randint(0, 10, 8)
    got = float(cross_entropy_label_smooth(jnp.asarray(logits), jnp.asarray(labels)))
    # numpy oracle of the reference formula
    x = logits - logits.max(axis=1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(axis=1, keepdims=True))
    onehot = np.eye(10)[labels]
    t = 0.9 * onehot + 0.1 / 10
    want = (-t * logp).mean(axis=0).sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_xent_matches_torch_cross_entropy_at_zero_smoothing():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    logits = rng.randn(6, 7).astype(np.float32)
    labels = rng.randint(0, 7, 6)
    got = float(
        cross_entropy_label_smooth(jnp.asarray(logits), jnp.asarray(labels), epsilon=0.0)
    )
    want = float(
        torch.nn.functional.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pairwise_euclidean_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(10, 16).astype(np.float32)
    got = np.asarray(pairwise_euclidean(jnp.asarray(x)))
    want = np.sqrt(
        np.maximum(((x[:, None] - x[None]) ** 2).sum(-1), 1e-12)
    )
    off = ~np.eye(10, dtype=bool)
    np.testing.assert_allclose(got[off], want[off], atol=1e-4)
    # the diagonal is sqrt(clamped fp32 cancellation noise): only require
    # it to be tiny relative to real distances
    assert np.abs(np.diag(got)).max() < 5e-3


def test_hard_mine_loop_oracle():
    rng = np.random.RandomState(0)
    labels = np.repeat(np.arange(4), 4)  # P=4, K=4
    dist = rng.rand(16, 16).astype(np.float32)
    d_ap, d_an = hard_mine(jnp.asarray(dist), jnp.asarray(labels))
    for i in range(16):
        same = labels == labels[i]
        assert float(d_ap[i]) == pytest.approx(dist[i][same].max())
        assert float(d_an[i]) == pytest.approx(dist[i][~same].min())


@pytest.mark.parametrize("soft", [True, False])
def test_triplet_loop_oracle(soft):
    rng = np.random.RandomState(0)
    labels = np.repeat(np.arange(4), 4)
    feats = rng.randn(16, 32).astype(np.float32)
    got = float(
        batch_hard_triplet(jnp.asarray(feats), jnp.asarray(labels), margin=0.3, soft=soft)
    )
    dist = np.sqrt(np.maximum(((feats[:, None] - feats[None]) ** 2).sum(-1), 1e-12))
    aps, ans = [], []
    for i in range(16):
        same = labels == labels[i]
        aps.append(dist[i][same].max())
        ans.append(dist[i][~same].min())
    aps, ans = np.asarray(aps), np.asarray(ans)
    if soft:
        want = np.log1p(np.exp(aps - ans)).mean()
    else:
        want = np.maximum(0.0, 0.3 + aps - ans).mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_triplet_separated_clusters_is_near_zero():
    labels = np.array([0, 0, 1, 1])
    feats = np.array([[0.0, 0], [0.1, 0], [100, 0], [100.1, 0]], dtype=np.float32)
    loss = float(batch_hard_triplet(jnp.asarray(feats), jnp.asarray(labels), soft=True))
    assert loss < 1e-4


def test_deep_supervision_averages_heads():
    def crit(x, y):
        return jnp.sum(x) + jnp.sum(y) * 0

    xs = [jnp.ones(3), jnp.ones(3) * 3]
    got = float(deep_supervision(crit, xs, jnp.zeros(3)))
    assert got == pytest.approx((3 + 9) / 2)
    assert float(deep_supervision(crit, jnp.ones(3), jnp.zeros(3))) == pytest.approx(3)
