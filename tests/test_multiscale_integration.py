"""num_scale > 1 integration: the multiscale adjacency built by the data
layer matches the vertex count MSPPGN consumes (3 feature levels)."""

import jax
import jax.numpy as jnp
import numpy as np

from agrl_tpu.data.graph import GraphBuilder
from agrl_tpu.models.graphnet import MSPyraPartGraphNet


def test_msppgn_consumes_multiscale_adjacency():
    S = 4
    gb = GraphBuilder(num_split=2, pyramid_part=True, num_scale=3)
    model = MSPyraPartGraphNet(
        num_classes=5, layers=(1, 1, 1, 1), num_split=2, num_gb=1
    )
    # data-layer vertex count (num_scale * S * total_split) must equal the
    # model's (3 levels * total_split * S)
    assert gb.num_vertices(S) == 3 * model.total_split * S

    rng = np.random.RandomState(0)
    poses = np.zeros((S, 18, 3))
    poses[..., 0] = rng.uniform(0, 32, (S, 18))
    poses[..., 1] = rng.uniform(0, 64, (S, 18))
    poses[..., 2] = rng.uniform(0.2, 1.0, (S, 18))
    adj = gb(poses, np.full(S, 64.0))
    V = adj.shape[0]

    x = jnp.asarray(rng.rand(2, S, 64, 32, 3), jnp.float32)
    adj_b = jnp.asarray(np.stack([adj, adj]))
    variables = jax.jit(
        lambda x, a: model.init({"params": jax.random.PRNGKey(0)}, x, a, train=True)
    )(x, adj_b)
    feats = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))(
        variables, x, adj_b
    )
    assert feats.shape == (2, 2 * 512)  # (num_gb+1) * num_hid
    assert adj_b.shape == (2, V, V)
