import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from semantic_slam_mapping_tpu.config import SegNetConfig
from semantic_slam_mapping_tpu.models import segnet

CFG = SegNetConfig(input_height=64, input_width=96, num_classes=12)


@pytest.fixture(scope="module")
def model_and_vars():
    return segnet.create(CFG, seed=0)


def test_pool_unpool_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    pooled, onehot = segnet.max_pool_with_indices(x)
    assert pooled.shape == (2, 4, 4, 4)
    assert onehot.shape == (2, 4, 4, 4, 4)
    # exactly one index per window
    np.testing.assert_allclose(np.asarray(onehot.sum(3)), 1.0)
    up = segnet.max_unpool(pooled, onehot)
    assert up.shape == x.shape
    # unpooled equals x at the max positions, 0 elsewhere
    mask = np.asarray(up) != 0
    np.testing.assert_allclose(np.asarray(up)[mask],
                               np.asarray(x)[mask], rtol=1e-6)
    assert mask.reshape(2, 4, 2, 4, 2, 4).sum() <= 2 * 4 * 4 * 4


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 64, 96, 3))
    labels = segnet.infer(model, variables, x)
    assert labels.shape == (2, 64, 96)
    assert labels.dtype == jnp.int32
    assert int(labels.max()) < CFG.num_classes


def test_train_step_reduces_loss(model_and_vars):
    model, variables = model_and_vars
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(segnet.make_train_step(model, opt))

    # trivial task: left half class 4, right half class 1, tied to input
    x = jnp.zeros((2, 64, 96, 3)).at[:, :, 48:, 0].set(1.0)
    y = jnp.full((2, 64, 96), 4, jnp.int32).at[:, :, 48:].set(1)

    losses = []
    for _ in range(8):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_infer_batch_parallel_shapes(model_and_vars):
    """DP over frames: vmap/batched inference matches single-frame."""
    model, variables = model_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 64, 96, 3))
    # at random init the logits are near-degenerate, so compare the logits
    # themselves (argmax would be tie-breaking noise)
    lb = model.apply(variables, x, train=False)
    ls = model.apply(variables, x[1:2], train=False)
    scale = float(np.abs(np.asarray(ls)).max()) + 1e-9
    diff = float(np.abs(np.asarray(lb[1] - ls[0])).max())
    assert diff < 0.05 * scale + 1e-6, (diff, scale)
