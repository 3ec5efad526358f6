"""SegNet semantic segmentation in Flax.

Replaces the reference's Caffe-SegNet "driving webdemo" wrapper (reference:
src/segnet.cpp — loads prototxt+caffemodel, 360x480 input, 12-class argmax
label image output, segnet.cpp:65-108; consumed offline via
experiment/segnet.cpp writing segnet_0/ + result_0/ images that
FrameReader re-reads, rgbdframe.cpp:138-180).

Architecture: the SegNet VGG16 encoder-decoder with max-pooling-index
unpooling (Badrinarayanan et al. 2015), 12 output classes. TPU design:
NHWC bf16 activations (MXU-friendly convs), pooling indices kept as 2-bit
window argmax one-hots so unpooling is a fused scatter-free multiply,
batched data-parallel inference over frames (SURVEY.md §2.3 DP row);
`train_step` provides the optax training path (pretrained Caffe weights
are not importable in this zero-egress environment — the class palette and
topology match, weights are trained or loaded from an orbax checkpoint).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import SegNetConfig

# encoder plan: (convs per block, channels) — VGG16
_BLOCKS: Sequence[Tuple[int, int]] = (
    (2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


def max_pool_with_indices(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2x2/2 max pool returning (pooled (B,H/2,W/2,C), one-hot indices
    (B,H/2,W/2,4,C)) — the SegNet pooling-index trick."""
    B, H, W, C = x.shape
    w = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    w = w.reshape(B, H // 2, W // 2, 4, C)
    pooled = jnp.max(w, axis=3)
    onehot = (w >= pooled[:, :, :, None, :]).astype(x.dtype)
    # break ties: keep only the first maximal entry per window
    cum = jnp.cumsum(onehot, axis=3)
    onehot = onehot * (cum <= 1.0).astype(x.dtype)
    return pooled, onehot


def max_unpool(pooled: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`max_pool_with_indices`."""
    B, Hh, Wh, _, C = onehot.shape
    w = pooled[:, :, :, None, :] * onehot
    w = w.reshape(B, Hh, Wh, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return w.reshape(B, Hh * 2, Wh * 2, C)


class ConvBNRelu(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.relu(x)


class SegNet(nn.Module):
    """SegNet-VGG16 with pooling-index unpooling.

    ``width_mult`` scales every block's channel count (rounded to a multiple
    of 8 for TPU lane alignment); 1.0 is the reference topology, the shipped
    synthetic-world checkpoint uses a slim model that fits in the repo."""

    num_classes: int = 12
    dtype: Any = jnp.bfloat16
    width_mult: float = 1.0

    def _ch(self, ch: int) -> int:
        return max(8, int(round(ch * self.width_mult / 8)) * 8)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, 3) float in [0,1]; H, W divisible by 32
        x = x.astype(self.dtype)
        indices = []
        for n_convs, ch in _BLOCKS:
            for _ in range(n_convs):
                x = ConvBNRelu(self._ch(ch), self.dtype)(x, train)
            x, idx = max_pool_with_indices(x)
            indices.append(idx)
        for bi, (n_convs, ch) in enumerate(reversed(_BLOCKS)):
            x = max_unpool(x, indices[-1 - bi])
            # decoder convs mirror the encoder; the last conv of each block
            # transitions to the next (shallower) block's channel count
            next_ch = _BLOCKS[len(_BLOCKS) - 2 - bi][1] if \
                bi < len(_BLOCKS) - 1 else _BLOCKS[0][1]
            for ci in range(n_convs):
                out_ch = ch if ci < n_convs - 1 else next_ch
                x = ConvBNRelu(self._ch(out_ch), self.dtype)(x, train)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        return logits.astype(jnp.float32)


def create(cfg: SegNetConfig = SegNetConfig(), seed: int = 0):
    """Initialize model + params for the configured input size."""
    model = SegNet(num_classes=cfg.num_classes,
                   dtype=jnp.bfloat16 if cfg.dtype == "bfloat16"
                   else jnp.float32,
                   width_mult=cfg.width_mult)
    # input padded to /32: 360x480 -> 384x480 (the reference resizes KITTI
    # frames to 480x360 before inference, experiment/segnet.cpp:58)
    h = -(-cfg.input_height // 32) * 32
    w = -(-cfg.input_width // 32) * 32
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, h, w, 3)), train=False)
    return model, variables


@partial(jax.jit, static_argnames=("model",))
def infer(model: SegNet, variables, images: jnp.ndarray) -> jnp.ndarray:
    """Batched label-image inference: (B, H, W, 3) -> (B, H, W) int32 argmax
    labels (the Classifier::Classify role, segnet.cpp:65-78)."""
    logits = model.apply(variables, images, train=False)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def loss_fn(model: SegNet, params, batch_stats, images, labels,
            label_valid=None, class_weights=None):
    """Per-pixel cross-entropy; returns (loss, new_batch_stats).

    ``class_weights`` (num_classes,) applies per-class pixel weights —
    median-frequency balancing (the SegNet paper's CamVid recipe) keeps
    rare-but-critical classes (Pedestrian) from being drowned out by
    road/building pixels."""
    logits, updates = model.apply(
        {"params": params, "batch_stats": batch_stats}, images, train=True,
        mutable=["batch_stats"])
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, model.num_classes)
    ll = jnp.sum(onehot * logp, axis=-1)
    pix_w = (class_weights[labels] if class_weights is not None
             else jnp.ones_like(ll))
    if label_valid is not None:
        pix_w = jnp.where(label_valid, pix_w, 0.0)
    denom = jnp.maximum(jnp.sum(pix_w), 1e-6)
    return -jnp.sum(pix_w * ll) / denom, updates["batch_stats"]


def median_frequency_weights(label_batches, num_classes: int) -> jnp.ndarray:
    """Median-frequency balancing weights (Badrinarayanan et al. 2015):
    w_c = median(freq) / freq_c over classes that appear; absent classes
    get weight 1."""
    import numpy as np
    counts = np.zeros(num_classes, np.int64)
    for y in label_batches:
        counts += np.bincount(np.asarray(y).ravel(), minlength=num_classes)
    freq = counts / max(counts.sum(), 1)
    present = freq > 0
    med = np.median(freq[present])
    w = np.where(present, med / np.maximum(freq, 1e-12), 1.0)
    return jnp.asarray(w, jnp.float32)


def miou(pred: jnp.ndarray, gt: jnp.ndarray, num_classes: int,
         valid=None) -> jnp.ndarray:
    """Mean intersection-over-union over the classes present in ``gt``
    (the standard CamVid/SegNet quality metric; the reference reports no
    number for its Caffe weights — this framework measures its own)."""
    if valid is None:
        valid = jnp.ones(pred.shape, bool)
    p = jax.nn.one_hot(pred, num_classes) * valid[..., None]
    g = jax.nn.one_hot(gt, num_classes) * valid[..., None]
    axes = tuple(range(pred.ndim))
    inter = jnp.sum(p * g, axis=axes)
    union = jnp.sum(p, axis=axes) + jnp.sum(g, axis=axes) - inter
    present = jnp.sum(g, axis=axes) > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1.0), 0.0)
    return jnp.sum(iou) / jnp.maximum(jnp.sum(present), 1)


def save_checkpoint(path, cfg: SegNetConfig, params, batch_stats,
                    meta: Optional[dict] = None,
                    store_dtype=None) -> None:
    """Pickle params + batch_stats + enough config to rebuild the model.
    ``store_dtype`` (e.g. np.float16) halves shipped-artifact size; the
    loader restores float32 (inference runs bf16 regardless)."""
    import numpy as np
    import pickle
    cast = ((lambda x: np.asarray(x).astype(store_dtype)
             if np.issubdtype(np.asarray(x).dtype, np.floating) else
             np.asarray(x))
            if store_dtype is not None else (lambda x: np.asarray(x)))
    with open(path, "wb") as f:
        pickle.dump({
            "params": jax.tree_util.tree_map(cast, jax.device_get(params)),
            "batch_stats": jax.tree_util.tree_map(
                cast, jax.device_get(batch_stats)),
            "num_classes": cfg.num_classes,
            "width_mult": cfg.width_mult,
            "dtype": cfg.dtype,
            "meta": meta or {},
        }, f)


def load_checkpoint(path):
    """Returns (model, variables, meta) from a save_checkpoint pickle."""
    import numpy as np
    import pickle
    with open(path, "rb") as f:
        d = pickle.load(f)
    model = SegNet(num_classes=d.get("num_classes", 12),
                   dtype=jnp.bfloat16 if d.get("dtype",
                                               "bfloat16") == "bfloat16"
                   else jnp.float32,
                   width_mult=d.get("width_mult", 1.0))
    up = lambda x: (np.asarray(x).astype(np.float32)    # noqa: E731
                    if np.issubdtype(np.asarray(x).dtype, np.floating)
                    else np.asarray(x))
    variables = {"params": jax.tree_util.tree_map(up, d["params"]),
                 "batch_stats": jax.tree_util.tree_map(
                     up, d["batch_stats"])}
    return model, variables, d.get("meta", {})


def make_train_step(model: SegNet, optimizer, class_weights=None):
    """Returns a jittable train step (images, labels) -> loss, new state.
    The multi-chip sharded variant lives in parallel/ (dp over batch, tp
    over feature channels)."""

    def step(params, batch_stats, opt_state, images, labels):
        (loss, new_bs), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch_stats, images, labels,
                              class_weights=class_weights),
            has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    return step
