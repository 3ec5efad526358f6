"""ORB feature extraction: multi-scale FAST + intensity-centroid orientation
+ steered rBRIEF descriptors.

From-scratch TPU-native equivalent of ORB_SLAM2's ``ORBextractor`` as used
by the reference (reference: orb.h:6-56, src/orb.cpp — 8-level pyramid at
scale 1.2, grid-distributed FAST with ini/min thresholds 20/7, intensity
centroid orientation, 256-bit rBRIEF; params parameters.txt:66-71). The
third-party extractor binary is absent from the reference snapshot
(SURVEY.md §0) — behavior is reconstructed from its public interface and
standard ORB semantics.

TPU design: each pyramid level is processed as dense fixed-shape arrays —
FAST response map -> grid NMS top-K_level -> batched gather of oriented
BRIEF samples (one `vmap` over keypoints). The descriptor bit pattern is a
deterministic seeded Gaussian pair table (BRIEF-style, sigma = patch/5);
descriptors are stored unpacked as (N, 256) uint8 in {0,1} so Hamming
distance lowers to an MXU matmul (see ops/matching.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.config import OrbConfig
from semantic_slam_mapping_tpu.ops import corners
from semantic_slam_mapping_tpu.ops import image as im

DESC_BITS = 256


class OrbFeatures(NamedTuple):
    """Fixed-budget ORB feature set (N = config n_features).

    xy is in level-0 (full-res) pixel coords. desc is (N, 256) uint8 of
    {0,1}. Invalid slots are zeroed."""

    xy: jnp.ndarray
    response: jnp.ndarray
    angle: jnp.ndarray      # radians
    level: jnp.ndarray      # int32 pyramid level
    desc: jnp.ndarray
    valid: jnp.ndarray


def _brief_pattern(patch_size: int = 31, n_bits: int = DESC_BITS,
                   seed: int = 7) -> np.ndarray:
    """(n_bits, 2, 2) sampling pair offsets, BRIEF-II style: iid Gaussian
    with sigma = patch/5, clipped to the patch. Deterministic."""
    rng = np.random.default_rng(seed)
    sigma = patch_size / 5.0
    lim = patch_size // 2 - 1
    pts = np.clip(rng.normal(0.0, sigma, (n_bits, 2, 2)), -lim, lim)
    return pts.astype(np.float32)


_PATTERN = _brief_pattern()


def _disc_offsets(radius: int) -> np.ndarray:
    """Integer offsets of a filled disc, padded to fixed length with (0,0)."""
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    inside = (xs ** 2 + ys ** 2) <= radius ** 2
    offs = np.stack([xs[inside], ys[inside]], axis=-1)
    return offs.astype(np.float32)


def orientation(img: jnp.ndarray, xy: jnp.ndarray,
                radius: int = 15) -> jnp.ndarray:
    """Intensity-centroid orientation (rad) for keypoints xy (N, 2):
    theta = atan2(m01, m10) over a disc patch (standard ORB; the
    reference's extractor computes the same IC_Angle)."""
    offs = jnp.asarray(_disc_offsets(radius))           # (P, 2)

    def one(p):
        patch = im.bilinear_sample(img, p[None, :] + offs)
        m10 = jnp.sum(offs[:, 0] * patch)
        m01 = jnp.sum(offs[:, 1] * patch)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(xy)


def descriptors(img: jnp.ndarray, xy: jnp.ndarray,
                angle: jnp.ndarray) -> jnp.ndarray:
    """Steered BRIEF: rotate the pair pattern by each keypoint's angle,
    bilinear-sample both points, bit = (I(a) < I(b)). Returns (N, 256)
    uint8. Image should be pre-smoothed (ORB blurs with sigma=2)."""
    pat = jnp.asarray(_PATTERN)                          # (B, 2, 2)

    def one(p, th):
        c, s = jnp.cos(th), jnp.sin(th)
        rot = jnp.array([[c, -s], [s, c]])
        rp = jnp.einsum("ij,bkj->bki", rot, pat)         # rotated offsets
        a = im.bilinear_sample(img, p[None, :] + rp[:, 0, :])
        b = im.bilinear_sample(img, p[None, :] + rp[:, 1, :])
        return (a < b).astype(jnp.uint8)

    return jax.vmap(one)(xy, angle)


def _level_budgets(n_features: int, n_levels: int, scale: float) -> list[int]:
    """Distribute the feature budget over levels proportional to level area
    (geometric series with ratio 1/scale^2), like ORBextractor's
    per-level nfeatures split."""
    inv = 1.0 / (scale * scale)
    weights = np.array([inv ** i for i in range(n_levels)])
    raw = n_features * weights / weights.sum()
    out = np.floor(raw).astype(int)
    out[0] += n_features - out.sum()
    return out.tolist()


@partial(jax.jit, static_argnames=("cfg",))
def extract(img: jnp.ndarray, cfg: OrbConfig = OrbConfig()) -> OrbFeatures:
    """Full ORB extraction on one image -> fixed N-slot feature set."""
    pyr = im.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = _level_budgets(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    all_parts = []
    for lvl, (img_l, budget) in enumerate(zip(pyr, budgets)):
        if budget == 0:
            continue
        scale = cfg.scale_factor ** lvl
        resp = corners.fast_response(img_l, cfg.ini_th_fast / 255.0)
        # fall back to the low threshold where the high one finds nothing
        # (the reference's iniThFAST/minThFAST two-pass, orb.h:25-26)
        resp_lo = corners.fast_response(img_l, cfg.min_th_fast / 255.0)
        resp = jnp.where(jnp.max(resp) > 0, resp, resp_lo)
        kp = corners.select_keypoints(
            resp, budget, quality_level=0.0,
            cell_size=16, border=min(cfg.edge_threshold,
                                     min(img_l.shape) // 4))
        blurred = im.gaussian_blur(img_l, 2.0)
        ang = orientation(img_l, kp.xy, cfg.half_patch_size)
        desc = descriptors(blurred, kp.xy, ang)
        all_parts.append(OrbFeatures(
            xy=kp.xy * scale,
            response=kp.score,
            angle=ang,
            level=jnp.full(kp.xy.shape[:1], lvl, jnp.int32),
            desc=jnp.where(kp.valid[:, None], desc, 0),
            valid=kp.valid))

    merged = OrbFeatures(*[jnp.concatenate([p[i] for p in all_parts])
                           for i in range(6)])
    n = merged.xy.shape[0]
    if n < cfg.n_features:
        pad = cfg.n_features - n
        merged = OrbFeatures(
            xy=jnp.pad(merged.xy, ((0, pad), (0, 0))),
            response=jnp.pad(merged.response, (0, pad)),
            angle=jnp.pad(merged.angle, (0, pad)),
            level=jnp.pad(merged.level, (0, pad)),
            desc=jnp.pad(merged.desc, ((0, pad), (0, 0))),
            valid=jnp.pad(merged.valid, (0, pad)))
    return merged
