"""Descriptor matching: batched Hamming distance as MXU matmuls.

Replaces the reference's OpenCV BruteForce-Hamming knn matcher with ratio
test (reference: orb.h:27, src/orb.cpp:16-29 — knnMatch k=2, ratio 0.8 from
parameters.txt:72) and the quad matcher's window-constrained brute-force NN
(reference: quadmatcher.cpp:41-83).

Key identity: for bit vectors a, b in {0,1}^256,
    hamming(a, b) = sum(a) + sum(b) - 2 a.b
so one (N, 256) x (256, M) matmul — on the MXU in bf16 (exact: values are
small integers well inside bf16's integer range... 256 < 2^8) — yields the
whole distance matrix. No popcount loops, no per-feature control flow.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = 1 << 14  # sentinel distance for invalid entries (> any Hamming dist)


class Matches(NamedTuple):
    """Fixed-shape match set: for each query i, index into train set (or -1)
    plus distance; valid mask combines ratio/window/mutual gates."""

    idx: jnp.ndarray      # (N,) int32
    dist: jnp.ndarray     # (N,) float32
    valid: jnp.ndarray    # (N,) bool


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                   valid_a: jnp.ndarray | None = None,
                   valid_b: jnp.ndarray | None = None) -> jnp.ndarray:
    """(N, B) x (M, B) {0,1} descriptors -> (N, M) Hamming distances.
    Invalid rows/cols get BIG."""
    a = desc_a.astype(jnp.bfloat16)
    b = desc_b.astype(jnp.bfloat16)
    dot = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    sa = jnp.sum(desc_a, axis=-1, dtype=jnp.int32).astype(jnp.float32)
    sb = jnp.sum(desc_b, axis=-1, dtype=jnp.int32).astype(jnp.float32)
    d = sa[:, None] + sb[None, :] - 2.0 * dot
    if valid_a is not None:
        d = jnp.where(valid_a[:, None], d, BIG)
    if valid_b is not None:
        d = jnp.where(valid_b[None, :], d, BIG)
    return d


def knn2_ratio(dist: jnp.ndarray, ratio: float = 0.8,
               max_dist: float = 256.0) -> Matches:
    """Best + second-best per row with Lowe ratio test (orb.cpp:21-28:
    accept iff d1 < ratio * d2)."""
    neg = -dist
    top2, idx2 = jax.lax.top_k(neg, 2)
    d1 = -top2[:, 0]
    d2 = -top2[:, 1]
    best = idx2[:, 0]
    ok = (d1 < ratio * d2) & (d1 < max_dist)
    return Matches(idx=jnp.where(ok, best, -1),
                   dist=d1, valid=ok)


def mutual_filter(fwd: Matches, dist: jnp.ndarray) -> Matches:
    """Keep only mutual best matches (cross-check)."""
    back_best = jnp.argmin(dist, axis=0)       # for each train col, best query
    n = fwd.idx.shape[0]
    rows = jnp.arange(n)
    safe_idx = jnp.clip(fwd.idx, 0, dist.shape[1] - 1)
    mutual = back_best[safe_idx] == rows
    ok = fwd.valid & mutual
    return Matches(idx=jnp.where(ok, fwd.idx, -1), dist=fwd.dist, valid=ok)


@partial(jax.jit, static_argnames=("ratio", "cross_check"))
def match_descriptors(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                      valid_a: jnp.ndarray, valid_b: jnp.ndarray,
                      ratio: float = 0.8,
                      cross_check: bool = True) -> Matches:
    """Full pipeline: Hamming matrix -> knn2 ratio -> optional mutual check."""
    d = hamming_matrix(desc_a, desc_b, valid_a, valid_b)
    m = knn2_ratio(d, ratio)
    if cross_check:
        m = mutual_filter(m, d)
    return m


def windowed_match(desc_a: jnp.ndarray, xy_a: jnp.ndarray,
                   desc_b: jnp.ndarray, xy_b: jnp.ndarray,
                   valid_a: jnp.ndarray, valid_b: jnp.ndarray,
                   du: float, dv: float,
                   max_dist: float = 80.0) -> Matches:
    """Window-constrained nearest neighbour (the quad matcher's
    ``findMatch`` search window, quadmatcher.cpp:41-83): candidate j must
    satisfy |u_a - u_b| <= du and |v_a - v_b| <= dv."""
    d = hamming_matrix(desc_a, desc_b, valid_a, valid_b)
    in_win = ((jnp.abs(xy_a[:, None, 0] - xy_b[None, :, 0]) <= du)
              & (jnp.abs(xy_a[:, None, 1] - xy_b[None, :, 1]) <= dv))
    d = jnp.where(in_win, d, BIG)
    best = jnp.argmin(d, axis=1)
    dist = jnp.min(d, axis=1)
    ok = dist < max_dist
    return Matches(idx=jnp.where(ok, best, -1), dist=dist, valid=ok)
