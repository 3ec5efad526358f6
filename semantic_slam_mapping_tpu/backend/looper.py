"""Bag-of-words loop-closure detection: vocabulary tree + L1 scoring.

From-scratch TPU-native replacement for DBoW2 as the reference uses it
(reference: looper.h:29-48 — ORB vocabulary loaded from ORBvoc.txt,
``transform`` of frame descriptors to a BoW vector, ``getPossibleLoops``
linear scan with score > looper_min_sim_score and id-gap >
looper_min_interval, looper.cpp:5-18; vocab constants parameters.txt:91-93).
The pretrained ORBvoc.txt is absent from the reference snapshot (SURVEY.md
§0), so the vocabulary is *built* here: hierarchical k-majority clustering
over binary descriptors (host-side, offline — the DBoW2 training recipe),
then stored as dense per-level center arrays.

TPU design: descriptor-to-word assignment is a tree descent where each
level is one batched Hamming argmin (the |a|+|b|-2ab matmul identity, see
ops/matching.py) — no pointer chasing. Database scoring is the DBoW2 L1
score s(v, w) = 1 - 0.5*|v/|v| - w/|w||_1, vmapped over all stored
keyframes at once; the reference's O(n) linear scan becomes one batched
kernel, and shards over the keyframe axis on a mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DESC_BITS = 256


class Vocabulary(NamedTuple):
    """Dense vocabulary tree: ``centers[l]`` has shape (k^(l+1), 256) in
    {0,1}; leaves are level depth-1. idf_levels[l]: (k^(l+1),) inverse
    document frequency of every node at level l (nodes above the leaves
    get the pooled counts of their subtree), so BoW vectors can be formed
    at any ``scoring_level`` — the DBoW2 behavior the reference relies on
    (looper.h:39-45 transforms at level 4 of the k=10/L=6 ORBvoc)."""

    centers: Tuple[jnp.ndarray, ...]
    idf_levels: Tuple[jnp.ndarray, ...]

    @property
    def branching(self) -> int:
        return self.centers[0].shape[0]

    @property
    def n_leaves(self) -> int:
        return self.centers[-1].shape[0]

    @property
    def depth(self) -> int:
        return len(self.centers)

    @property
    def idf(self) -> jnp.ndarray:
        return self.idf_levels[-1]


class SparseBow(NamedTuple):
    """Fixed-budget sparse BoW vector: ``idx`` (B,) int32 word ids SORTED
    ascending with padding = a large sentinel at the end; ``w`` (B,) f32
    L1-normalized tf-idf weights, 0 at padding. A dense (n_words,) vector
    is impossible at DBoW2 scale (10^6 leaves); this is the (word, weight)
    pair list DBoW2's BowVector actually stores, as fixed-shape arrays."""

    idx: jnp.ndarray
    w: jnp.ndarray


PAD_WORD = jnp.int32(2 ** 30)


def build_vocabulary(descriptors: np.ndarray, branching: int = 10,
                     depth: int = 3, seed: int = 0,
                     kmeans_iters: int = 8) -> Vocabulary:
    """Hierarchical k-majority clustering of binary descriptors (host-side,
    offline — the DBoW2 ORBvoc training recipe). descriptors: (N, 256)
    {0,1}. Empty branches get random centers so the tree stays complete
    (dense arrays need every slot)."""
    rng = np.random.default_rng(seed)
    desc = descriptors.astype(np.uint8)
    n_total = len(desc)

    def kmajority(data: np.ndarray, k: int) -> np.ndarray:
        if len(data) == 0:
            return rng.integers(0, 2, (k, DESC_BITS)).astype(np.uint8)
        init = data[rng.choice(len(data), size=min(k, len(data)),
                               replace=False)]
        if len(init) < k:
            extra = rng.integers(0, 2, (k - len(init), DESC_BITS))
            init = np.concatenate([init, extra.astype(np.uint8)])
        centers = init.astype(np.float32)
        for _ in range(kmeans_iters):
            d = (data.sum(1)[:, None] + centers.sum(1)[None, :]
                 - 2.0 * data @ centers.T)
            assign = d.argmin(1)
            for j in range(k):
                members = data[assign == j]
                if len(members):
                    centers[j] = (members.mean(0) > 0.5)
        return centers.astype(np.uint8)

    levels = []
    groups = [desc]
    for lvl in range(depth):
        centers_l = []
        next_groups = []
        for g in groups:
            c = kmajority(g, branching)
            centers_l.append(c)
            if len(g):
                d = (g.sum(1)[:, None] + c.sum(1)[None, :]
                     - 2.0 * g @ c.T.astype(np.float32))
                assign = d.argmin(1)
            else:
                assign = np.zeros(0, np.int64)
            for j in range(branching):
                next_groups.append(g[assign == j] if len(g) else g)
        levels.append(np.concatenate(centers_l, axis=0))
        groups = next_groups

    # idf at every level from the training corpus: leaf counts, pooled up
    counts = np.array([len(g) for g in groups], np.float32)   # (k^depth,)
    idf_levels = []
    c = counts
    for lvl in range(depth - 1, -1, -1):
        idf_levels.append(np.log(max(n_total, 1) / np.maximum(c, 1.0)))
        if lvl:
            c = c.reshape(-1, branching).sum(axis=1)
    idf_levels.reverse()
    return Vocabulary(
        centers=tuple(jnp.asarray(l) for l in levels),
        idf_levels=tuple(jnp.asarray(i) for i in idf_levels))


def save_vocabulary(path: str, vocab: Vocabulary) -> None:
    """Persist a vocabulary (the ORBvoc.txt artifact role, looper.h:29-32;
    npz instead of the reference's 140 MB text format)."""
    data = {f"level_{i}": np.asarray(c) for i, c in enumerate(vocab.centers)}
    for i, idf in enumerate(vocab.idf_levels):
        data[f"idf_{i}"] = np.asarray(idf)
    np.savez_compressed(path, **data)


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    levels = sorted(k for k in z.files if k.startswith("level_"))
    idfs = sorted(k for k in z.files if k.startswith("idf_"))
    centers = tuple(jnp.asarray(z[k]) for k in levels)
    if idfs:
        idf_levels = tuple(jnp.asarray(z[k]) for k in idfs)
    else:   # round-1 format: leaf idf only; upper levels get flat weights
        leaf = np.asarray(z["idf"])
        k = int(centers[0].shape[0])
        idf_levels, c = [], leaf
        for lvl in range(len(centers) - 1, -1, -1):
            idf_levels.append(jnp.asarray(c))
            if lvl:
                c = np.full(len(c) // k, float(np.mean(c)), np.float32)
        idf_levels = tuple(reversed(idf_levels))
    return Vocabulary(centers=centers, idf_levels=idf_levels)


def _descend(vocab: Vocabulary, desc: jnp.ndarray, n_levels: int
             ) -> jnp.ndarray:
    """Tree descent: (N, 256) descriptors -> node ids at level
    ``n_levels`` (1-indexed; ids in [0, k^n_levels)). Each level is one
    batched Hamming argmin over the current nodes' k children."""
    k = vocab.branching
    n = desc.shape[0]
    node = jnp.zeros(n, jnp.int32)
    d = desc.astype(jnp.float32)
    d_sum = jnp.sum(d, axis=-1)
    for centers_l in vocab.centers[:n_levels]:
        # children of `node` are node*k .. node*k+k-1
        child_idx = node[:, None] * k + jnp.arange(k)[None, :]
        c = centers_l[child_idx].astype(jnp.float32)     # (N, k, 256)
        ham = (d_sum[:, None] + jnp.sum(c, axis=-1)
               - 2.0 * jnp.einsum("nb,nkb->nk", d, c,
                                  preferred_element_type=jnp.float32))
        node = (node * k + jnp.argmin(ham, axis=-1)).astype(jnp.int32)
    return node


@partial(jax.jit, static_argnames=())
def transform(vocab: Vocabulary, desc: jnp.ndarray,
              valid: jnp.ndarray) -> jnp.ndarray:
    """Descriptors (N, 256) -> L1-normalized tf-idf BoW vector (n_leaves,)
    — the DENSE form, usable for small vocabularies/tests. Production uses
    ``transform_sparse`` (a dense 10^6-leaf vector per keyframe cannot
    scale; DBoW2 itself stores sparse BowVectors)."""
    node = _descend(vocab, desc, len(vocab.centers))
    tf = jnp.zeros(vocab.n_leaves).at[node].add(
        valid.astype(jnp.float32))
    v = tf * vocab.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


@partial(jax.jit, static_argnames=("scoring_level", "budget"))
def transform_sparse(vocab: Vocabulary, desc: jnp.ndarray,
                     valid: jnp.ndarray, scoring_level: int,
                     budget: int = 0) -> SparseBow:
    """Descriptors -> sparse L1-normalized tf-idf BoW at ``scoring_level``
    of the tree (the reference's DBoW2 transform granularity, looper.h:
    39-45 / LooperConfig.scoring_level). budget: max distinct words kept
    (0 = one slot per descriptor — lossless)."""
    n = desc.shape[0]
    lvl = min(scoring_level, vocab.depth)
    node = _descend(vocab, desc, lvl)
    word = jnp.where(valid, node, PAD_WORD)
    order = jnp.argsort(word)
    s = word[order]                                       # sorted word ids
    idf = vocab.idf_levels[lvl - 1]
    wgt = jnp.where(s < PAD_WORD, idf[jnp.clip(s, 0, idf.shape[0] - 1)], 0.0)
    first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    first = first & (s < PAD_WORD)
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1        # unique rank
    B = budget or n
    slot_c = jnp.clip(slot, 0, B - 1)
    keep = first & (slot < B)
    # scatter tf-idf mass of each run into its unique slot
    w = jnp.zeros(B).at[slot_c].add(jnp.where(slot < B, wgt, 0.0))
    # first-of-run entries stamp their word id; everything else writes the
    # PAD sentinel, which is a no-op under min against the PAD init
    idx = jnp.full(B, PAD_WORD, jnp.int32).at[slot_c].min(
        jnp.where(keep, s, PAD_WORD).astype(jnp.int32))
    # slots never written keep PAD sentinel; zero their weight
    w = jnp.where(idx < PAD_WORD, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w), 1e-9)
    return SparseBow(idx=idx, w=w)


def l1_score(v: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity of two L1-normalized vectors: in [0, 1]."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v - w), axis=-1)


def sparse_l1_scores(q: SparseBow, db_idx: jnp.ndarray,
                     db_w: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity of a sparse query against M sparse database
    rows: for L1-normalized non-negative vectors,
    1 - 0.5*|v - w|_1 = sum over COMMON words of min(v_i, w_i) — only the
    intersection matters, found by a batched binary search over each row's
    sorted word ids. db_idx/db_w: (M, B)."""
    def row(ri, rw):
        pos = jnp.searchsorted(ri, q.idx)
        pos_c = jnp.clip(pos, 0, ri.shape[0] - 1)
        hit = (ri[pos_c] == q.idx) & (q.idx < PAD_WORD)
        return jnp.sum(jnp.where(hit, jnp.minimum(q.w, rw[pos_c]), 0.0))

    return jax.vmap(row)(db_idx, db_w)


@partial(jax.jit, static_argnames=())
def get_possible_loops(bow: jnp.ndarray, db_bows: jnp.ndarray,
                       db_ids: jnp.ndarray, db_valid: jnp.ndarray,
                       query_id: jnp.ndarray,
                       min_score: float, min_interval: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched version of the reference's linear candidate scan
    (looper.cpp:5-18): score every stored keyframe at once; candidates are
    scores > min_score with id gap > min_interval.

    Returns (scores (M,), candidate_mask (M,))."""
    scores = l1_score(bow[None, :], db_bows)
    gap = jnp.abs(query_id - db_ids)
    mask = db_valid & (scores > min_score) & (gap > min_interval)
    return scores, mask


@partial(jax.jit, static_argnames=())
def get_possible_loops_sparse(bow: SparseBow, db_idx: jnp.ndarray,
                              db_w: jnp.ndarray,
                              db_ids: jnp.ndarray, db_valid: jnp.ndarray,
                              query_id: jnp.ndarray,
                              min_score: float, min_interval: int
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse-BoW version of the batched candidate scan (looper.cpp:5-18):
    per-keyframe memory is O(budget) words, independent of vocabulary
    size, so this scales to the reference's 10^6-leaf ORBvoc."""
    scores = sparse_l1_scores(bow, db_idx, db_w)
    gap = jnp.abs(query_id - db_ids)
    mask = db_valid & (scores > min_score) & (gap > min_interval)
    return scores, mask
