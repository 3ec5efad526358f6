#!/usr/bin/env python
"""Vocabulary-at-scale measurements (VERDICT r3 item 6): build a k=10
depth-5 (10^5-leaf) vocabulary, then time per-keyframe BoW transform and
the batched loop scan against a 2048-keyframe database on the live
backend. Numbers land in docs/PERF.md.

    python tools/bench_vocab.py [--depth 5] [--reps 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), os.pardir,
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.backend import looper as lp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--budget", type=int, default=256)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    protos = rng.integers(0, 2, (2000, 256)).astype(np.uint8)
    train = (np.repeat(protos, 75, axis=0)
             ^ (rng.random((150000, 256)) < 0.08)).astype(np.uint8)
    t0 = time.time()
    vocab = lp.build_vocabulary(train, branching=10, depth=args.depth,
                                kmeans_iters=6)
    print(f"build k=10 L={args.depth}: {vocab.n_leaves} leaves in "
          f"{time.time() - t0:.1f}s (150k training descriptors)", flush=True)

    # per-keyframe transform latency (1000-descriptor frames, the ORB
    # n_features operating point)
    descs = [jnp.asarray(
        (protos[rng.integers(0, 2000, 1000)]
         ^ (rng.random((1000, 256)) < 0.08)).astype(np.uint8))
        for _ in range(args.reps + 1)]
    ok = jnp.ones(1000, bool)
    tr = jax.jit(lambda d: lp.transform_sparse(
        vocab, d, ok, scoring_level=args.depth, budget=args.budget))
    jax.block_until_ready(tr(descs[0]))        # compile
    t0 = time.time()
    outs = [tr(d) for d in descs[1:]]
    jax.block_until_ready(outs[-1])
    t_tr = (time.time() - t0) / args.reps
    print(f"transform_sparse (1000 desc -> level-{args.depth} BoW, "
          f"budget {args.budget}): {t_tr * 1e3:.1f} ms/keyframe", flush=True)

    # batched loop scan at the 2048-KF database budget
    M = 2048
    db_idx = jnp.stack([outs[i % len(outs)].idx for i in range(M)])
    db_w = jnp.stack([outs[i % len(outs)].w for i in range(M)])
    ids = jnp.arange(M, dtype=jnp.int32)
    valid = jnp.ones(M, bool)
    q = outs[0]
    scan = jax.jit(lambda qi, qw: lp.get_possible_loops_sparse(
        lp.SparseBow(qi, qw), db_idx, db_w, ids, valid, jnp.int32(2000),
        0.015, 60))
    jax.block_until_ready(scan(q.idx, q.w))
    t0 = time.time()
    for i in range(args.reps):
        s, m = scan(outs[i % len(outs)].idx, outs[i % len(outs)].w)
    jax.block_until_ready(s)
    t_scan = (time.time() - t0) / args.reps
    print(f"loop scan over {M}-KF database: {t_scan * 1e3:.1f} ms/query "
          f"on {jax.devices()[0].platform}", flush=True)


if __name__ == "__main__":
    main()
