"""Semi-global block matching disparity on TPU.

Replaces OpenCV's SGBM exactly where the reference uses it (reference:
src/stereo.cpp:11-38 — SADWindow 11, 80 disparities, P1/P2 = 8/32 * 11^2,
uniqueness 10, speckle 100/32, disp12MaxDiff 1, preFilterCap 63, fullDP).

TPU mapping (SURVEY.md §7 hard-part #1):
- Matching cost: |x-Sobel| clipped at preFilterCap (OpenCV's prefilter) +
  intensity AD, sampled at D shifted columns -> cost volume (H, W, D),
  box-aggregated over the SAD window. One fused elementwise+conv pass.
- Aggregation: the 4 principal SGM directions. Each direction is a
  `lax.scan` along its axis whose carry is the (cross-axis, D) slice of
  path costs — the per-step recurrence
      L(p,d) = C(p,d) + min(L_prev(d), L_prev(d+-1)+P1, minL_prev+P2) - minL_prev
  is fully vectorized over the perpendicular image axis and the disparity
  lanes, so each scan step is a (H or W, D) VPU op, not a scalar loop.
  (Diagonal paths of fullDP=8 add little accuracy for KITTI-class scenes
  at 2x the scan cost; num_directions is configurable, default 4.)
- WTA + parabola subpixel + uniqueness ratio + left-right consistency
  (disparity of the right image recovered from the same volume) + speckle
  rejection via bounded-iteration connected-component size estimation.

Output convention matches OpenCV: disparity in pixels (float), invalid = -1.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import SgbmConfig
from semantic_slam_mapping_tpu.ops import image as im
from semantic_slam_mapping_tpu.ops.components import connected_components

INVALID = -1.0


class SgbmResult(NamedTuple):
    disparity: jnp.ndarray   # (H, W) float32, subpixel, INVALID where bad
    valid: jnp.ndarray       # (H, W) bool


def _prefilter(img: jnp.ndarray, cap: float) -> jnp.ndarray:
    """OpenCV SGBM x-Sobel prefilter clipped to [-cap, cap], mapped to
    [0, 2*cap] (img in [0,1] -> work in 255 scale for parity of P1/P2)."""
    x = img * 255.0
    ix, _ = im.gradients(x, smooth=True)
    return jnp.clip(ix, -cap, cap) + cap


def _cost_volume(left: jnp.ndarray, right: jnp.ndarray,
                 cfg: SgbmConfig) -> jnp.ndarray:
    """(H, W, D) matching cost, box-aggregated over the SAD window.

    Cost dtype is cfg.cost_dtype: bfloat16 by default — raw costs are
    O(100) with a P1 quantum of ~60, so bf16's ~0.4% relative rounding is
    noise, and it halves the HBM traffic of every volume pass from here on
    (cost build, box aggregation AND the directional scans). float32 is
    the exactness mode for tests/ablation."""
    dt = jnp.dtype(cfg.cost_dtype)
    lp = _prefilter(left, cfg.pre_filter_cap).astype(dt)
    rp = _prefilter(right, cfg.pre_filter_cap).astype(dt)
    li = (left * 255.0).astype(dt)
    ri = (right * 255.0).astype(dt)
    H, W = left.shape
    D = cfg.num_disparities

    # All D shifted right images via one vmapped dynamic_slice over a
    # padded buffer — NOT a per-d python loop, which would materialize D
    # separate border-mask constants (each tile-padded (H,W,1) f32 = 128x
    # memory blowup; observed as a 35 GB HBM OOM).
    rp_pad = jnp.pad(rp, ((0, 0), (D, 0)))
    ri_pad = jnp.pad(ri, ((0, 0), (D, 0)))
    d0 = cfg.min_disparity

    def at_d(d):
        rs = jax.lax.dynamic_slice(rp_pad, (0, D - d0 - d), (H, W))
        ris = jax.lax.dynamic_slice(ri_pad, (0, D - d0 - d), (H, W))
        return jnp.abs(lp - rs) + 0.25 * jnp.abs(li - ris)

    vol = jax.vmap(at_d)(jnp.arange(D))                 # (D, H, W)
    # out-of-view columns get a neutral high-ish cost (single batched mask)
    border = (jax.lax.broadcasted_iota(jnp.int32, (D, 1, W), 2)
              < (jnp.arange(D) + d0)[:, None, None])
    vol = jnp.where(border, 2.0 * cfg.pre_filter_cap, vol)
    # window aggregation (the "block" in SGBM), batched over the D axis
    win = cfg.sad_window_size
    vol = im.box_blur(vol, win)
    return jnp.moveaxis(vol, 0, -1).astype(dt)            # (H, W, D)


def _sgm_scan_bidir(cost: jnp.ndarray, p1: float, p2: float,
                    unroll: int = 8) -> jnp.ndarray:
    """Forward + backward SGM path aggregation along axis 0 of ``cost``
    (S, X, D) in ONE `lax.scan`: the two directions are independent
    recurrences, so they ride the same scan as a stacked (2, X, D) carry
    (halves the number of sequential scans; ``unroll`` amortizes per-step
    overhead, the main cost of long thin scans on TPU). Returns the SUM of
    the two directional path costs, shape (S, X, D)."""
    both = jnp.stack([cost, cost[::-1]], axis=1)     # (S, 2, X, D)
    big = jnp.asarray(1e9, cost.dtype)

    def step(carry, c):
        # carry: (2, X, D) previous path cost for fwd/bwd
        prev_min = jnp.min(carry, axis=-1, keepdims=True)
        up = jnp.concatenate([carry[..., :1] + big, carry[..., :-1]], axis=-1)
        dn = jnp.concatenate([carry[..., 1:], carry[..., -1:] + big], axis=-1)
        best = jnp.minimum(
            jnp.minimum(carry, prev_min + p2),
            jnp.minimum(up + p1, dn + p1))
        out = c + best - prev_min
        return out, out

    init = both[0]
    _, rest = jax.lax.scan(step, init, both[1:], unroll=unroll)
    path = jnp.concatenate([init[None], rest], axis=0)  # (S, 2, X, D)
    return path[:, 0] + path[::-1, 1]


def _sgm_scan_bidir_blocked(cost: jnp.ndarray, p1: float, p2: float,
                            block: int, halo: int,
                            unroll: int = 8) -> jnp.ndarray:
    """Block-parallel SGM path aggregation with overlapped halo warm-up.

    The exact scan is a strictly sequential recurrence over S steps of tiny
    per-step work — latency-bound on TPU (376- and 1248-step chains for the
    KITTI frame). SGM path influence decays geometrically (each step
    subtracts the running min and caps jumps at P2), so a scan restarted
    ``halo`` steps before a block boundary converges to the exact carry:
    the standard tile-overlap scheme of GPU SGM implementations. This cuts
    sequential steps from S to block + 2*halo while widening per-step work
    by S/block. Zero-cost halo padding at the array ends reproduces the
    exact fresh-start initialization at image borders (a uniform carry is a
    fixed point of the recurrence with c = 0)."""
    S, X, D = cost.shape
    if S <= block + 2 * halo:
        return _sgm_scan_bidir(cost, p1, p2, unroll)
    nb = -(-S // block)
    L = block + 2 * halo
    cpad = jnp.pad(cost, ((halo, nb * block - S + halo), (0, 0), (0, 0)))

    seg = jax.vmap(lambda s: jax.lax.dynamic_slice(
        cpad, (s, 0, 0), (L, X, D)))(jnp.arange(nb) * block)  # (nb, L, X, D)
    # fwd + bwd as one stacked recurrence (bwd scans the flipped segment)
    both = jnp.stack([seg, seg[:, ::-1]], axis=2)       # (nb, L, 2, X, D)
    both = jnp.moveaxis(both, 1, 0)                     # (L, nb, 2, X, D)
    big = jnp.asarray(1e9, cost.dtype)

    def step(carry, c):
        prev_min = jnp.min(carry, axis=-1, keepdims=True)
        up = jnp.concatenate([carry[..., :1] + big, carry[..., :-1]], axis=-1)
        dn = jnp.concatenate([carry[..., 1:], carry[..., -1:] + big], axis=-1)
        best = jnp.minimum(
            jnp.minimum(carry, prev_min + p2),
            jnp.minimum(up + p1, dn + p1))
        out = c + best - prev_min
        return out, out

    init = both[0]
    _, rest = jax.lax.scan(step, init, both[1:], unroll=unroll)
    path = jnp.concatenate([init[None], rest], axis=0)  # (L, nb, 2, X, D)
    fwd = path[halo:halo + block, :, 0]                 # (block, nb, X, D)
    bwd = path[::-1, :, 1][halo:halo + block]
    out = fwd + bwd                                     # (block, nb, X, D)
    out = jnp.moveaxis(out, 1, 0).reshape(nb * block, X, D)
    return out[:S]


def _sgm_segments(cost: jnp.ndarray, block: int, halo: int
                  ) -> Tuple[jnp.ndarray, int]:
    """Cut (S, X, D) into overlapped blocks for both scan directions:
    returns ((L, nb, 2, X, D) scan-ready segments, nb) where axis 2 stacks
    the forward pass and the flipped (backward) pass of each block."""
    S, X, D = cost.shape
    nb = -(-S // block)
    L = block + 2 * halo
    cpad = jnp.pad(cost, ((halo, nb * block - S + halo), (0, 0), (0, 0)))
    seg = jax.vmap(lambda s: jax.lax.dynamic_slice(
        cpad, (s, 0, 0), (L, X, D)))(jnp.arange(nb) * block)  # (nb, L, X, D)
    both = jnp.stack([seg, seg[:, ::-1]], axis=1)            # (nb, 2, L, X, D)
    return jnp.moveaxis(both, 2, 0), nb                      # (L, nb, 2, X, D)


def _sgm_unsegment(path: jnp.ndarray, nb: int, S: int, X: int,
                   block: int, halo: int) -> jnp.ndarray:
    """Inverse of `_sgm_segments` on the scanned (L, nb, 2, X, D) path
    costs: drop halos, sum the two directions, reassemble (S, X, D)."""
    D = path.shape[-1]
    fwd = path[halo:halo + block, :, 0]                      # (block, nb, X, D)
    bwd = path[::-1, :, 1][halo:halo + block]
    out = jnp.moveaxis(fwd + bwd, 1, 0).reshape(nb * block, X, D)
    return out[:S]


def _sgm_step(carry: jnp.ndarray, c: jnp.ndarray, p1: float, p2: float,
              shift: int = 0) -> jnp.ndarray:
    """One SGM recurrence step on a (..., X, D) carry.

    shift=+1/-1 turns the axis-aligned path into a DIAGONAL one: the carry
    is displaced one pixel along the cross axis X before the disparity
    recurrence, so step s of the scan reads path costs from (s-1, x-+1) —
    the fullDP diagonal directions without any volume skewing. Pixels at
    the entering image edge receive a zero carry, which is a fixed point of
    the recurrence (best - prev_min = 0), i.e. exactly the fresh-start
    initialization OpenCV uses at borders."""
    if shift:
        z = jnp.zeros_like(carry[..., :1, :])
        carry = (jnp.concatenate([z, carry[..., :-1, :]], axis=-2)
                 if shift > 0 else
                 jnp.concatenate([carry[..., 1:, :], z], axis=-2))
    big = jnp.asarray(1e9, carry.dtype)
    prev_min = jnp.min(carry, axis=-1, keepdims=True)
    up = jnp.concatenate([carry[..., :1] + big, carry[..., :-1]], axis=-1)
    dn = jnp.concatenate([carry[..., 1:], carry[..., -1:] + big], axis=-1)
    best = jnp.minimum(
        jnp.minimum(carry, prev_min + p2),
        jnp.minimum(up + p1, dn + p1))
    return c + best - prev_min


def _num_directions(cfg: SgbmConfig) -> int:
    """8 when fullDP (OpenCV MODE_HH; the reference's StereoSGBM leaves
    fullDP at the 2.4.x default false, stereo.cpp:13-28), else
    cfg.num_directions (4 = the axis-aligned subset)."""
    n = 8 if cfg.full_dp else cfg.num_directions
    if n not in (4, 8):
        raise ValueError(f"num_directions must be 4 or 8, got {n}")
    return n


def _aggregate(vol: jnp.ndarray, cfg: SgbmConfig) -> jnp.ndarray:
    """Sum of 4 or 8 directional path costs. vol: (H, W, D).

    On the blocked path ALL directions ride ONE `lax.scan` as a tuple
    carry: the vertical and horizontal block-segments advance in lockstep
    (each already carrying fwd+bwd stacked), and with fullDP the four
    diagonal paths join as two more tuple elements that reuse the vertical
    segments with a +-1 cross-axis carry shift per step (`_sgm_step`). The
    scans are latency-bound (tiny per-step work, long sequential chains),
    so fusing them into one recurrence — rather than running 2-4 scans —
    is what sets aggregation wall-clock."""
    p1, p2 = float(cfg.p1) / 16.0, float(cfg.p2) / 16.0
    # OpenCV P1/P2 are in units of the (scaled) BT cost summed over the
    # window; our cost is window-averaged, so rescale by ~window^2/8.
    ndir = _num_directions(cfg)
    H, W, D = vol.shape
    block, halo = cfg.scan_block, cfg.scan_halo
    volT = jnp.swapaxes(vol, 0, 1)                           # (W, H, D)

    use_pallas = cfg.use_pallas and jax.default_backend() == "tpu"
    blocked = (not use_pallas and block > 0 and H > block + 2 * halo
               and W > block + 2 * halo)

    if use_pallas:
        from semantic_slam_mapping_tpu.ops.pallas.sgm_pallas import \
            sgm_bidir_pallas
        agg = sgm_bidir_pallas(vol, p1, p2) \
            + jnp.swapaxes(sgm_bidir_pallas(volT, p1, p2), 0, 1)
        if ndir == 8:
            agg = agg + _diag_paths_full(vol, p1, p2)
        return agg

    if blocked:
        r1, nb1 = _sgm_segments(vol, block, halo)
        r2, nb2 = _sgm_segments(volT, block, halo)
        # packs: (segments, per-step carry shift). Diagonals reuse r1.
        packs = [(r1, 0), (r2, 0)]
        if ndir == 8:
            packs += [(r1, 1), (r1, -1)]
        shifts = tuple(s for _, s in packs)

        def step(carries, cs):
            outs = tuple(_sgm_step(cr, c, p1, p2, sh)
                         for cr, c, sh in zip(carries, cs, shifts))
            return outs, outs

        init = tuple(r[0] for r, _ in packs)
        _, rests = jax.lax.scan(
            step, init, tuple(r[1:] for r, _ in packs), unroll=8)
        paths = [jnp.concatenate([i[None], r], axis=0)
                 for i, r in zip(init, rests)]
        agg = _sgm_unsegment(paths[0], nb1, H, W, block, halo)
        agg = agg + jnp.swapaxes(
            _sgm_unsegment(paths[1], nb2, W, H, block, halo), 0, 1)
        for p in paths[2:]:
            agg = agg + _sgm_unsegment(p, nb1, H, W, block, halo)
        return agg

    scan2 = ((lambda v: _sgm_scan_bidir_blocked(v, p1, p2, block, halo))
             if block > 0 else (lambda v: _sgm_scan_bidir(v, p1, p2)))
    agg = scan2(vol) + jnp.swapaxes(scan2(volT), 0, 1)
    if ndir == 8:
        agg = agg + _diag_paths_full(vol, p1, p2)
    return agg


def _diag_paths_full(vol: jnp.ndarray, p1: float, p2: float,
                     unroll: int = 8) -> jnp.ndarray:
    """Exact (unblocked) sum of the 4 diagonal path costs: one scan over
    rows with a (2 shift-dirs, 2 scan-dirs, W, D) stacked carry using the
    shifted `_sgm_step` recurrence."""
    S = vol.shape[0]
    both = jnp.stack([vol, vol[::-1]], axis=1)               # (S, 2, W, D)

    def step(carry, c):
        o_plus = _sgm_step(carry[0], c, p1, p2, shift=1)
        o_minus = _sgm_step(carry[1], c, p1, p2, shift=-1)
        return (o_plus, o_minus), (o_plus, o_minus)

    init = (both[0], both[0])
    _, (rp, rm) = jax.lax.scan(step, init, both[1:], unroll=unroll)
    pp = jnp.concatenate([init[0][None], rp], axis=0)        # (S, 2, W, D)
    pm = jnp.concatenate([init[1][None], rm], axis=0)
    # components: [:,0]=top-down scan, [:,1]=bottom-up scan (flipped rows)
    return (pp[:, 0] + pp[::-1, 1]) + (pm[:, 0] + pm[::-1, 1])


def _wta_subpixel(agg: jnp.ndarray, cfg: SgbmConfig
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Winner-take-all + parabola subpixel + uniqueness gate."""
    D = agg.shape[-1]
    best = jnp.argmin(agg, axis=-1)                      # (H, W)
    cmin = jnp.min(agg, axis=-1).astype(jnp.float32)

    # uniqueness: second-best (excluding d-1, d, d+1) must exceed by ratio.
    # masked lane-min in the volume's native dtype — elementwise select +
    # reduce fuses into one pass; beats a top-k (sort-based on TPU)
    ds = jax.lax.broadcasted_iota(jnp.int32, agg.shape, 2)
    far = jnp.abs(ds - best[..., None]) > 1
    big = jnp.asarray(jnp.finfo(agg.dtype).max, agg.dtype)
    second = jnp.min(jnp.where(far, agg, big), axis=-1).astype(jnp.float32)
    unique_ok = second * (100 - cfg.uniqueness_ratio) >= cmin * 100

    # parabola subpixel around the winner: the d-1/d+1 neighbours via
    # one-hot masked reductions — pure elementwise-select + lane reduce
    # (fuses with the `far` pass above), where take_along_axis lowers to a
    # per-pixel gather that cost a dedicated multi-GB volume pass (r5
    # roofline: wta moved 2.9 GB, ~35 ms)
    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    take = lambda i: jnp.min(
        jnp.where(ds == i[..., None], agg, big), axis=-1
    ).astype(jnp.float32)
    c0, cl, cr = cmin, take(bm1), take(bp1)
    denom = cl + cr - 2.0 * c0
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      0.5 * (cl - cr) / jnp.maximum(denom, 1e-9), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (best > 0) & (best < D - 1)
    disp = best.astype(jnp.float32) + jnp.where(interior, delta, 0.0) \
        + cfg.min_disparity
    return disp, unique_ok


def _lr_check(agg: jnp.ndarray, disp_left: jnp.ndarray,
              cfg: SgbmConfig) -> jnp.ndarray:
    """Left-right consistency from the SAME aggregated volume:
    right-image disparity d_R(x) = argmin_d agg(x + d, d); accept left pixel
    if |d_L(x) - d_R(x - d_L)| <= disp12MaxDiff (OpenCV semantics)."""
    H, W, D = agg.shape
    xs = jnp.arange(W)
    # cost of right pixel x at disparity d lives at left pixel x + d: a
    # per-d diagonal shift, done as D contiguous dynamic slices over a
    # padded volume instead of a (H, W, D) random gather
    aggT = jnp.moveaxis(agg, -1, 0)                     # (D, H, W)
    aggT_pad = jnp.pad(aggT, ((0, 0), (0, 0), (0, D)),
                       constant_values=jnp.inf)

    def shift_d(a2d, d):
        return jax.lax.dynamic_slice(a2d, (0, d), (H, W))

    right_cost = jax.vmap(shift_d)(aggT_pad, jnp.arange(D))   # (D, H, W)
    d_right = jnp.argmin(right_cost, axis=0).astype(jnp.float32)
    # sample d_right at x - d_L
    xl = jnp.clip((xs[None, :] - disp_left).astype(jnp.int32), 0, W - 1)
    d_r_at = jnp.take_along_axis(d_right, xl, axis=1)
    return jnp.abs(disp_left - d_r_at) <= cfg.disp12_max_diff + 0.5


def _speckle_filter(disp: jnp.ndarray, valid: jnp.ndarray,
                    cfg: SgbmConfig) -> jnp.ndarray:
    """Reject small isolated blobs (OpenCV filterSpeckles semantics):
    neighbours are connected if |d1 - d2| <= speckleRange/16; components
    smaller than speckleWindowSize pixels are invalidated."""
    H, W = disp.shape
    rng = cfg.speckle_range / 16.0

    def conn(ax, sh):
        nd = jnp.roll(disp, sh, ax)
        nv = jnp.roll(valid, sh, ax)
        return nv & (jnp.abs(disp - nd) <= rng)

    same = (conn(0, 1), conn(0, -1), conn(1, 1), conn(1, -1))
    # each run-min hook reaches across whole row/column runs and pointer
    # jumping compounds the reach geometrically; 4 sweeps converge even a
    # 20-run serpentine (test_speckle_serpentine_component_survives — 3
    # single-jump sweeps split it into 7 pieces). Measured on TPU (r5):
    # 3 sweeps with double jumps is SLOWER (82 vs 74.5 ms full-SGBM) —
    # the 470k-element gathers cost more than the hook they replace, so
    # the 4x1 schedule stays the default.
    lbl = connected_components(valid, same, sweeps=cfg.speckle_cc_sweeps,
                               jumps=cfg.speckle_cc_jumps)
    sizes = jnp.zeros(H * W, jnp.int32).at[lbl.reshape(-1)].add(
        valid.reshape(-1).astype(jnp.int32))
    comp_size = sizes[lbl]
    return valid & (comp_size >= cfg.speckle_window_size)


@partial(jax.jit, static_argnames=("cfg",))
def compute(left: jnp.ndarray, right: jnp.ndarray,
            cfg: SgbmConfig = SgbmConfig()) -> SgbmResult:
    """Full SGBM disparity for a rectified pair (H, W) in [0, 1]."""
    vol = _cost_volume(left, right, cfg)
    agg = _aggregate(vol, cfg)
    disp, unique_ok = _wta_subpixel(agg, cfg)
    lr_ok = _lr_check(agg, disp, cfg)
    valid = unique_ok & lr_ok & (disp > cfg.min_disparity)
    valid = _speckle_filter(disp, valid, cfg)
    return SgbmResult(disparity=jnp.where(valid, disp, INVALID), valid=valid)
