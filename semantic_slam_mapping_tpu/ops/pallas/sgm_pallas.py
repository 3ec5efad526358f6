"""Pallas TPU kernel for SGM path aggregation.

The SGM recurrence is the one stage of this framework where XLA's generic
`lax.scan` lowering leaves time on the table: thousands of tiny sequential
steps whose (X, D) carry easily fits VMEM. This kernel maps the scan onto
the Pallas grid: TPU grid steps execute sequentially on a core, so a VMEM
scratch buffer carries the running path costs across steps while Pallas
auto-double-buffers the (X, D) row-slices of the HBM-resident cost volume
in and out. One call per direction; ops/sgbm.py sums them.

Used by ops/sgbm.py on TPU (interpret mode keeps CPU tests exact); the
`lax.scan` implementation remains as the portable reference
(`_sgm_scan_bidir`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sgm_dir_kernel(cost_ref, out_ref, carry_ref, *, p1: float, p2: float):
    """One grid step = one scan row. cost_ref/out_ref: (1, X, D) VMEM
    blocks; carry_ref: (X, D) VMEM scratch persisting across grid steps."""
    i = pl.program_id(0)
    # f32 accumulation over a (possibly bf16) cost volume: the running
    # path costs live in the f32 VMEM scratch; only the HBM-resident
    # volume and output keep the compact dtype
    c = cost_ref[0].astype(jnp.float32)
    big = jnp.float32(1e9)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = c

    @pl.when(i > 0)
    def _():
        carry = carry_ref[:]
        prev_min = jnp.min(carry, axis=-1, keepdims=True)
        up = jnp.concatenate([carry[:, :1] + big, carry[:, :-1]], axis=-1)
        dn = jnp.concatenate([carry[:, 1:], carry[:, -1:] + big], axis=-1)
        best = jnp.minimum(jnp.minimum(carry, prev_min + p2),
                           jnp.minimum(up + p1, dn + p1))
        carry_ref[:] = c + best - prev_min

    out_ref[0] = carry_ref[:].astype(out_ref.dtype)


def _sgm_one_direction(cost: jnp.ndarray, p1: float, p2: float,
                       reverse: bool, interpret: bool) -> jnp.ndarray:
    S, X, D = cost.shape
    if reverse:
        index_map = lambda i: (S - 1 - i, 0, 0)
    else:
        index_map = lambda i: (i, 0, 0)
    return pl.pallas_call(
        functools.partial(_sgm_dir_kernel, p1=p1, p2=p2),
        grid=(S,),
        in_specs=[pl.BlockSpec((1, X, D), index_map,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, X, D), index_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, X, D), cost.dtype),
        scratch_shapes=[pltpu.VMEM((X, D), jnp.float32)],
        interpret=interpret,
    )(cost)


@functools.partial(jax.jit, static_argnames=("p1", "p2", "interpret"))
def sgm_bidir_pallas(cost: jnp.ndarray, p1: float, p2: float,
                     interpret: bool = False) -> jnp.ndarray:
    """Bidirectional SGM aggregation along axis 0 of (S, X, D) cost.
    Same contract as ops.sgbm._sgm_scan_bidir: sum of forward and backward
    directional path costs."""
    fwd = _sgm_one_direction(cost, p1, p2, False, interpret)
    bwd = _sgm_one_direction(cost, p1, p2, True, interpret)
    return fwd + bwd
