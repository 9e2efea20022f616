"""Ring (sequence-parallel) attention for the STF path over a device mesh.

Beyond-parity TPU capability (the reference is single-GPU DP only —
SURVEY.md §5 "long-context handling"): the time axis is sharded across a
mesh axis, each device holds Q/K/V shards [B, H, T/n, D], and K/V (plus
the key padding mask) rotate around the ring with ``jax.lax.ppermute``
while the flash-style online-softmax accumulates — the same recurrence as
ops/blockwise_attention.py, with the rotating shard as the key block. The
[T, T] attention weights never exist on any single chip and per-chip
attention memory drops from O(T^2) to O(T^2/n); the ppermute rides the ICI
neighbor links (the "How to Scale Your Model" ring-collective recipe).

The distance penalty is applied in the same closed form per (query-shard,
key-shard) tile using GLOBAL positions, so results are bit-comparable to
the single-device blockwise path (tested on an 8-virtual-device CPU mesh
in tests/test_ring_attention.py, values and gradients).

Gradients flow through ppermute (its transpose is the reverse ppermute),
so the same code path trains — demonstrated by the sp axis of
__graft_entry__.dryrun_multichip.

Attention dropout is intentionally unsupported here: exact parity of
dropout draws across different shardings is impossible, and the sp regime
(very long utterances) is an eval/serving path first. Train with dropout
on the blockwise path; fine-tune long-context with dropout_rate 0.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from srf_tpu.ops.blockwise_attention import (
    PenaltyParams,
    online_softmax_step,
)


def ring_attention_local(query, key, value, kv_mask=None,
                         penalty: Optional[PenaltyParams] = None,
                         axis_name: str = "seq", n_shards: int = 1):
    """Per-shard body — call INSIDE shard_map.

    Args:
        query/key/value: this device's time shard, [B, H, T/n, D].
        kv_mask: this device's key padding-mask shard [B, 1, 1, T/n]
            (1 = padded), rotating with K/V.
        penalty: closed-form distance-penalty params (global positions).
        axis_name: mesh axis the time dimension is sharded over.
        n_shards: static size of that axis.
    Returns [B, H, T/n, D] — the attention output for this device's
    queries against ALL keys.
    """
    batch, heads, t_local, depth = query.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32))
    my_idx = jax.lax.axis_index(axis_name)
    q_pos = my_idx * t_local + jnp.arange(t_local)
    q_scaled = query.astype(jnp.float32) * scale
    if kv_mask is None:
        kv_mask = jnp.zeros((batch, 1, 1, t_local), jnp.float32)

    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    m_run = jnp.full((batch, heads, t_local), -jnp.inf, jnp.float32)
    l_run = jnp.zeros((batch, heads, t_local), jnp.float32)
    acc = jnp.zeros((batch, heads, t_local, depth), jnp.float32)

    k_blk, v_blk, msk_blk = key, value, kv_mask
    for step in range(n_shards):
        src_idx = (my_idx + step) % n_shards
        k_pos = src_idx * t_local + jnp.arange(t_local)
        # the SAME online-softmax recurrence as blockwise_attention —
        # shared helper so the two kernels cannot drift (the parity
        # tests assert bit-equality of their outputs)
        m_run, l_run, acc = online_softmax_step(
            (m_run, l_run, acc), q_scaled, q_pos, k_blk, v_blk, msk_blk,
            k_pos, penalty,
        )
        if step + 1 < n_shards:
            # rotate: receive the next shard from the right neighbor while
            # this step's compute retires (XLA overlaps ppermute with the
            # next iteration's einsum where the schedule allows)
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            msk_blk = jax.lax.ppermute(msk_blk, axis_name, perm)

    out = acc / jnp.maximum(l_run, 1e-30)[..., None]
    return out.astype(query.dtype)


def ring_attention(query, key, value, mesh, mask=None,
                   penalty: Optional[PenaltyParams] = None,
                   axis_name: str = "seq", batch_axis: Optional[str] = None):
    """Sequence-parallel attention over ``mesh[axis_name]``.

    Drop-in (eval/no-dropout) replacement for blockwise_attention: global
    shapes in, global shapes out; shard_map handles the T-axis sharding.
    T must divide evenly by the axis size — pad + mask upstream otherwise
    (serve-side padding already rounds utterances up).

    ``batch_axis``: optionally also shard the batch dim over a mesh axis
    (dp x sp — each data-parallel group runs its own ring).
    """
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape[axis_name]
    seq_len = query.shape[2]
    if seq_len % n_shards:
        raise ValueError(
            "ring_attention: T=%d not divisible by %s=%d"
            % (seq_len, axis_name, n_shards)
        )
    if mask is None:
        mask = jnp.zeros(
            (query.shape[0], 1, 1, seq_len), jnp.float32
        )
    body = functools.partial(
        ring_attention_local, penalty=penalty, axis_name=axis_name,
        n_shards=n_shards,
    )
    spec = P(batch_axis, None, axis_name, None)
    mspec = P(batch_axis, None, None, axis_name)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, mspec),
        out_specs=spec,
    )(query, key, value, mask)
