"""Post-training int8 weight quantization for serving.

No reference analog (the reference serves f32 through its trainers'
decode mode). The win at reference model scales is FOOTPRINT, not
latency: 4x smaller resident weights (f32 -> int8 + per-channel f32
scales) lets dozens of models stay hot-loaded per chip for multi-tenant
serving, while the matmuls still run in f32/bf16 after an in-kernel
dequantize (weight-only; activations untouched, so no calibration data
is needed). Measured on v5e (BENCH_NOTES r3/r4): the ~85 MB reference
forwards are NOT weight-bandwidth-bound (batch-1 int8 is 0.8-0.9x f32;
a pure Dense-FFN stack of the same shapes IS 1.3x faster int8, so the
fusion works — the full model just doesn't spend its time on the weight
stream). Expect latency wins only on much larger FFN-dominated models.

Scheme: symmetric per-output-channel int8. For a kernel whose LAST axis
is the output-features axis (flax Dense [in, out], Conv [kh, kw, cin,
out] — both hold), scale[o] = max|w[..., o]| / 127 and
q = round(w / scale). Dequantized error is <= scale/2 per element
(~0.4% of the channel's max), which leaves greedy/beam decodes unchanged
on every model family tested (tests/test_quant.py).

Quantized leaves are replaced by ``{"__srf_int8__q": int8,
"__srf_int8__scale": f32[out]}`` sub-dicts (the marker lives in the KEY
so the pytree structure itself is the tag — values stay jit-traceable); ``dequantize_tree`` restores the original pytree structure —
run it INSIDE the jitted forward so only the int8 copy lives in HBM.
1-D leaves (biases, LayerNorm), tiny tensors, and non-float leaves pass
through unquantized.
"""

import jax
import jax.numpy as jnp


_QKEY = "__srf_int8__q"
_SKEY = "__srf_int8__scale"


def _should_quantize(x, min_size, max_ndim):
    return (
        hasattr(x, "dtype")
        and x.dtype == jnp.float32
        and 2 <= x.ndim <= max_ndim
        and x.size >= min_size
    )


def quantize_tree(params, min_size=4096, max_ndim=64):
    """f32 param pytree -> same tree with large >=2-D leaves replaced by
    {"__srf_int8__q": int8, "__srf_int8__scale": f32[last-axis]}.

    ``max_ndim=2`` restricts quantization to matmul (Dense) kernels,
    leaving conv kernels f32 — measured on v5e (BENCH_NOTES r4): feeding
    a dequantized operand into a convolution costs more than the saved
    weight bandwidth, while pure Dense stacks fuse the int8 read cleanly.
    """

    def leaf(x):
        if not _should_quantize(x, min_size, max_ndim):
            return x
        absmax = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)))
        scale = jnp.maximum(absmax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        return {_QKEY: q, _SKEY: scale.astype(jnp.float32)}

    return jax.tree.map(leaf, params)


def _is_qleaf(node):
    return isinstance(node, dict) and _QKEY in node


def dequantize_tree(qparams, dtype=jnp.float32):
    """Inverse of quantize_tree (call inside the jitted forward)."""

    def leaf(node):
        if _is_qleaf(node):
            return (node[_QKEY].astype(dtype)
                    * node[_SKEY].astype(dtype))
        return node

    return jax.tree.map(leaf, qparams, is_leaf=_is_qleaf)


def quantized_bytes(qparams):
    """(bytes_quantized_tree, bytes_f32_equivalent) for reporting."""
    q_bytes = 0
    f_bytes = 0

    def walk(node):
        nonlocal q_bytes, f_bytes
        if _is_qleaf(node):
            q_bytes += node[_QKEY].size + node[_SKEY].size * 4
            f_bytes += node[_QKEY].size * 4
            return
        if hasattr(node, "size"):
            nbytes = node.size * node.dtype.itemsize
            q_bytes += nbytes
            f_bytes += nbytes

    jax.tree.map(walk, qparams, is_leaf=_is_qleaf)
    return q_bytes, f_bytes
