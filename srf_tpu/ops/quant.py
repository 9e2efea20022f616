"""Post-training int8 weight quantization for serving.

No reference analog (the reference serves f32 through its trainers'
decode mode). Serving on TPU at small batch is HBM-bandwidth-bound: each
step streams the full weight set from HBM while the MXU idles, so
shrinking the resident weights 4x (f32 -> int8 + per-channel f32 scales)
is the lever — the matmuls still run in f32/bf16 after an in-kernel
dequantize (weight-only quantization; activations are untouched, so no
calibration data is needed).

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


def _should_quantize(x, min_size):
    return (
        hasattr(x, "dtype")
        and x.dtype == jnp.float32
        and x.ndim >= 2
        and x.size >= min_size
    )


def quantize_tree(params, min_size=4096):
    """f32 param pytree -> same tree with large >=2-D leaves replaced by
    {"__srf_int8__q": int8, "__srf_int8__scale": f32[last-axis]}."""

    def leaf(x):
        if not _should_quantize(x, min_size):
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
