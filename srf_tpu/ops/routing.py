"""Dynamic routing cores: DR (parallel over time) and SDR (time recurrence).

This is the heart of the Sequential Routing Framework. The reference ships
three kernel flavors — "naive" (tiled weights,
tfsr/model/sequence_router_naive.py), "lowmemory" (weight multiply inside the
time loop, tfsr/model/sequence_router_lowmemory.py) and "einsum"
(tfsr/model/sequence_router_einsum.py). All three compute the same math; here
they collapse into one implementation expressed the XLA way:

- prediction vectors ``u_hat = W·u + b`` as one einsum (MXU),
- **DR** (dynamic routing, ``--model-caps-context=False``): an unrolled loop
  over routing iterations, all timesteps routed in parallel
  (reference math: sequence_router_naive.py:200-206),
- **SDR** (sequence-wise DR, ``--model-caps-context=True``): a ``lax.scan``
  over time whose carry is the previous timestep's output capsules; routing
  logits at step t start from the agreement with ``v_{t-1}``
  (reference math: sequence_router_naive.py:213-245, the
  ``tf.while_loop`` + TensorArray there becomes the scan). The weight
  multiply happens inside the scan body, which is the "lowmemory" memory
  plan — O(B·in_n·out_n·out_d) live instead of O(T·...) — and is what a TPU
  wants anyway,
- PAD-capsule masking: at the last capsule layer the routing logit of output
  capsule 0 (the PAD class) gets -1e9 so nothing routes to it
  (reference: sequence_router_naive.py:174-178,219-220).

Known reference quirk deliberately *not* reproduced: the lowmemory variant's
DR path never applies the transformation matrix to ``u_hat``
(sequence_router_lowmemory.py:161-192 routes the tiled inputs directly);
that is a bug that only type-checks when in_d == out_d. We always apply W.

Shapes:
    u      [B, T, in_n, in_d]      input capsules (after windowing)
    W      [in_n, out_n, out_d, in_d]
    bias   [in_n, out_n, out_d]
    v      [B, T, out_n, out_d]    output capsules
"""

import jax
import jax.numpy as jnp

from srf_tpu.ops.squash import squash

NEG_INF = -1e9


def window_stack(u, lpad, rpad):
    """Contextual windowing: concat shifted copies along the capsule axis.

    [B, T, n, d] -> [B, T, (lpad+rpad+1)*n, d]; copy i is the input
    zero-padded (lpad, rpad) in time then sliced [i : i+T]
    (reference: sequence_router_naive.py:150-151).
    """
    window = lpad + rpad + 1
    if window == 1:
        return u
    seq_len = u.shape[1]
    padded = jnp.pad(u, ((0, 0), (lpad, rpad), (0, 0), (0, 0)))
    shifted = [padded[:, i : i + seq_len] for i in range(window)]
    return jnp.concatenate(shifted, axis=2)


def predict_capsules(u, wgt, bias):
    """u_hat = W·u + b for every timestep: [B, T, in_n, out_n, out_d]."""
    u_hat = jnp.einsum(
        "noij,btnj->btnoi", wgt, u, preferred_element_type=jnp.float32
    )
    return u_hat + bias[None, None]


def dynamic_routing(u_hat, num_iter, mask_pad_capsule):
    """DR: route all timesteps in parallel.

    Per iteration (reference: sequence_router_naive.py:200-206):
        b += pad_mask ; c = softmax(b, out) ; s = sum_in(c * u_hat)
        v = squash(s) ; b += <u_hat, v>
    """
    batch, seq_len, in_n, out_n, _ = u_hat.shape
    b = jnp.zeros((batch, seq_len, in_n, out_n), u_hat.dtype)
    pad_mask = _pad_capsule_mask(out_n, u_hat.dtype) if mask_pad_capsule else None
    v = None
    for _ in range(num_iter):
        if pad_mask is not None:
            b = b + pad_mask
        c = jax.nn.softmax(b, axis=3)
        s = jnp.einsum("btno,btnoi->btoi", c, u_hat)
        v = squash(s, axis=-1)
        b = b + jnp.einsum("btnoi,btoi->btno", u_hat, v)
    return v


def _pad_capsule_mask(out_n, dtype):
    """[out_n] vector: -1e9 at index 0 (the PAD class), 0 elsewhere."""
    return jnp.where(jnp.arange(out_n) == 0, NEG_INF, 0.0).astype(dtype)


def _sdr_step(u_hat_t, v_prev, num_iter, pad_mask):
    """One SDR timestep given u_hat_t [B, in_n, out_n, out_d].

    Routing logits accumulate agreement with v across the (unrolled)
    iterations; the first agreement term uses the *previous timestep's*
    output capsules (reference: sequence_router_naive.py:222-227).
    """
    b = jnp.zeros(u_hat_t.shape[:3], u_hat_t.dtype)  # [B, in_n, out_n]
    v = v_prev
    for _ in range(num_iter):
        b = b + jnp.einsum("bnoi,boi->bno", u_hat_t, v)
        if pad_mask is not None:
            b = b + pad_mask
        c = jax.nn.softmax(b, axis=2)
        s = jnp.einsum("bno,bnoi->boi", c, u_hat_t)
        v = squash(s, axis=-1)
    return v


def sequential_routing(u, wgt, bias, num_iter, mask_pad_capsule,
                       time_chunk=None, remat=False, unroll=1,
                       precompute=False):
    """SDR: scan over time, carrying the previous output capsules.

    ``u`` is [B, T, in_n, in_d]; the weight multiply runs inside the scan
    body (lowmemory plan). Returns [B, T, out_n, out_d].

    ``time_chunk``: if set, the prediction einsum is hoisted out of the scan
    in chunks of this many timesteps to batch the matmul for the MXU while
    bounding live memory (the naive-vs-lowmemory tradeoff as a tile size).

    ``remat``: checkpoint the scan body — the backward pass recomputes the
    per-step routing chain instead of reading saved residuals from HBM
    (trades VPU flops for HBM bandwidth on the sequential hot path).
    """
    out_n = wgt.shape[1]
    out_d = wgt.shape[2]
    batch = u.shape[0]
    in_dtype = u.dtype
    pad_mask = (
        _pad_capsule_mask(out_n, jnp.float32) if mask_pad_capsule else None
    )
    # the routing recurrence itself runs in f32 regardless of the compute
    # dtype: u_hat accumulates in f32 (MXU preferred type) and the scan
    # carry must be dtype-stable
    v0 = jnp.zeros((batch, out_n, out_d), jnp.float32)

    if precompute:
        # "naive" memory plan the XLA way: one big MXU einsum for every
        # timestep's prediction vectors, then a scan that only routes
        # (reference: sequence_router_naive.py:154-159). Trades HBM traffic
        # (u_hat is [B,T,in_n,out_n,out_d]) for a batched matmul.
        u_hat_all = jnp.moveaxis(
            predict_capsules(u, wgt, bias), 1, 0
        )  # [T, B, in_n, out_n, out_d]

        def route_body(v_prev, u_hat_t):
            v = _sdr_step(u_hat_t, v_prev, num_iter, pad_mask)
            return v, v

        if remat:
            route_body = jax.checkpoint(route_body)
        _, vs = jax.lax.scan(route_body, v0, u_hat_all, unroll=unroll)
        return jnp.moveaxis(vs, 0, 1).astype(in_dtype)

    if time_chunk is None or time_chunk <= 1:
        u_t_major = jnp.moveaxis(u, 1, 0)  # [T, B, in_n, in_d]

        def body(v_prev, u_t):
            u_hat_t = (
                jnp.einsum("noij,bnj->bnoi", wgt, u_t,
                           preferred_element_type=jnp.float32)
                + bias[None]
            )
            v = _sdr_step(u_hat_t, v_prev, num_iter, pad_mask)
            return v, v

        if remat:
            body = jax.checkpoint(body)
        _, vs = jax.lax.scan(body, v0, u_t_major, unroll=unroll)
        return jnp.moveaxis(vs, 0, 1).astype(in_dtype)

    # chunked: precompute u_hat for `time_chunk` steps at once (MXU batch),
    # then scan the routing recurrence inside the chunk.
    seq_len = u.shape[1]
    pad_t = (-seq_len) % time_chunk
    if pad_t:
        u = jnp.pad(u, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
    n_chunks = u.shape[1] // time_chunk
    u_chunks = u.reshape(batch, n_chunks, time_chunk, *u.shape[2:])
    u_chunks = jnp.moveaxis(u_chunks, 1, 0)  # [C, B, tc, in_n, in_d]

    def chunk_body(v_prev, u_c):
        u_hat_c = (
            jnp.einsum("noij,btnj->btnoi", wgt, u_c,
                       preferred_element_type=jnp.float32)
            + bias[None, None]
        )  # [B, tc, in_n, out_n, out_d]
        u_hat_t_major = jnp.moveaxis(u_hat_c, 1, 0)

        def step(v_p, u_hat_t):
            v = _sdr_step(u_hat_t, v_p, num_iter, pad_mask)
            return v, v

        v_last, vs = jax.lax.scan(step, v_prev, u_hat_t_major)
        return v_last, jnp.moveaxis(vs, 0, 1)

    _, vs = jax.lax.scan(chunk_body, v0, u_chunks)
    vs = jnp.moveaxis(vs, 0, 1).reshape(batch, -1, out_n, out_d)
    return vs[:, :seq_len].astype(in_dtype)


def route_layer(u, wgt, bias, num_iter, is_context, is_last_layer,
                time_chunk=None, impl="xla", remat=False, unroll=1):
    """One capsule layer: prediction + routing (DR or SDR).

    ``impl``: "xla" (lax.scan, weight multiply in the body — lowmemory
    plan), "xla_pre" (u_hat precomputed as one batched einsum — naive
    plan), or "pallas" (fused kernel, ops/routing_pallas.py) for the SDR
    path; DR is always plain XLA (fully parallel over time, nothing to
    fuse beyond what XLA already does).
    """
    if is_context:
        if impl == "pallas":
            from srf_tpu.ops.routing_pallas import sequential_routing_pallas

            return sequential_routing_pallas(
                u, wgt, bias, num_iter, is_last_layer
            )
        return sequential_routing(
            u, wgt, bias, num_iter, mask_pad_capsule=is_last_layer,
            time_chunk=time_chunk, remat=remat, unroll=unroll,
            precompute=(impl == "xla_pre"),
        )
    u_hat = predict_capsules(u, wgt, bias)
    out = dynamic_routing(u_hat, num_iter, mask_pad_capsule=is_last_layer)
    return out.astype(u.dtype)
