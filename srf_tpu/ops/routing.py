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

    ``u_hat_t`` may be bfloat16 (deep mixed precision): the big products
    then run in bf16 while logits, softmax, squash and the carried v stay
    float32.
    """
    cd = u_hat_t.dtype
    b = jnp.zeros(u_hat_t.shape[:3], jnp.float32)  # [B, in_n, out_n]
    v = v_prev
    for _ in range(num_iter):
        b = b + jnp.einsum("bnoi,boi->bno", u_hat_t, v.astype(cd),
                           preferred_element_type=jnp.float32)
        if pad_mask is not None:
            b = b + pad_mask
        c = jax.nn.softmax(b, axis=2)
        s = jnp.einsum("bno,bnoi->boi", c.astype(cd), u_hat_t,
                       preferred_element_type=jnp.float32)
        v = squash(s, axis=-1)
    return v


def _sdr_step_factored(u_t, wgt, bias, v_prev, num_iter, pad_mask):
    """One SDR timestep WITHOUT materializing u_hat.

    ``u_hat = W·u + b`` is [B, in_n, out_n, out_d] — the dominant per-step
    temporary, and its trailing (out_n, out_d) dims suffer ~7x (8,128)
    tile padding on TPU (e.g. (30,20) pads to (32,128)). But routing only
    ever consumes u_hat through two contractions, so factor it away:

        logits[b,n,o] = <u_hat, v>        = (W^T v)·u  + bias·v
                        R[b,n,o,j] = sum_i W[n,o,i,j] v[b,o,i]   (MXU)
                        logits     = sum_j R·u + sum_i bias·v    (VPU)
        s[b,o,i]      = sum_n c·u_hat     = (c (x) u)·W + c·bias
                        P[b,o,n,j] = c[b,n,o]*u[b,n,j]           (VPU)
                        s          = sum_{nj} P·W + sum_n c·bias (MXU, K=n*j)

    The largest live tensors drop to [B, in_n, out_n, in_d]-sized R/P
    (flattenable), and the s-contraction runs on the MXU with a large
    reduction dim (in_n*in_d, e.g. 3000 for canonical WSJ) instead of
    per-timestep slivers. Exact same math as _sdr_step for every
    num_iter (iterations re-derive R from the updated v).
    """
    # bf16 mode: wgt/bias/u_t arrive pre-cast — v and c must be cast to
    # the same compute dtype per product or jnp.einsum type-promotes every
    # operand back to f32, silently discarding the mixed-precision mode
    # (logits accumulation, softmax, squash and the carried v stay f32)
    cd = u_t.dtype
    b_acc = jnp.zeros(
        (u_t.shape[0], u_t.shape[1], wgt.shape[1]), jnp.float32
    )
    v = v_prev
    for _ in range(num_iter):
        r = jnp.einsum("noij,boi->bnoj", wgt, v.astype(cd),
                       preferred_element_type=jnp.float32)
        b_acc = b_acc + (
            jnp.einsum("bnoj,bnj->bno", r.astype(cd), u_t,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("noi,boi->bno", bias, v.astype(cd),
                         preferred_element_type=jnp.float32)
        )
        if pad_mask is not None:
            b_acc = b_acc + pad_mask
        c = jax.nn.softmax(b_acc, axis=2)
        p = jnp.einsum("bno,bnj->bonj", c.astype(cd), u_t,
                       preferred_element_type=jnp.float32)
        s = (
            jnp.einsum("bonj,noij->boi", p, wgt,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bno,noi->boi", c.astype(cd), bias,
                         preferred_element_type=jnp.float32)
        )
        v = squash(s, axis=-1)
    return v


def window_slide(u, lpad, rpad):
    """Sliding windows WITHOUT edge padding: [B, T, n, d] ->
    [B, T-lpad-rpad, (lpad+rpad+1)*n, d] (same frame-major capsule order as
    window_stack). Used by streaming, where the context frames come from
    carried buffers instead of zero padding."""
    window = lpad + rpad + 1
    if window == 1:
        return u
    out_len = u.shape[1] - lpad - rpad
    shifted = [u[:, i : i + out_len] for i in range(window)]
    return jnp.concatenate(shifted, axis=2)


def sequential_routing(u, wgt, bias, num_iter, mask_pad_capsule,
                       time_chunk=None, remat=False, unroll=1,
                       precompute=False, compute_dtype=None,
                       v_init=None, step_valid=None, factored=False):
    """SDR: scan over time, carrying the previous output capsules.

    ``u`` is [B, T, in_n, in_d]; the weight multiply runs inside the scan
    body (lowmemory plan). Returns [B, T, out_n, out_d].

    ``time_chunk``: if set, the prediction einsum is hoisted out of the scan
    in chunks of this many timesteps to batch the matmul for the MXU while
    bounding live memory (the naive-vs-lowmemory tradeoff as a tile size).

    ``remat``: checkpoint the scan body — the backward pass recomputes the
    per-step routing chain instead of reading saved residuals from HBM
    (trades VPU flops for HBM bandwidth on the sequential hot path).

    ``compute_dtype``: if set (e.g. jnp.bfloat16), the prediction vectors
    and routing products inside the scan body run in this dtype; the scan
    carry, softmax and squash stay float32 for recurrence stability.

    ``v_init``: initial carry [B, out_n, out_d] (streaming: the previous
    chunk's last output capsules); defaults to zeros (reference: v0 = 0,
    sequence_router_lowmemory.py:169).

    ``step_valid``: optional [T] bool; invalid steps contribute zero output
    AND a zero carry (streaming warm-up frames before t=0, which the
    batch implementation realizes as window zero padding).
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
    if v_init is None:
        v0 = jnp.zeros((batch, out_n, out_d), jnp.float32)
    else:
        v0 = v_init.astype(jnp.float32)
    if (v_init is not None or step_valid is not None) and (
            precompute or (time_chunk is not None and time_chunk > 1)):
        raise NotImplementedError(
            "v_init/step_valid require the plain scan path"
        )

    if precompute:
        # "naive" memory plan the XLA way: one big MXU einsum for every
        # timestep's prediction vectors, then a scan that only routes
        # (reference: sequence_router_naive.py:154-159). Trades HBM traffic
        # (u_hat is [B,T,in_n,out_n,out_d]) for a batched matmul.
        # compute_dtype: the batched prediction runs (and u_hat is stored)
        # in the requested dtype — previously silently ignored here.
        cdp = compute_dtype or jnp.float32
        u_hat_all = jnp.moveaxis(
            predict_capsules(
                u.astype(cdp), wgt.astype(cdp), bias.astype(cdp)
            ).astype(cdp), 1, 0
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
        cd = compute_dtype or jnp.float32
        wgt_c = wgt.astype(cd)
        bias_c = bias.astype(cd)

        def body(v_prev, x):
            u_t = x[0] if step_valid is not None else x
            if factored:
                v = _sdr_step_factored(
                    u_t.astype(cd), wgt_c, bias_c, v_prev, num_iter,
                    pad_mask,
                )
            else:
                u_hat_t = (
                    jnp.einsum("noij,bnj->bnoi", wgt_c, u_t.astype(cd),
                               preferred_element_type=cd)
                    + bias_c[None]
                )
                v = _sdr_step(u_hat_t, v_prev, num_iter, pad_mask)
            if step_valid is not None:
                v = jnp.where(x[1], v, 0.0)
            return v, v

        if remat:
            body = jax.checkpoint(body)
        xs = (u_t_major, step_valid) if step_valid is not None else u_t_major
        _, vs = jax.lax.scan(body, v0, xs, unroll=unroll)
        return jnp.moveaxis(vs, 0, 1).astype(in_dtype)

    # chunked: precompute u_hat for `time_chunk` steps at once (MXU batch),
    # then scan the routing recurrence inside the chunk. Chunking IS the
    # materialized plan, so `factored` does not apply here; remat,
    # compute_dtype and unroll are honored like the plain scan path.
    seq_len = u.shape[1]
    pad_t = (-seq_len) % time_chunk
    if pad_t:
        u = jnp.pad(u, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
    n_chunks = u.shape[1] // time_chunk
    u_chunks = u.reshape(batch, n_chunks, time_chunk, *u.shape[2:])
    u_chunks = jnp.moveaxis(u_chunks, 1, 0)  # [C, B, tc, in_n, in_d]
    cdc = compute_dtype or jnp.float32
    wgt_cc = wgt.astype(cdc)
    bias_cc = bias.astype(cdc)

    def chunk_body(v_prev, u_c):
        u_hat_c = (
            jnp.einsum("noij,btnj->btnoi", wgt_cc, u_c.astype(cdc),
                       preferred_element_type=cdc)
            + bias_cc[None, None]
        )  # [B, tc, in_n, out_n, out_d]
        u_hat_t_major = jnp.moveaxis(u_hat_c, 1, 0)

        def step(v_p, u_hat_t):
            v = _sdr_step(u_hat_t, v_p, num_iter, pad_mask)
            return v, v

        v_last, vs = jax.lax.scan(step, v_prev, u_hat_t_major)
        return v_last, jnp.moveaxis(vs, 0, 1)

    if remat:
        chunk_body = jax.checkpoint(chunk_body)
    _, vs = jax.lax.scan(chunk_body, v0, u_chunks, unroll=unroll)
    vs = jnp.moveaxis(vs, 0, 1).reshape(batch, -1, out_n, out_d)
    return vs[:, :seq_len].astype(in_dtype)


def _group_matrix(out_n, out_d, dtype=jnp.float32):
    """[out_no, out_n] 0/1 matrix mapping flattened capsule lanes to their
    capsule index; lets per-capsule reductions (routing logits, squared
    norms) run as lane-friendly matmuls on [*, out_no] tensors."""
    out_no = out_n * out_d
    eye = jnp.eye(out_n, dtype=dtype)
    return jnp.repeat(eye, out_d, axis=0)


def _sdr_step_flat(u_hat, v_prev, num_iter, pad_row, g, gt):
    """One SDR timestep in the flat (lane-major) layout.

    u_hat [B, in_n, out_no], v_prev [B, out_no] -> v [B, out_no]. Same math
    as _sdr_step but every tensor keeps out_no (= out_n*out_d, ~240) in the
    lane dimension instead of out_d (= 8): VPU ops use ~full 128-lane rows
    rather than 8/128, and the scan carry/stack tensors avoid the 17x
    (8,128)-tile padding that [*, out_n, out_d] layouts suffer.
    """
    b_acc = jnp.zeros((u_hat.shape[0], u_hat.shape[1], g.shape[1]),
                      jnp.float32)
    v = v_prev
    for _ in range(num_iter):
        b_acc = b_acc + jnp.einsum(
            "bnk,ko->bno", u_hat * v[:, None, :], g,
            preferred_element_type=jnp.float32,
        )
        if pad_row is not None:
            b_acc = b_acc + pad_row
        c = jax.nn.softmax(b_acc, axis=2)
        ce = jnp.einsum("bno,ok->bnk", c, gt,
                        preferred_element_type=jnp.float32)
        s = jnp.sum(u_hat * ce, axis=1)  # [B, out_no]
        sq = jnp.einsum("bk,ko->bo", s * s, g,
                        preferred_element_type=jnp.float32)
        factor = (sq / (1.0 + sq)) / jnp.sqrt(sq + 1e-7)
        v = s * jnp.einsum("bo,ok->bk", factor, gt,
                           preferred_element_type=jnp.float32)
    return v


def _sequential_routing_flat(u, wgt, bias, num_iter, mask_pad_capsule,
                             remat=False, unroll=1):
    """SDR scan with the flat lane-major layout (see _sdr_step_flat)."""
    batch, seq_len, in_n, in_d = u.shape
    _, out_n, out_d, _ = wgt.shape
    out_no = out_n * out_d
    in_dtype = u.dtype
    # [in_d, in_n, out_no]: the prediction multiply unrolls over in_d (~8)
    # as wide VPU multiply-adds on [B, in_n, out_no]
    w_flat = jnp.transpose(wgt, (3, 0, 1, 2)).reshape(in_d, in_n, out_no)
    b_flat = bias.reshape(in_n, out_no)
    g = _group_matrix(out_n, out_d)
    gt = jnp.transpose(g)
    pad_row = (
        jnp.where(jnp.arange(out_n) == 0, NEG_INF, 0.0)[None, None]
        if mask_pad_capsule else None
    )
    v0 = jnp.zeros((batch, out_no), jnp.float32)
    xs = jnp.moveaxis(u.astype(jnp.float32), 1, 0)  # [T, B, in_n, in_d]

    def body(v_prev, u_t):
        u_hat = b_flat[None]
        for i in range(in_d):
            u_hat = u_hat + u_t[:, :, i][..., None] * w_flat[i][None]
        v = _sdr_step_flat(u_hat, v_prev, num_iter, pad_row, g, gt)
        return v, v

    if remat:
        body = jax.checkpoint(body)
    _, vs = jax.lax.scan(body, v0, xs, unroll=unroll)
    vs = jnp.moveaxis(vs, 0, 1).reshape(batch, seq_len, out_n, out_d)
    return vs.astype(in_dtype)


def _ln_drop(flat, scale, ln_bias, ln_eps, dropout_rate, key):
    """Flattened-capsule LayerNorm + (optional) inverted dropout.

    ``flat`` [..., out_n*out_d]; LN normalizes the trailing axis (matching
    nn.LayerNorm on the flattened capsule tensor, reference:
    sequence_router_naive.py:196-201)."""
    mean = jnp.mean(flat, axis=-1, keepdims=True)
    var = jnp.var(flat, axis=-1, keepdims=True)
    flat = (flat - mean) * jax.lax.rsqrt(var + ln_eps)
    flat = flat * scale + ln_bias
    if key is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, flat.shape)
        flat = jnp.where(keep, flat / (1.0 - dropout_rate), 0.0)
    return flat


def wavefront_sdr_stack(u, layer_params, lpad, rpad, num_iter,
                        ln_params, ln_eps=1e-3, dropout_rate=0.0,
                        dropout_rng=None, remat=True, factored=True):
    """Run the WHOLE capsule stack as ONE scan over time (true wavefront).

    The layered implementation runs ``L`` sequential scans of ``T`` steps
    each — L*T sequential routing steps, each paying the scan's fixed
    per-step cost on tiny operands. A capsule layer at time t only needs
    the previous layer's outputs in the window [t-lpad, t+rpad], so with a
    stagger of ``delay = rpad + 1`` timesteps per layer, layer i's work at
    scan step tau (its timestep ``t_i = tau - i*delay``) depends ONLY on
    buffers written at earlier steps — every layer's in-step work is
    independent. (The first version of this kernel staggered by ``rpad``,
    which made layer i consume layer i-1's same-step output: the critical
    path stayed L ops deep and nothing was won. delay must exceed rpad.)

    Two consequences the scheduler can cash in:
    - ONE scan of ``T + (L-1)*delay`` steps instead of L*T — the fixed
      per-step cost amortizes ~L-fold;
    - the (enc_num-2) middle layers share geometry (reference:
      sequence_router_naive.py:88-95), so their prediction einsums, routing
      and LayerNorms run STACKED over a leading layer axis — one batched
      einsum/VPU op over l*B instead of L-2 sequential small ops.

    Same math as the layered path (windowing zero-padding, per-layer
    flattened LayerNorm + dropout, PAD-capsule mask at the last layer —
    reference: sequence_router_naive.py:120-193); training-mode dropout
    draws differ (per-step fold_in) but are identically distributed.

    Args:
        u: [B, T, n0, d0] primary capsules (post input-LN/dropout).
        layer_params: list of (wgt [in_n,out_n,out_d,in_d], bias) per layer;
            in_n = window * prev_out_n.
        ln_params: list of (scale, bias) for the per-layer flattened
            LayerNorm (out_n*out_d,).
        dropout_rng: base PRNG key; None disables dropout (eval mode).
    Returns [B, T, class_n, class_d].
    """
    batch, seq_len = u.shape[0], u.shape[1]
    window = lpad + rpad + 1
    n_layers = len(layer_params)
    delay = rpad + 1
    total_steps = seq_len + (n_layers - 1) * delay

    prev_n, prev_d = u.shape[2], u.shape[3]
    for wgt, _ in layer_params:
        in_n, out_n, out_d, in_d = wgt.shape
        assert in_n == window * prev_n and in_d == prev_d, (
            wgt.shape, (window, prev_n, prev_d),
        )
        prev_n, prev_d = out_n, out_d

    # Single-layer stack degenerates to the plain scan
    if n_layers == 1:
        wgt, bias = layer_params[0]
        out = sequential_routing(
            window_stack(u, lpad, rpad), wgt, bias, num_iter,
            mask_pad_capsule=True, remat=remat, factored=factored,
        )
        flat = _ln_drop(
            out.reshape(batch, seq_len, -1), ln_params[0][0],
            ln_params[0][1], ln_eps, dropout_rate,
            dropout_rng,
        )
        return flat.reshape(batch, seq_len, out.shape[2], out.shape[3])

    # Layer 0 reads pre-windowed input directly (no buffer): window_stack
    # already realizes the zero padding; pad time out to total_steps.
    u_win = window_stack(u.astype(jnp.float32), lpad, rpad)
    u_win = jnp.pad(
        u_win, ((0, 0), (0, total_steps - seq_len), (0, 0), (0, 0))
    )
    xs_frames = jnp.moveaxis(u_win, 1, 0)  # [total, B, window*n0, d0]
    xs_tau = jnp.arange(total_steps)

    # Layers 0..L-2 all output [B, ch, cd]; their recent `window` outputs
    # feed layers 1..L-1 through ONE stacked ring buffer
    # buf[j, k] = layer j's output at step tau-window+k (time-ordered).
    ch, cd = layer_params[0][0].shape[1], layer_params[0][0].shape[2]
    class_n, class_d = layer_params[-1][0].shape[1], layer_params[-1][0].shape[2]
    n_mid = n_layers - 2
    w0, b0 = layer_params[0]
    w_last, b_last = layer_params[-1]
    if n_mid:
        w_mid = jnp.stack([layer_params[i][0] for i in range(1, n_layers - 1)])
        b_mid = jnp.stack([layer_params[i][1] for i in range(1, n_layers - 1)])
        ln_mid_scale = jnp.stack(
            [ln_params[i][0] for i in range(1, n_layers - 1)]
        )[:, None]  # [n_mid, 1, ch*cd]
        ln_mid_bias = jnp.stack(
            [ln_params[i][1] for i in range(1, n_layers - 1)]
        )[:, None]
    pad_mask = _pad_capsule_mask(class_n, jnp.float32)

    buf0 = jnp.zeros((n_layers - 1, window, batch, ch, cd), jnp.float32)
    v0_first = jnp.zeros((batch, ch, cd), jnp.float32)
    v0_mid = jnp.zeros((n_mid, batch, ch, cd), jnp.float32)
    v0_last = jnp.zeros((batch, class_n, class_d), jnp.float32)

    def _window_of(buf_rows):
        # [..., window, B, n, d] -> frame-major capsule concat
        # [..., B, window*n, d] (reference window_stack order)
        moved = jnp.moveaxis(buf_rows, -4, -3)  # [..., B, window, n, d]
        shape = moved.shape[:-3] + (window * moved.shape[-2], moved.shape[-1])
        return moved.reshape(shape)

    def body(carry, x):
        buf, v_first, v_mid, v_last = carry
        frame, tau = x

        # ---- layer 0: time tau, input = pre-windowed frame
        if factored:
            v0 = _sdr_step_factored(frame, w0, b0, v_first, num_iter, None)
        else:
            u_hat0 = (
                jnp.einsum("noij,bnj->bnoi", w0, frame,
                           preferred_element_type=jnp.float32)
                + b0[None]
            )
            v0 = _sdr_step(u_hat0, v_first, num_iter, None)
        valid0 = tau < seq_len
        key0 = (
            jax.random.fold_in(jax.random.fold_in(dropout_rng, 0), tau)
            if dropout_rng is not None else None
        )
        out0 = _ln_drop(
            v0.reshape(batch, ch * cd), ln_params[0][0], ln_params[0][1],
            ln_eps, dropout_rate, key0,
        ).reshape(batch, ch, cd)
        out0 = jnp.where(valid0, out0, 0.0)
        new_v_first = jnp.where(valid0, v0, 0.0)

        # ---- middle layers (stacked): layer i = m+1 at t = tau-(m+1)*delay
        if n_mid:
            u_mid = _window_of(buf[:n_mid])  # [n_mid, B, window*ch, cd]
            if factored:
                vm = jax.vmap(
                    lambda ut, w, b, vp: _sdr_step_factored(
                        ut, w, b, vp, num_iter, None
                    )
                )(u_mid, w_mid, b_mid, v_mid)
            else:
                u_hat_m = (
                    jnp.einsum("lnoij,lbnj->lbnoi", w_mid, u_mid,
                               preferred_element_type=jnp.float32)
                    + b_mid[:, None]
                )
                vm = jax.vmap(
                    lambda uh, vp: _sdr_step(uh, vp, num_iter, None)
                )(u_hat_m, v_mid)
            t_mid = tau - (jnp.arange(1, n_mid + 1)) * delay
            valid_m = jnp.logical_and(t_mid >= 0, t_mid < seq_len)[
                :, None, None, None
            ]
            if dropout_rng is not None and dropout_rate > 0.0:
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(
                        jax.random.fold_in(dropout_rng, i), tau
                    )
                )(jnp.arange(1, n_mid + 1))
                keep = jax.vmap(
                    lambda k: jax.random.bernoulli(
                        k, 1.0 - dropout_rate, (batch, ch * cd)
                    )
                )(keys)
            flat_m = vm.reshape(n_mid, batch, ch * cd)
            mean = jnp.mean(flat_m, axis=-1, keepdims=True)
            var = jnp.var(flat_m, axis=-1, keepdims=True)
            flat_m = (flat_m - mean) * jax.lax.rsqrt(var + ln_eps)
            flat_m = flat_m * ln_mid_scale + ln_mid_bias
            if dropout_rng is not None and dropout_rate > 0.0:
                flat_m = jnp.where(
                    keep, flat_m / (1.0 - dropout_rate), 0.0
                )
            out_m = jnp.where(
                valid_m, flat_m.reshape(n_mid, batch, ch, cd), 0.0
            )
            new_v_mid = jnp.where(valid_m, vm, 0.0)
        else:
            out_m = v_mid  # empty [0, ...]
            new_v_mid = v_mid

        # ---- last layer: t = tau-(L-1)*delay, PAD-capsule mask
        u_last = _window_of(buf[n_layers - 2])  # [B, window*ch, cd]
        if factored:
            vl = _sdr_step_factored(
                u_last, w_last, b_last, v_last, num_iter, pad_mask
            )
        else:
            u_hat_l = (
                jnp.einsum("noij,bnj->bnoi", w_last, u_last,
                           preferred_element_type=jnp.float32)
                + b_last[None]
            )
            vl = _sdr_step(u_hat_l, v_last, num_iter, pad_mask)
        t_last = tau - (n_layers - 1) * delay
        valid_l = jnp.logical_and(t_last >= 0, t_last < seq_len)
        key_l = (
            jax.random.fold_in(
                jax.random.fold_in(dropout_rng, n_layers - 1), tau
            )
            if dropout_rng is not None else None
        )
        out_l = _ln_drop(
            vl.reshape(batch, class_n * class_d), ln_params[-1][0],
            ln_params[-1][1], ln_eps, dropout_rate, key_l,
        ).reshape(batch, class_n, class_d)
        out_l = jnp.where(valid_l, out_l, 0.0)
        new_v_last = jnp.where(valid_l, vl, 0.0)

        # ---- push every producing layer's output into its ring slot
        push = jnp.concatenate([out0[None], out_m], axis=0)
        new_buf = jnp.concatenate([buf[:, 1:], push[:, None]], axis=1)
        return (new_buf, new_v_first, new_v_mid, new_v_last), out_l

    if remat:
        body = jax.checkpoint(body)
    _, ys = jax.lax.scan(
        body, (buf0, v0_first, v0_mid, v0_last), (xs_frames, xs_tau)
    )
    # last layer computes time t at step tau = t + (L-1)*delay
    out = ys[(n_layers - 1) * delay : (n_layers - 1) * delay + seq_len]
    return jnp.moveaxis(out, 0, 1).astype(u.dtype)


def route_layer(u, wgt, bias, num_iter, is_context, is_last_layer,
                time_chunk=None, impl="xla", remat=False, unroll=1,
                compute_dtype=None):
    """One capsule layer: prediction + routing (DR or SDR).

    ``impl``: "auto"/"xla_factored" (lax.scan whose body never
    materializes u_hat — see _sdr_step_factored; the measured default),
    "xla" (scan with the materialized-u_hat body — lowmemory plan),
    "xla_pre" (u_hat precomputed as one batched einsum — naive plan), or
    "pallas" (fused kernel, ops/routing_pallas.py) for the SDR path; DR is
    always plain XLA (fully parallel over time, nothing to fuse beyond
    what XLA already does).
    """
    if num_iter < 1:
        raise ValueError(
            "routing needs --model-caps-iter >= 1 (got %d): with 0 "
            "iterations DR has no output and SDR would silently emit the "
            "zero carry for every frame" % num_iter
        )
    if is_context:
        unsupported = (compute_dtype is not None
                       or (time_chunk is not None and time_chunk > 1))
        if impl == "pallas":
            if unsupported:
                raise ValueError(
                    "--tpu-routing-kernel=pallas does not support bf16 "
                    "routing or time chunking; use auto/xla/xla_pre"
                )
            from srf_tpu.ops.routing_pallas import sequential_routing_pallas

            return sequential_routing_pallas(
                u, wgt, bias, num_iter, is_last_layer
            )
        if impl == "xla_flat":
            if unsupported:
                raise ValueError(
                    "--tpu-routing-kernel=xla_flat does not support bf16 "
                    "routing or time chunking; use auto/xla/xla_pre"
                )
            return _sequential_routing_flat(
                u, wgt, bias, num_iter, mask_pad_capsule=is_last_layer,
                remat=remat, unroll=unroll,
            )
        return sequential_routing(
            u, wgt, bias, num_iter, mask_pad_capsule=is_last_layer,
            time_chunk=time_chunk, remat=remat, unroll=unroll,
            precompute=(impl == "xla_pre"), compute_dtype=compute_dtype,
            factored=(impl in ("auto", "xla_factored")),
        )
    u_hat = predict_capsules(u, wgt, bias)
    out = dynamic_routing(u_hat, num_iter, mask_pad_capsule=is_last_layer)
    return out.astype(u.dtype)
