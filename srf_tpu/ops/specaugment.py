"""SpecAugment (Park et al., 2019): time/frequency masking, jittable.

Capability beyond parity — the reference has no augmentation. Applied to
the feature batch inside the jitted train step (training mode only, off by
default; ``--tpu-specaug``). Masks are sampled per utterance with static
mask counts so the whole augmentation traces once:

- each of ``freq_masks`` masks zeroes ``f ~ U[0, freq_width]`` consecutive
  feature dims starting at ``f0 ~ U[0, F - f]``;
- each of ``time_masks`` masks zeroes ``t ~ U[0, min(time_width,
  inp_len)]`` consecutive frames starting at ``t0 ~ U[0, inp_len - t]`` —
  masks never land in the padding region, so padded frames stay exactly
  zero and length semantics are untouched.

Time warping is deliberately omitted (the paper reports it contributes
least; it would also break the static-shape bucketing contract).
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=("time_masks", "time_width", "freq_masks", "freq_width"),
)
def spec_augment(feats, inp_len, rng, time_masks=2, time_width=40,
                 freq_masks=2, freq_width=15):
    """feats [B, T, F], inp_len [B] -> masked feats (zero fill)."""
    batch, seq_len, feat_dim = feats.shape
    lens = inp_len.astype(jnp.int32)
    keep = jnp.ones((batch, seq_len, 1), feats.dtype)
    t_idx = jnp.arange(seq_len)[None, :]
    f_idx = jnp.arange(feat_dim)[None, :]

    for m in range(time_masks):
        r = jax.random.fold_in(rng, 2 * m)
        # cap at min(T, p*len) with the paper's p=0.2 (Park et al. 2019
        # "time mask should not be wider than p times the utterance"):
        # without the relative bound, ~20% of utterances with
        # inp_len <= time_width had their ENTIRE valid region zeroed,
        # training CTC on silence against a non-empty transcript
        cap = jnp.minimum(time_width, (lens * 0.2).astype(jnp.int32))
        width = jax.random.randint(
            jax.random.fold_in(r, 0), (batch,), 0, 1_000_000
        ) % (cap + 1)
        start = jax.random.randint(
            jax.random.fold_in(r, 1), (batch,), 0, 1_000_000
        ) % jnp.maximum(lens - width + 1, 1)
        hit = (t_idx >= start[:, None]) & (t_idx < (start + width)[:, None])
        keep = keep * jnp.where(hit[..., None], 0.0, 1.0).astype(feats.dtype)

    fkeep = jnp.ones((batch, 1, feat_dim), feats.dtype)
    # never mask more than half the spectrum per mask: freq_width >=
    # feat_dim (e.g. the default 15 on 13-dim MFCCs) could zero EVERY
    # feature column of an utterance
    fcap = min(freq_width, max(feat_dim // 2, 1))
    for m in range(freq_masks):
        r = jax.random.fold_in(rng, 2 * m + 1)
        width = jax.random.randint(
            jax.random.fold_in(r, 0), (batch,), 0, fcap + 1
        )
        start = jax.random.randint(
            jax.random.fold_in(r, 1), (batch,), 0, 1_000_000
        ) % jnp.maximum(feat_dim - width + 1, 1)
        hit = (f_idx >= start[:, None]) & (f_idx < (start + width)[:, None])
        fkeep = fkeep * jnp.where(
            hit[:, None, :], 0.0, 1.0
        ).astype(feats.dtype)

    # only valid frames are augmented: padding passes through untouched
    # (it is zero in real batches, but the contract is exact preservation)
    valid = (t_idx < lens[:, None])[..., None]
    return jnp.where(valid, feats * keep * fkeep, feats)


def make_augment_fn(config):
    """Returns augment_fn(feats, inp_len, rng) or None (flag-driven)."""
    if not getattr(config, "tpu_specaug", False):
        return None
    tm = getattr(config, "tpu_specaug_time_masks", 2)
    tw = getattr(config, "tpu_specaug_time_width", 40)
    fm = getattr(config, "tpu_specaug_freq_masks", 2)
    fw = getattr(config, "tpu_specaug_freq_width", 15)

    def augment(feats, inp_len, rng):
        return spec_augment(
            feats, inp_len, rng, time_masks=tm, time_width=tw,
            freq_masks=fm, freq_width=fw,
        )

    return augment
