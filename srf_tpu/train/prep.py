"""Batch preparation helpers for attention-style models.

Port of ``prep_process`` (reference: tfsr/helper/train_helper.py:382-401):
builds the encoder padding bias and, for labeled batches, the shifted
decoder inputs/targets (``@ a b c`` / ``a b c $``) plus the combined
look-ahead+padding mask. Unlike the reference, inputs keep their static
bucket shape (no crop-to-max; masks carry the lengths).
"""

from srf_tpu.ops.masking import create_combined_mask, get_padding_bias


def prep_process(labels, feat_len, tar_len, feats, in_len_div):
    # tar_len is accepted for reference signature parity but unused: the
    # reference cropped labels to the batch-max target length; this
    # static-shape port keeps the bucket shape and derives the combined
    # mask purely from token==0 padding
    del tar_len
    enc_pad_mask = get_padding_bias(
        feat_len, -(-feats.shape[1] // in_len_div), in_len_div
    )
    if labels is None:
        return feats, enc_pad_mask
    tar_inp = labels[:, :-1]
    tar_real = labels[:, 1:]
    comb_mask = create_combined_mask(tar_inp)
    return feats, tar_inp, tar_real, enc_pad_mask, comb_mask
