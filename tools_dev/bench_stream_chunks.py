"""Dev bench: streaming chunk-size trade-off on the real chip.

For chunk sizes (post frames), measures max per-push latency and overall
RTF on an 8 s utterance with the canonical SRF-TIMIT model.
Run: python tools_dev/bench_stream_chunks.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.streaming import StreamingTranscriber

    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=7, caps_primary_num=60,
        caps_primary_dim=8, caps_conv_num=30, caps_conv_dim=8,
        caps_class_dim=8, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=64, caps_type="naive",
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    frames = 800
    raw = host.randn(frames, 123).astype(np.float32)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.asarray(raw[None, :64]), jnp.asarray([64]), False,
    )

    lm = None
    if "--lm" in sys.argv:
        # fused streaming cost probe: random 3-gram over the 62 tokens
        from srf_tpu.ops.ngram_lm import train_ngram

        texts = [host.randint(0, 62, size=40).tolist() for _ in range(50)]
        lm = (train_ngram(texts, 62, 3), 0.5, 0.5)

    for beam in (None, 100):
        for chunk in (4, 8, 16, 32):
            session = StreamingTranscriber(model, variables, blank_id=62,
                                           chunk=chunk, beam_width=beam,
                                           lm=lm if beam else None)
            chunk_raw = chunk * 4
            session.push(raw[:chunk_raw]); session.flush()  # warm compile
            session.reset()
            lat = []
            start = time.perf_counter()
            for lo in range(0, frames, chunk_raw):
                t0 = time.perf_counter()
                session.push(raw[lo : lo + chunk_raw])
                lat.append(time.perf_counter() - t0)
            session.flush()
            total = time.perf_counter() - start
            print(
                "%s chunk %2d (%3d ms audio): max push %6.1f ms, "
                "mean %6.1f ms, RTF %5.2fx" % (
                    "greedy  " if beam is None
                    else ("beam-100+lm" if lm else "beam-100"),
                    chunk, chunk_raw * 10, max(lat) * 1e3,
                    float(np.mean(lat)) * 1e3, frames * 0.01 / total,
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
