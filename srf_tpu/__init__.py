"""srf_tpu: a TPU-native (JAX/XLA/Pallas) Sequential Routing Framework.

A ground-up rebuild of the capabilities of the reference "tfsr" toolkit
(sephiroce/srf): CTC acoustic-model training and decoding for capsule-network
SRF, Speech-Transformer, (B)LSTM, and deep maxout CNN encoders on TIMIT/WSJ,
designed TPU-first:

- models are pure-functional flax modules compiled by XLA,
- batches are length-bucketed to *static* shapes (one compilation per bucket),
- data parallelism is a `jax.sharding.Mesh` + NamedSharding (psum over ICI),
- the sequential SDR routing recurrence is a `lax.scan` with an optional
  fused Pallas TPU kernel,
- CTC loss/decode use blank-last semantics matching `tf.nn.ctc_loss`
  (reference: tfsr/trainer_sr.py:64-66,133-134),
- serving: `srf_tpu.serve.Recognizer` (bucketed batch inference) and
  `srf_tpu.streaming.StreamingTranscriber` (chunked low-latency inference
  with carried SDR state; exact batch parity),
- parallelism: data-parallel by default, `--tpu-fsdp` for ZeRO-style
  param/optimizer sharding; a `model` mesh axis for wider layouts.
"""

__version__ = "0.1.0"
