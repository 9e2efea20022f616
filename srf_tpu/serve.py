"""Serving/inference API: load a checkpoint, transcribe features.

A thin production-facing layer over the same pieces the trainers use
(no reference analog — the reference's only inference path is the decode
mode of its trainers):

- pads inputs to a small set of static shape buckets (one compile each,
  cached by the persistent compilation cache),
- greedy or beam decoding (host C++ / on-device),
- returns token ids and mapped text (TIMIT 61->39 or characters).

CLI:
    python -m srf_tpu.serve --config=... --path-base=... --path-ckpt=.../avg \
        --feats utt1.npy [utt2.npy ...] [--corpus timit|wsj]
    # raw audio in one step (fbank-123 + utterance CMVN front-end):
    python -m srf_tpu.serve ... --wav utt1.wav [--wav utt2.wav ...]
    # long-form: stream + auto-segment at silence, timestamped segments:
    python -m srf_tpu.serve ... --feats recording.npy --long
"""

import sys
import threading

import jax
import jax.numpy as jnp
import numpy as np

from srf_tpu.config import Logger, ParseOption
from srf_tpu.models.registry import build_model
import functools

from srf_tpu.ops.ctc_decode import greedy_decode_frames_jit


@functools.lru_cache(maxsize=1)
def _quantize_fn():
    """One jitted quantize_tree for the process (a fresh jax.jit wrapper
    per call would re-trace on every hot reload)."""
    from srf_tpu.ops.quant import quantize_tree

    return jax.jit(quantize_tree)


@functools.lru_cache(maxsize=1)
def _dequantize_fn():
    from srf_tpu.ops.quant import dequantize_tree

    return jax.jit(dequantize_tree)


@jax.jit
def _frame_max_logp(logits):
    """Per-frame best log-posterior [B, T'] — the greedy (Viterbi) score
    reduces over this. Computed on device so serving never fetches the
    full [B, T', V] posterior tensor to host (at serving batch that fetch
    is tens of MB per dispatch and dominated the product-path overhead;
    see BENCH_NOTES "serving product path")."""
    return jnp.max(
        jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), axis=-1
    )


@jax.jit
def _token_logp_gather(logits, frame_idx, sym_idx):
    """Gather log-posteriors at (emission frame, symbol) per decoded token
    slot: [B, T', V] x [B, L] x [B, L] -> [B, L], on device. Backs the
    per-token confidences with an L-sized fetch instead of the full
    posterior tensor. Padded slots (frame 0, sym 0) are gathered too and
    simply ignored by the caller."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    batch_idx = jnp.arange(logits.shape[0], dtype=jnp.int32)[:, None]
    return logp[batch_idx, frame_idx, sym_idx]
from srf_tpu.train.state import TrainState
from srf_tpu.utils.log2utt import ids_to_utt
from srf_tpu.utils.vocab import get_file_path, load_vocab


class Recognizer:
    def __init__(self, config, logger=None):
        from srf_tpu.utils.compilation_cache import enable_compilation_cache

        enable_compilation_cache()
        logger = logger or Logger(name="srf_serve", level=Logger.INFO).logger
        self.config = config
        self.vocab, _, dec_in_dim, _ = load_vocab(
            get_file_path(config.path_base, config.path_vocab), logger
        )
        dec_out_dim = dec_in_dim + 1
        self.blank_id = dec_in_dim
        self.model, self.in_len_div = build_model(config, dec_out_dim, logger)

        rng = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, 20, config.feat_dim), jnp.float32)
        variables = jax.jit(
            lambda r, f, l: self.model.init(r, f, l, False)
        )({"params": rng, "dropout": rng}, dummy, jnp.full((1,), 20, jnp.int32))
        # inference needs params (+ BN stats) only: partial restore skips
        # the optimizer state, so serving never has to reproduce the
        # training-time optimizer flags
        self._template = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        self._use_ema = getattr(config, "tpu_decode_ema", False)
        if self._use_ema:
            # serve the EMA weights (--tpu-ema-decay training); the
            # validated partial restore fails loudly if the checkpoint
            # holds no EMA subtree
            self._template["ema_params"] = variables["params"]
        self.quantized = (
            getattr(config, "tpu_serve_quant", "none") == "int8"
        )
        # --tpu-lm-path: shallow-fusion n-gram LM, applied on every beam
        # decode path (batched, streaming, daemon)
        from srf_tpu.ops.ngram_lm import load_lm_from_config

        self.lm = load_lm_from_config(config, logger)
        self._logger = logger
        self._reload_lock = threading.Lock()
        epoch_flag = getattr(config, "path_ckpt_epoch", None)
        # same guard as utils/checkpoint.load_checkpoint: non-positive
        # values fall back to the latest step
        step = epoch_flag if epoch_flag and epoch_flag > 0 else None
        self.state = self._load_state(step, required=True)
        # params/batch_stats are ARGUMENTS of the jitted forward, not
        # closure captures: jit bakes captured arrays into the compiled
        # program as constants, which would silently pin the weights of
        # the FIRST trace across hot reloads
        self._forward = jax.jit(self._apply)

    def _load_state(self, step, required=False):
        """Restore (params [+EMA selection, +quantization], batch_stats)
        at ``step`` (None = latest) into a serving TrainState."""
        from srf_tpu.utils.checkpoint import CheckpointManager

        manager = CheckpointManager(
            self.config.path_ckpt,
            max_to_keep=self.config.model_ckpt_max_to_keep,
        )
        step = step if step is not None else manager.latest_step()
        if step is None:
            manager.close()
            if required:
                raise FileNotFoundError(
                    "no checkpoint under %s" % self.config.path_ckpt)
            return None
        restored = manager.restore_partial(step, self._template)
        manager.close()
        params = restored["ema_params"] if self._use_ema else restored["params"]
        if self._use_ema:
            self._logger.info("Serving with EMA params (--tpu-decode-ema)")
        # --tpu-serve-quant=int8: drop the f32 weights for an int8 +
        # per-channel-scale copy (4x less HBM traffic per forward —
        # small-batch serving is bandwidth-bound); dequantize happens
        # inside the jitted forward (ops/quant.py)
        if self.quantized:
            from srf_tpu.ops.quant import quantized_bytes

            params = _quantize_fn()(params)
            q_b, f_b = quantized_bytes(jax.device_get(params))
            self._logger.info(
                "int8 weight quantization: %.1f MB -> %.1f MB resident",
                f_b / 1e6, q_b / 1e6)
        return TrainState(
            step=jnp.asarray(step, jnp.int32),
            params=params,
            opt_state=None,
            batch_stats=restored.get("batch_stats", {}),
        )

    def reload(self, step=None):
        """Hot-swap to a newer checkpoint without restarting the server.

        ``step=None`` polls the checkpoint directory's latest step and
        swaps only if it is newer than the one being served; an explicit
        ``step`` always swaps. The swap is a single attribute assignment
        (in-flight requests finish on the old weights; the next batch
        uses the new ones) and never recompiles — the jitted forward
        takes the params as arguments. Streaming sessions hold their own
        variable copies: a reload affects NEW sessions only. Returns the
        new step, or None if nothing changed. No reference analog (the
        reference has no serving runtime at all)."""
        with self._reload_lock:
            current = int(jax.device_get(self.state.step))
            if step is None:
                from srf_tpu.utils.checkpoint import CheckpointManager

                manager = CheckpointManager(self.config.path_ckpt)
                latest = manager.latest_step()
                manager.close()
                if latest is None or latest <= current:
                    return None
                step = latest
            new_state = self._load_state(step, required=True)
            self.state = new_state
            self._logger.info(
                "Hot-reloaded checkpoint: step %d -> %d", current, step)
            return step

    def _f32_variables(self):
        """Dequantized (or pass-through) {'params', 'batch_stats'} for
        non-jitted consumers (streaming constructors hold their own
        variable copies). Snapshots ``self.state`` ONCE so a concurrent
        hot reload cannot mix checkpoints."""
        state = self.state
        params = (_dequantize_fn()(state.params) if self.quantized
                  else state.params)
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return variables

    def _apply(self, params, batch_stats, feats, lengths):
        if self.quantized:
            from srf_tpu.ops.quant import dequantize_tree

            params = dequantize_tree(params)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return self.model.apply(variables, feats, lengths, False)

    def streaming_session(self, chunk=8, beam_width=None):
        """Chunked low-latency inference (SRF models).

        Returns a srf_tpu.streaming.StreamingTranscriber bound to the
        loaded checkpoint: feed features with push(), finish with flush().
        ``beam_width`` turns on the streamed beam (with the configured
        shallow-fusion LM, if any).
        """
        from srf_tpu.streaming import StreamingTranscriber

        # lm rides unconditionally: the streamed beam fuses it when
        # beam_width is set, and flush(beam_width=N) offline rescores
        # fuse it even from a greedy-streaming session
        return StreamingTranscriber(
            self.model, self._f32_variables(), self.blank_id, chunk=chunk,
            beam_width=beam_width, lm=self.lm,
        )

    def streaming_pool(self, slots, chunk=8, beam_width=None):
        """N concurrent streaming sessions, one fused dispatch per tick.

        Returns a srf_tpu.streaming.StreamingPool bound to the loaded
        checkpoint: buffer per-stream features with push(slot, frames),
        advance all live streams with step(), finish a stream with
        flush(slot) (the slot is then reusable).
        """
        from srf_tpu.streaming import StreamingPool

        return StreamingPool(
            self.model, self._f32_variables(), self.blank_id, slots=slots,
            chunk=chunk, beam_width=beam_width, lm=self.lm,
        )

    def transcribe_long(self, feats, chunk=8, beam_width=None,
                        endpoint_blanks=25, corpus="timit",
                        push_frames=None, max_segment_s=30.0):
        """Long-form transcription: stream ``feats`` [T, feat_dim] through
        a session, auto-segmenting at silence (endpointing: a run of
        ``endpoint_blanks`` consecutive blank logit-frames closes the open
        segment). Decode memory stays bounded per segment, so hour-scale
        audio transcribes where the offline path would build one giant
        lattice (and the reference's pipeline caps utterances at its
        bucket budget, reference: tfsr/helper/data_helper.py:77-80).

        ``max_segment_s`` force-closes a segment that never hits silence
        (continuous speech), so decode state — the beam's backpointer
        tape in particular — stays bounded no matter the audio.

        Returns a list of segment dicts {ids, text, frames, times,
        start_s, end_s} (+``score`` with a beam), in stream order.
        """
        feats = np.asarray(feats, np.float32)
        session = self.streaming_session(chunk=chunk, beam_width=beam_width)
        push = push_frames or (chunk * session.div * 4)
        segments = []

        def _close():
            seg = session.finalize_segment()
            if seg["ids"]:
                segments.append(seg)

        shift0 = 0.01 * self.in_len_div
        max_frames = max(int(max_segment_s / shift0), 1)
        for lo in range(0, feats.shape[0], push):
            session.push(feats[lo: lo + push])
            open_frames = (
                session._decoded_frames - session._segment_start_frame
            )
            if session.endpoint_detected(endpoint_blanks) or (
                open_frames >= max_frames
                and len(session._tokens) > session._segment_token_start
            ):
                _close()
        session.flush()
        _close()
        raw_vocab = [t if t != " " else "<SPACE>" for t in self.vocab]
        shift = 0.01 * self.in_len_div
        return [
            {
                "ids": seg["ids"],
                "text": ids_to_utt(seg["ids"], raw_vocab, corpus),
                "frames": seg["frames"],
                "times": [round(f * shift, 4) for f in seg["frames"]],
                "start_s": round(seg["start_frame"] * shift, 4),
                "end_s": round(seg["end_frame"] * shift, 4),
                **({"score": seg["score"]} if "score" in seg else {}),
            }
            for seg in segments
        ]

    def transcribe(self, feats, beam_width=None, pad_multiple=128,
                   corpus="timit"):
        """feats: [T, feat_dim] numpy -> (ids, text)."""
        return self.transcribe_batch(
            [feats], beam_width=beam_width, pad_multiple=pad_multiple,
            corpus=corpus,
        )[0]

    def transcribe_batch(self, feats_list, beam_width=None, pad_multiple=128,
                         corpus="timit"):
        """Batch serving: list of [T_i, feat_dim] -> list of (ids, text).

        One forward + one batched decode dispatch for the whole list
        (BENCH_NOTES: 469x realtime at batch 16 with beam 100 on v5e).
        """
        return [
            (d["ids"], d["text"]) for d in self.transcribe_batch_detailed(
                feats_list, beam_width=beam_width,
                pad_multiple=pad_multiple, corpus=corpus,
            )
        ]

    def transcribe_batch_detailed(self, feats_list, beam_width=None,
                                  pad_multiple=128, corpus="timit",
                                  n_best=1):
        """Like transcribe_batch, with per-utterance scoring detail.

        Returns dicts {ids, text, score, avg_logp, confidence, frames,
        times}: ``score`` is the hypothesis log-score — for beam decodes
        the merged-prefix CTC mass of the best beam (plus the weighted LM
        when fusing), for greedy the best-path (Viterbi) log-prob of the
        emitted alignment; ``avg_logp`` normalizes by decoded frames and
        ``confidence`` is its exp, a length-independent (0, 1] signal for
        rejection/thresholding in serving pipelines. ``frames`` holds each
        symbol's emission logit-frame index (first frame of its run /
        frame it entered the beam prefix) and ``times`` the corresponding
        start time in seconds (10 ms input frames x the model's
        subsampling; reference front-end: egs/script/fbank123.sh).
        ``n_best`` > 1 (beam decodes only; greedy has no alternatives)
        adds that many ranked hypotheses under "nbest" from the same
        single beam scan.
        """
        if not feats_list:
            return []
        feats_list = [np.asarray(f, np.float32) for f in feats_list]
        feat_dim = self.config.feat_dim
        for i, f in enumerate(feats_list):
            if f.ndim != 2 or f.shape[1] != feat_dim:
                # reject precisely (a daemon batch fails EVERY co-batched
                # request on an exception — name the offender)
                raise ValueError(
                    "request %d: expected [T, %d] features, got %s"
                    % (i, feat_dim, f.shape)
                )
        lengths = np.array([f.shape[0] for f in feats_list], np.int32)
        width = -(-int(lengths.max()) // pad_multiple) * pad_multiple
        padded = np.zeros((len(feats_list), width, feat_dim), np.float32)
        for i, f in enumerate(feats_list):
            padded[i, : f.shape[0]] = f
        # snapshot ONCE: a concurrent hot reload() swaps self.state between
        # attribute reads otherwise — mixed-checkpoint params/batch_stats
        state = self.state
        logits = self._forward(
            state.params, state.batch_stats,
            jnp.asarray(padded), jnp.asarray(lengths),
        )
        dec_lens = np.maximum(lengths // self.in_len_div, 1)
        nbest_lists = None
        if beam_width and beam_width > 1:
            if n_best and n_best > 1:
                # one scan serves both the top path and the n-best list
                from srf_tpu.ops.ctc_beam_jax import (
                    ctc_beam_search_nbest_jax,
                )

                nbest_lists = ctc_beam_search_nbest_jax(
                    logits, dec_lens, beam_width, self.blank_id,
                    lm=self.lm, top_paths=n_best,
                )
                results = [hyps[0] for hyps in nbest_lists]
            else:
                from srf_tpu.ops.ctc_beam_jax import (
                    ctc_beam_search_batch_jax,
                )

                results = ctc_beam_search_batch_jax(
                    logits, dec_lens, beam_width, self.blank_id,
                    lm=self.lm, with_frames=True,
                )
            decoded = [ids for ids, _, _ in results]
            scores = [score for _, score, _ in results]
            frames = [fr for _, _, fr in results]
        else:
            out, lens, emit = greedy_decode_frames_jit(
                logits, jnp.asarray(dec_lens), blank_id=self.blank_id
            )
            out, lens = np.asarray(out), np.asarray(lens)
            emit = np.asarray(emit)
            decoded = [
                [int(x) for x in out[i, : int(lens[i])]]
                for i in range(len(feats_list))
            ]
            frames = [
                [int(x) for x in emit[i, : int(lens[i])]]
                for i in range(len(feats_list))
            ]
            # best-path (Viterbi) log-prob over the valid frames; the
            # per-frame max reduces [B, T', V] -> [B, T'] on device
            frame_max = np.asarray(_frame_max_logp(logits))
            pos = np.arange(frame_max.shape[1])[None, :]
            scores = (frame_max * (pos < dec_lens[:, None])).sum(axis=-1)
        raw_vocab = [t if t != " " else "<SPACE>" for t in self.vocab]
        frame_shift_s = 0.01 * self.in_len_div  # 10 ms frames x subsample
        # per-token confidence lookup: gather logp at each decoded token's
        # (emission frame, symbol) on device — an [B, L] fetch, not the
        # full [B, T', V] posterior tensor. L is padded to a bucket so a
        # handful of compiled gather shapes cover all batches.
        max_tok = max((len(ids) for ids in decoded), default=0)
        if max_tok:
            bucket = -(-max_tok // 32) * 32
            frame_idx = np.zeros((len(decoded), bucket), np.int32)
            sym_idx = np.zeros((len(decoded), bucket), np.int32)
            for i, ids in enumerate(decoded):
                frame_idx[i, : len(ids)] = frames[i]
                sym_idx[i, : len(ids)] = ids
            tok_logp = np.asarray(_token_logp_gather(
                logits, jnp.asarray(frame_idx), jnp.asarray(sym_idx)))
        out = []
        for i, ids in enumerate(decoded):
            avg = float(scores[i]) / max(int(dec_lens[i]), 1)
            out.append({
                "ids": ids,
                "text": ids_to_utt(ids, raw_vocab, corpus),
                "score": float(scores[i]),
                "avg_logp": avg,
                "confidence": float(np.exp(min(avg, 0.0))),
                "frames": list(frames[i]),
                "times": [round(f * frame_shift_s, 4) for f in frames[i]],
                # per-token confidence: the posterior of each symbol at
                # its emission frame — the standard word-level rejection
                # signal (the utterance-level ``confidence`` above is too
                # coarse to localize an error)
                "token_confidences": [
                    round(float(np.exp(tok_logp[i, j])), 4)
                    for j in range(len(ids))
                ],
            })
            if nbest_lists is not None:
                out[-1]["nbest"] = [
                    {
                        "ids": h_ids,
                        "text": ids_to_utt(h_ids, raw_vocab, corpus),
                        "score": float(h_score),
                    }
                    for h_ids, h_score, _ in nbest_lists[i]
                ]
        return out


def main(argv=None):
    logger = Logger(name="srf_serve", level=Logger.INFO).logger
    argv = list(argv or sys.argv)
    feats_paths = []
    wav_paths = []
    corpus = "timit"
    stream = False
    long_form = False
    filtered = []
    it = iter(argv)
    for arg in it:
        if arg == "--feats":
            path = next(it, None)
            if path is None:
                raise SystemExit("--feats requires a value")
            feats_paths.append(path)
        elif arg.startswith("--feats="):
            feats_paths.append(arg.split("=", 1)[1])
        elif arg == "--wav":
            path = next(it, None)
            if path is None:
                raise SystemExit("--wav requires a value")
            wav_paths.append(path)
        elif arg.startswith("--wav="):
            wav_paths.append(arg.split("=", 1)[1])
        elif arg.startswith("--corpus="):
            corpus = arg.split("=", 1)[1]
        elif arg == "--stream":
            stream = True
        elif arg == "--long":
            long_form = True
        else:
            filtered.append(arg)
    config = ParseOption(filtered, logger, is_print_opts=False).args
    recognizer = Recognizer(config, logger)

    def load_input(path, is_wav):
        if not is_wav:
            return np.load(path)
        # raw audio -> the training front-end: fbank-123 + utterance-level
        # CMVN (the offline pipeline normalizes per speaker with the same
        # formula; one utterance is its own best stats at serving time)
        if recognizer.config.feat_dim != 123:
            raise SystemExit(
                "--wav needs a 123-dim fbank model (feat_dim is %d)"
                % recognizer.config.feat_dim)
        from srf_tpu.data.features import (
            apply_cmvn, cmvn_stats, extract_fbank123,
        )
        from srf_tpu.tools.extract_features import read_wav

        signal, rate = read_wav(path)
        feats = extract_fbank123(signal, rate)
        return apply_cmvn(feats, *cmvn_stats([feats])).astype(np.float32)

    batch_paths = []
    for path, is_wav in ([(p, False) for p in feats_paths]
                         + [(p, True) for p in wav_paths]):
        feats = load_input(path, is_wav)
        if long_form:
            beam = config.decoding_beam_width
            segments = recognizer.transcribe_long(
                feats, corpus=corpus,
                beam_width=(beam if beam and beam > 1 else None),
            )
            for seg in segments:
                print("[%8.2fs - %8.2fs] %s (%s)"
                      % (seg["start_s"], seg["end_s"], seg["text"], path))
        elif stream:
            session = recognizer.streaming_session()
            raw_vocab = [
                t if t != " " else "<SPACE>" for t in recognizer.vocab
            ]
            ids = []
            for start in range(0, feats.shape[0], 50):  # 0.5 s at a time
                new = session.push(feats[start : start + 50])
                if new:
                    print("partial: %s" % ids_to_utt(new, raw_vocab, corpus))
                ids += new
            beam = config.decoding_beam_width
            if beam and beam > 1:
                # greedy partials stream; the flush rescores the whole
                # utterance with the beam decoder
                ids = list(session.flush(beam_width=beam))
            else:
                ids += session.flush()
            print("%s (%s)" % (ids_to_utt(ids, raw_vocab, corpus), path))
        else:
            batch_paths.append((path, feats))
    if batch_paths:
        # whole request list in one forward + one decode dispatch
        results = recognizer.transcribe_batch(
            [f for _, f in batch_paths],
            beam_width=config.decoding_beam_width, corpus=corpus,
        )
        for (path, _), (_, text) in zip(batch_paths, results):
            print("%s (%s)" % (text, path))


if __name__ == "__main__":
    main()
