"""Streaming SRF inference: chunked forward with carried recurrence state.

The paper's headline property — SDR needs ONE routing iteration per
timestep, so inference is "non-iterative" (reference: README.md:8-9) — makes
the SRF model naturally streamable: the only unbounded state is each capsule
layer's previous output capsules ``v_prev`` (the SDR carry) plus bounded
window context. The reference has no streaming path (its decode mode is
whole-utterance, tfsr/trainer_sr.py:96-117); this module is a TPU-native
extension built on the same trained parameters.

Exactness contract: for a full utterance fed through ``push``/``flush``,
the emitted logits equal the batch model's logits on every valid frame
(tests/test_streaming.py), because each stage only ever reads:

- the conv front-end: a raw-frame window with enough margin to cover its
  receptive field (overlap-and-discard; stride alignment keeps the SAME-
  padding conv grids of window and full utterance identical),
- each capsule layer: its previous layer's outputs in [t-lpad, t+rpad]
  (carried ring context) and its own ``v_prev`` (carried),
- warm-up frames (t < 0) are zeroed via ``step_valid``, reproducing the
  batch implementation's window zero padding; the utterance tail
  reproduces the batch model's masked-front-end frames by processing
  zero-padded raw frames with the true length's ceil masks at flush.

Algorithmic latency: ``(2*div + L*rpad*div)`` raw frames — the front-end
lookahead plus ``rpad`` post-frames per capsule layer (e.g. canonical
SRF-TIMIT: 8 + 7*1*4 = 36 frames = 360 ms).

Both decoders stream. Greedy partials are emitted token-by-token from
``push``. Beam search streams too (``beam_width=N`` at construction): the
device beam (ops/ctc_beam_jax.py) is a frame-synchronous prefix search
expressed as a ``lax.scan``, so its state (prefix hashes, blank/non-blank
masses, backpointer tape) is carried across pushed chunks; ``flush``
backtraces the accumulated tape. Streamed beam == offline beam on the full
utterance by construction (same scan, chunked), tested across chunk sizes.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from srf_tpu.models.srf import SequenceRouter
from srf_tpu.ops.pos_enc import get_pos_enc


@functools.lru_cache(maxsize=8)
def _stream_step_fn(model):
    """ONE compiled stream_step per model, shared by every session.

    A per-session ``jax.jit`` wrapper would re-trace (and cold-cache
    re-compile) on each new session — a per-utterance latency spike in
    serving, where a session is constructed per request. flax modules are
    frozen dataclasses, so the model itself is the cache key."""

    def step(v, win, length, lpost, bufs, vprevs, offs, pos):
        return model.apply(
            v, win, length, lpost, bufs, vprevs, offs,
            pos_enc_override=pos, method="stream_step",
        )

    return jax.jit(step)


def _batched_stream_step(model, variables, win, length, lpost, offs,
                         bufs_list, vpr_list, pos):
    """Traced body shared by the pool's greedy and fused jits: stack the
    per-session carries, vmap ``stream_step`` over the rows (the einsum
    flavor's per-session positional-encoding slice rides as one more
    vmapped operand — its shape is fixed by the window geometry, only its
    content varies with the session's absolute position), and split the
    new carries back into per-session rows."""
    enc_num = model.enc_num
    bufs = [
        jnp.stack([b[l] for b in bufs_list]) for l in range(enc_num)
    ]
    vpr = [
        jnp.stack([v[l] for v in vpr_list]) for l in range(enc_num)
    ]
    if pos is not None:
        logits, nb, nv = jax.vmap(
            lambda w, l, lp, b, v, o, p: model.apply(
                variables, w, l, lp, b, v, o, pos_enc_override=p,
                method="stream_step"
            )
        )(win, length, lpost, bufs, vpr, offs, pos)
    else:
        logits, nb, nv = jax.vmap(
            lambda w, l, lp, b, v, o: model.apply(
                variables, w, l, lp, b, v, o, method="stream_step"
            )
        )(win, length, lpost, bufs, vpr, offs)
    n = win.shape[0]
    new_bufs = [[nb[l][i] for l in range(enc_num)] for i in range(n)]
    new_vpr = [[nv[l][i] for l in range(enc_num)] for i in range(n)]
    return logits, new_bufs, new_vpr


@functools.lru_cache(maxsize=8)
def _pool_step_fn(model):
    """One compiled batched (vmapped) stream_step per model for
    StreamingPool ticks; variables are an argument so pools share it."""

    @jax.jit
    def _pstep(variables, win, length, lpost, offs, bufs_list, vpr_list,
               pos=None):
        return _batched_stream_step(
            model, variables, win, length, lpost, offs, bufs_list,
            vpr_list, pos,
        )

    return _pstep


@functools.lru_cache(maxsize=8)
def _fused_stream_beam_fn(model):
    """Model block + beam chunk + greedy argmax in ONE jitted dispatch.

    The split push path (stream_step dispatch -> blocking [K, C] logits
    fetch -> host re-block -> beam dispatch) costs two serial device round
    trips plus a logits download per push; over a remote-TPU link that was
    the entire streamed-beam latency (r4: mean push 77.5 ms at RTF 3.82).
    Fused, the logits never leave the device: the beam consumes the block
    in the same program and only the [K] argmax ids are fetched for greedy
    partials/endpointing. Leading warm-up rows (global frame < 0) ride
    through the beam frozen (ops/ctc_beam_jax._beam_chunk ``active``)."""
    from srf_tpu.ops.ctc_beam_jax import _beam_chunk, _pack_lm, beam_scores

    @functools.partial(
        jax.jit, static_argnames=("blank", "lm_order", "topk_approx")
    )
    def fused(variables, win, length, lpost, bufs, vprevs, offs, pos,
              bstate, t0, bound, blank, lm_table=None, lm_order=0,
              lm_weight=0.0, lm_bonus=0.0, topk_approx=False):
        logits, nb, nv = model.apply(
            variables, win, length, lpost, bufs, vprevs, offs,
            pos_enc_override=pos, method="stream_step",
        )
        blk = logits[0]
        ids = jnp.argmax(blk, axis=-1).astype(jnp.int32)
        logp = jax.nn.log_softmax(blk.astype(jnp.float32), axis=-1)
        ts = t0 + jnp.arange(blk.shape[0])
        bstate, (parents, syms) = _beam_chunk(
            bstate, logp, ts, bound, blank,
            _pack_lm(lm_table, lm_order, lm_weight, lm_bonus),
            topk_approx=topk_approx,
        )
        return logits, ids, nb, nv, bstate, parents, syms, beam_scores(bstate)

    return fused


@functools.lru_cache(maxsize=8)
def _pool_fused_fn(model):
    """Batched fused tick: vmapped stream_step + vmapped beam chunk +
    argmax in one dispatch (the pool analog of _fused_stream_beam_fn);
    the tick's single host sync shrinks from the [n, K, C] logits to the
    [n, K] greedy ids."""
    from srf_tpu.ops.ctc_beam_jax import _beam_chunk, _pack_lm, beam_scores

    @functools.partial(
        jax.jit, static_argnames=("blank", "lm_order", "topk_approx")
    )
    def _pfused(variables, win, length, lpost, offs, bufs_list, vpr_list,
                pos, bstates_list, t0s, bounds, blank, lm_table=None,
                lm_order=0, lm_weight=0.0, lm_bonus=0.0, topk_approx=False):
        logits, new_bufs, new_vpr = _batched_stream_step(
            model, variables, win, length, lpost, offs, bufs_list,
            vpr_list, pos,
        )
        blk = logits[:, 0]  # [n, K, C]
        ids = jnp.argmax(blk, axis=-1).astype(jnp.int32)
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *bstates_list)
        lm = _pack_lm(lm_table, lm_order, lm_weight, lm_bonus)

        def one(st, b, t0, bound):
            logp = jax.nn.log_softmax(b.astype(jnp.float32), axis=-1)
            ts = t0 + jnp.arange(b.shape[0])
            st, (parents, syms) = _beam_chunk(
                st, logp, ts, bound, blank, lm, topk_approx=topk_approx,
            )
            return st, parents, syms

        nstate, parents, syms = jax.vmap(one)(states, blk, t0s, bounds)
        scores = beam_scores(nstate)
        out_states = [
            jax.tree.map(lambda x: x[i], nstate)
            for i in range(win.shape[0])
        ]
        return logits, ids, new_bufs, new_vpr, out_states, parents, syms, \
            scores

    return _pfused


class StreamingTranscriber:
    """Chunked inference session over a trained SequenceRouter.

    Args:
        model: the SequenceRouter (eval hyper-parameters; SDR or DR).
        variables: trained {'params': ..., 'batch_stats': ...}.
        blank_id: CTC blank (= vocab size; blank-last).
        chunk: emission granularity in post-subsample frames (chunk*div raw
            frames arrive per compute step; one compile per layer).
        beam_width: if set, additionally run frame-synchronous beam search
            over the emitted logits as they stream (carried scan state, one
            device dispatch per chunk); ``hypothesis()`` returns the current
            best beam and ``flush()`` returns the final one.
        lm: optional (ngram_lm.NGramLM, weight, bonus) — shallow fusion on
            the streamed beam (the per-beam LM context rides the carried
            scan state, so streamed == offline fused decode).
    """

    def __init__(self, model, variables, blank_id, chunk=8, beam_width=None,
                 lm=None):
        if not isinstance(model, SequenceRouter):
            raise TypeError("streaming supports the SRF SequenceRouter")
        self.model = model
        self.variables = variables
        self.blank_id = blank_id
        self.beam_width = beam_width
        self.lm = lm
        from srf_tpu.ops.ctc_beam_jax import lm_fusion_args

        self._lm_kwargs = lm_fusion_args(lm, model.class_n)
        self._lm_ctx0 = self._lm_kwargs.pop("lm_ctx0", 0)
        self.div = model.stride**model.conv_layer_num
        self.K = chunk
        # raw window for post-frames [t0, t0+K): [div*t0 - lmargin,
        # div*(t0+K) + rmargin); the margins cover the conv+encaps
        # receptive field for ANY front-end geometry — the post-frame
        # counts come from the model (single source of truth with
        # stream_step), window starts stay div-aligned so the SAME-padding
        # conv grids match the whole-utterance forward exactly
        if chunk < 3:
            raise ValueError("chunk must be >= 3 post frames")
        lm_posts, rm_posts = model.stream_margin_posts()
        self.lmargin = lm_posts * self.div
        self.rmargin = rm_posts * self.div
        self.win = self.div * self.K + self.lmargin + self.rmargin

        # the whole per-chunk cascade is ONE jitted dispatch (front-end +
        # every capsule layer + output head): per-layer dispatch latency
        # dominates otherwise (measured 152 -> ~30 ms/chunk on v5e).
        # Shared per model across sessions (no per-session re-trace).
        self._step = _stream_step_fn(model)
        # with the streamed beam on, the beam chunk and the greedy argmax
        # fuse INTO that dispatch and the logits never leave the device —
        # the split path's blocking logits fetch + second beam dispatch
        # per push were the whole streamed-beam latency (VERDICT r4 #4)
        self._fused = bool(beam_width)
        if self._fused:
            self._fstep = _fused_stream_beam_fn(model)
        self.reset()

    def reset(self):
        self._raw = np.zeros((0, self.model.feat_dim), np.float32)
        self._raw_base = 0  # absolute index of self._raw[0]
        self._pushed = 0
        self._fe_blocks = 0  # next front-end block index
        shapes = self.model.layer_shapes()
        window_ctx = self.model.lpad + self.model.rpad
        self._bufs, self._vprev = [], []
        prev_n, prev_d = self.model.caps_primary_num, self.model.caps_primary_dim
        for _, out_n, out_d, _ in shapes:
            self._bufs.append(
                jnp.zeros((1, window_ctx, prev_n, prev_d), jnp.float32)
            )
            self._vprev.append(jnp.zeros((1, out_n, out_d), jnp.float32))
            prev_n, prev_d = out_n, out_d
        self._logit_frames = 0  # emitted final-layer frames (valid, >= 0)
        self._logits = []
        self._argmax = []  # fused mode: per-block greedy ids (lazy-fetched)
        self._logit_ends = []  # cumulative block end offsets (bisect)
        self._prev_id = self.blank_id
        self._decoded_frames = 0
        self._tokens = []
        self._token_frames = []  # emission frame per greedy token
        self._trailing_blanks = 0  # consecutive argmax-blank frames at tail
        self._segment_start_frame = 0  # first logit frame of open segment
        self._segment_token_start = 0  # index into _tokens for the segment
        if self.beam_width:
            from srf_tpu.ops.ctc_beam_jax import beam_init

            self._beam_state = beam_init(
                self.beam_width, self._lm_ctx0,
                with_lm=self.lm is not None,
            )
            self._beam_frames = 0  # frames the beam scan has consumed
            self._beam_tape = []  # (parents, syms) np blocks, frame-aligned
            self._beam_tape_base = 0  # global frame of tape index 0
            self._beam_scores = None

    # ------------------------------------------------------------------ io

    def _append_raw(self, frames):
        """Validate + buffer raw frames, dropping rows no future window
        can read (before the next block's window start) so session memory
        and per-push copying stay BOUNDED for arbitrarily long streams
        (retained = unprocessed backlog + receptive-field margin)."""
        frames = np.asarray(frames, np.float32)
        if frames.ndim != 2 or frames.shape[1] != self.model.feat_dim:
            raise ValueError("expected [n, %d] features" % self.model.feat_dim)
        keep_from = self._win_start(self._fe_blocks * self.K)
        drop = keep_from - self._raw_base
        if drop > 0:
            self._raw = self._raw[drop:]
            self._raw_base = keep_from
        self._raw = np.concatenate([self._raw, frames], axis=0)
        self._pushed += frames.shape[0]

    def push(self, frames):
        """Feed raw feature frames [n, feat_dim]; returns newly decoded ids."""
        self._append_raw(frames)
        start = len(self._tokens)
        while self._fe_ready():
            self._advance(true_len=None)
        self._decode_available(limit=None)
        if self.beam_width:
            self._beam_advance(limit=None)
        return self._tokens[start:]

    def flush(self, beam_width=None):
        """End of utterance: drain the cascade, return the remaining ids.

        With streamed beam on (``beam_width`` at construction) returns the
        final ``(ids, score)`` hypothesis from the carried beam state —
        identical to the offline device beam on the full utterance.

        ``beam_width`` > 1 as an argument: rescore the WHOLE utterance
        offline over the accumulated logits instead (the pre-streaming
        protocol; streamed partials stay greedy).
        """
        start = len(self._tokens)
        t_true = self._pushed
        t_ceil = -(-t_true // self.div)
        # the last layer needs front-end frames up to t_ceil-1 + L*rpad
        need_fe = t_ceil + self.model.enc_num * self.model.rpad
        while self._fe_blocks * self.K < need_fe:
            self._advance(true_len=t_true)
        t_dec = t_true // self.div
        if beam_width and beam_width > 1:
            from srf_tpu.ops.ctc_decode import beam_search_batch

            self._decode_available(limit=t_dec)  # keep greedy state coherent
            return beam_search_batch(
                self.logits[None], [t_dec], beam_width, self.blank_id,
                lm=self.lm,
            )[0]
        self._decode_available(limit=t_dec)
        if self.beam_width:
            self._beam_advance(limit=t_dec)
            return self.hypothesis()
        return self._tokens[start:]

    def hypothesis(self, with_frames=False):
        """Current best streamed-beam hypothesis ``(ids, score)`` — or
        ``(ids, score, frames)`` with ``with_frames`` (per-symbol emission
        logit-frame indices; multiply by ``div`` x 10 ms for times).

        Backtraces the accumulated backpointer tape; the best path may
        revise earlier output (beam search is not prefix-monotone), which
        is why ``push`` keeps emitting greedy partials."""
        from srf_tpu.ops.ctc_beam_jax import _backtrace

        if not self._beam_tape:
            return ([], 0.0, []) if with_frames else ([], 0.0)
        # the tape blocks live on device until here (push never blocks on
        # them); this is the single host sync of the streamed beam
        parents = np.concatenate(
            [np.asarray(p) for p, _ in self._beam_tape], axis=0
        )
        syms = np.concatenate(
            [np.asarray(s) for _, s in self._beam_tape], axis=0
        )
        out = _backtrace(parents, syms, np.asarray(self._beam_scores),
                         with_frames=with_frames)
        if with_frames:
            ids, score, frames = out
            return ids, score, [f + self._beam_tape_base for f in frames]
        return out

    @property
    def token_frames(self):
        """Emission logit-frame index of every greedy token emitted so far
        (parallel to the accumulated ``push`` outputs)."""
        return list(self._token_frames)

    # ------------------------------------------------------- endpointing

    @property
    def trailing_blank_frames(self):
        """Consecutive decoded frames at the stream tail whose argmax is
        blank — the endpoint (end-of-speech) signal: CTC models emit blank
        through silence, so a long enough trailing blank run marks a
        segment boundary. Maintained by the greedy decode state, which
        runs in every session (also with the streamed beam on)."""
        return self._trailing_blanks

    def endpoint_detected(self, min_blank_frames):
        """True when the open segment has emitted at least one token and
        the tail shows ``min_blank_frames`` consecutive blank frames."""
        return (
            len(self._tokens) > self._segment_token_start
            and self._trailing_blanks >= int(min_blank_frames)
        )

    def finalize_segment(self):
        """Close the open segment and reset the decoder for the next one.

        Returns {ids, frames, start_frame, end_frame} — with the streamed
        beam on, the segment's beam hypothesis (+``score``); greedy tokens
        otherwise. The ACOUSTIC stream state (front-end buffers, SDR
        carries) is untouched: the model keeps streaming continuously and
        only the decode state (beam masses/tape, greedy collapse) restarts,
        so arbitrarily long audio decodes in bounded memory — segment
        boundaries land in silence, where restarting the CTC prefix search
        is exact. The reference has no streaming at all (its decode is
        whole-utterance, tfsr/trainer_sr.py:96-117) and its input pipeline
        caps utterances at the bucket budget."""
        end = self._decoded_frames
        seg = {"start_frame": self._segment_start_frame, "end_frame": end}
        if self.beam_width:
            # catch the beam up to the greedy decode position (NOT to
            # _logit_frames: after flush the logit tail past the true
            # length is invalid and must never enter the beam)
            self._beam_advance(limit=end)
            ids, score, frames = self.hypothesis(with_frames=True)
            seg.update(ids=ids, frames=frames, score=score)
            from srf_tpu.ops.ctc_beam_jax import beam_init

            self._beam_state = beam_init(
                self.beam_width, self._lm_ctx0,
                with_lm=self.lm is not None,
            )
            self._beam_tape = []
            self._beam_tape_base = self._beam_frames
            self._beam_scores = None
        else:
            start = self._segment_token_start
            seg.update(
                ids=list(self._tokens[start:]),
                frames=list(self._token_frames[start:]),
            )
        self._segment_token_start = len(self._tokens)
        self._segment_start_frame = end
        self._trailing_blanks = 0
        self._prev_id = self.blank_id  # no collapse across the boundary
        return seg

    def _beam_advance(self, limit):
        """Advance the carried beam scan over newly available logit frames
        in fixed-size (K-frame, zero-padded) blocks — one compiled shape.

        In fused mode the beam advances inside each fused ``_advance``
        block, so this is naturally caught up (``_beam_frames ==
        _logit_frames`` at every push; at flush the ``limit`` equals the
        bound the fused blocks already applied) — it only does work when
        logits are fed in from outside the model path (tests inject
        blocks directly)."""
        from srf_tpu.ops.ctc_beam_jax import (
            _topk_approx_default, beam_chunk_step,
        )

        total = self._logit_frames if limit is None else min(
            self._logit_frames, limit
        )
        while self._beam_frames < total:
            lo = self._beam_frames
            hi = min(lo + self.K, total)
            block = np.zeros((self.K, self.model.class_n), np.float32)
            block[: hi - lo] = self.logits_slice(lo, hi)
            self._beam_state, parents, syms, scores = beam_chunk_step(
                self._beam_state, jnp.asarray(block), jnp.int32(lo),
                jnp.int32(hi), self.beam_width, self.blank_id,
                topk_approx=_topk_approx_default(None),
                **self._lm_kwargs,
            )
            # keep the tape on device — fetching it per push would cost a
            # blocking round trip each; hypothesis()/flush sync once
            self._beam_tape.append(
                (parents[: hi - lo], syms[: hi - lo])
            )
            self._beam_scores = scores
            self._beam_frames = hi

    @property
    def logits(self):
        """Accumulated final logits [frames, class_n] (valid frames only).

        Full concatenation — whole-utterance consumers only (offline
        rescore at flush, tests). Incremental consumers use
        ``logits_slice`` so per-tick host cost stays O(slice), not O(T)."""
        if not self._logits:
            return np.zeros((0, self.model.class_n), np.float32)
        return np.concatenate(self._logits, axis=0)

    def _block_slice(self, blocks, lo, hi, out, cache_back=False):
        """Copy rows [lo, hi) of the concatenation of ``blocks`` into
        ``out`` using the ``_logit_ends`` cumulative offsets (shared by
        logits and argmax-id blocks — they are appended in lockstep). The
        start block comes from a bisect over cumulative block ends, so
        per-call cost is O(log blocks + slice), flat for arbitrarily long
        streams. ``cache_back``: device blocks convert to host arrays on
        first touch and the host copy replaces them, so each block is
        fetched at most once."""
        import bisect

        start = bisect.bisect_right(self._logit_ends, lo)
        offset = self._logit_ends[start - 1] if start else 0
        for k in range(start, len(blocks)):
            block = blocks[k]
            if cache_back and not isinstance(block, np.ndarray):
                block = np.asarray(block)
                blocks[k] = block
            n = block.shape[0]
            b_lo, b_hi = max(lo - offset, 0), min(hi - offset, n)
            if b_lo < b_hi:
                out[offset + b_lo - lo : offset + b_hi - lo] = (
                    block[b_lo:b_hi]
                )
            offset += n
            if offset >= hi:
                break
        return out

    def logits_slice(self, lo, hi):
        """Rows [lo, hi) of the accumulated logits without concatenating
        the whole history (a per-tick O(T) rebuild would make long-lived
        streams quadratic on the host)."""
        return self._block_slice(
            self._logits, lo, hi,
            np.zeros((hi - lo, self.model.class_n), np.float32),
        )

    # ------------------------------------------------------------- internal

    def _win_start(self, t0):
        # early blocks pin the window to raw 0 so the conv SAME zero
        # padding at the true utterance start is reproduced exactly
        return max(0, self.div * t0 - self.lmargin)

    def _fe_ready(self):
        return self._pushed >= self._win_start(self._fe_blocks * self.K) + self.win

    def _raw_window(self, t0):
        s = self._win_start(t0)
        out = np.zeros((self.win, self.model.feat_dim), np.float32)
        rel_s = s - self._raw_base
        hi = min(rel_s + self.win, self._raw.shape[0])
        if hi > rel_s:
            out[: hi - rel_s] = self._raw[rel_s:hi]
        return out[None], s

    def _advance_inputs(self, true_len):
        """Host-side prep for the next block: (window, length, lpost,
        offsets, pos) — split from the device step so StreamingPool can
        batch many sessions' steps into one dispatch."""
        t0 = self._fe_blocks * self.K
        window, s = self._raw_window(t0)
        if true_len is None:
            length = np.int32(self.win)
        else:
            length = np.int32(min(max(true_len - s, 0), self.win))
        pos = None
        if self.model.caps_type == "einsum":
            post0 = s // self.div
            full = get_pos_enc(
                post0 + self.win // self.div, self.model.caps_primary_num
            )
            pos = full[post0:]
        lpost = np.int32(t0 - s // self.div)
        offsets = np.asarray(
            [t0 - (i + 1) * self.model.rpad
             for i in range(self.model.enc_num)], np.int32
        )
        return window, length, lpost, offsets, pos

    def _advance_commit(self, logits_np):
        """Host-side post-processing of one block's logits [K, class_n]."""
        t0 = self._fe_blocks * self.K
        self._fe_blocks += 1
        # final-layer block covers global frames [offset, offset+K)
        offset = t0 - self.model.enc_num * self.model.rpad
        lo = max(0, -offset)  # skip warm-up frames
        if lo < self.K:
            self._logits.append(logits_np[lo:])
            self._logit_ends.append(self._logit_frames + self.K - lo)
            self._logit_frames += self.K - lo

    def _advance(self, true_len):
        """Compute one front-end block and cascade it through the layers.

        Fused mode (streamed beam on): the beam chunk and the greedy
        argmax run inside the SAME dispatch; logits/tape stay on device
        and nothing blocks here — the only per-push host syncs are the
        lazy [K] argmax-id fetches in ``_decode_available``."""
        window, length, lpost, offsets, pos = self._advance_inputs(true_len)
        if self._fused:
            from srf_tpu.ops.ctc_beam_jax import _topk_approx_default

            t0 = self._fe_blocks * self.K
            offset = t0 - self.model.enc_num * self.model.rpad
            bound = 2**30 if true_len is None else true_len // self.div
            (logits, ids, self._bufs, self._vprev, self._beam_state,
             parents, syms, scores) = self._fstep(
                self.variables, jnp.asarray(window), jnp.asarray(length),
                jnp.asarray(lpost), self._bufs, self._vprev,
                jnp.asarray(offsets), pos, self._beam_state,
                jnp.int32(offset), jnp.int32(bound),
                blank=self.blank_id,
                topk_approx=_topk_approx_default(None),
                **self._lm_kwargs,
            )
            self._commit_fused(
                logits[0], ids, parents, syms, scores, offset, bound
            )
        else:
            logits, self._bufs, self._vprev = self._step(
                self.variables, jnp.asarray(window), jnp.asarray(length),
                jnp.asarray(lpost), self._bufs, self._vprev,
                jnp.asarray(offsets), pos,
            )
            self._advance_commit(np.asarray(logits)[0])

    def _commit_fused(self, blk, ids, parents, syms, scores, offset, bound):
        """Book-keep one fused block. Everything appended here is a device
        array (lazy slices): logits for the offline-rescore/compat reads,
        argmax ids for greedy partials (fetched in ``_ids_slice`` on first
        use), tape rows for the device-resident beam backtrace."""
        self._fe_blocks += 1
        lo = max(0, -offset)  # warm-up rows never emitted (same as commit)
        if lo < self.K:
            self._logits.append(blk[lo:])
            self._argmax.append(ids[lo:])
            self._logit_ends.append(self._logit_frames + self.K - lo)
            self._logit_frames += self.K - lo
            self._beam_tape.append((parents[lo:], syms[lo:]))
            self._beam_scores = scores
            self._beam_frames = min(max(0, offset + self.K), bound)

    def _ids_slice(self, lo, hi):
        """Rows [lo, hi) of the accumulated greedy argmax ids (fused
        mode); lazily fetched and cached per block."""
        return self._block_slice(
            self._argmax, lo, hi, np.zeros((hi - lo,), np.int64),
            cache_back=True,
        )

    def _decode_available(self, limit):
        total = self._logit_frames if limit is None else min(
            self._logit_frames, limit
        )
        if total <= self._decoded_frames:
            return
        if self._fused and self._logit_ends and len(self._argmax) == len(
                self._logits):
            ids = self._ids_slice(self._decoded_frames, total)
        else:
            # non-fused — or logits injected from outside the model path
            # (tests append to _logits directly), where no fused argmax
            # block exists: derive ids from the logits
            logits = self.logits_slice(self._decoded_frames, total)
            ids = np.argmax(logits, axis=-1)
        for k, frame_id in enumerate(ids):
            frame_id = int(frame_id)
            if frame_id != self.blank_id and frame_id != self._prev_id:
                self._tokens.append(frame_id)
                self._token_frames.append(self._decoded_frames + k)
            if frame_id == self.blank_id:
                self._trailing_blanks += 1
            else:
                self._trailing_blanks = 0
            self._prev_id = frame_id
        self._decoded_frames = total


class StreamingPool:
    """N concurrent streaming sessions, ONE fused device dispatch per tick.

    Production serving: many live audio streams share one chip. ``push``
    only buffers on the host; ``step`` advances EVERY session with a ready
    block through a single batched (vmapped) ``stream_step`` — and, with
    ``beam_width`` set, one batched beam advance — instead of one dispatch
    per stream. Per-session results are bit-identical to a standalone
    ``StreamingTranscriber`` (vmap of the same function; tested), and
    ``flush(slot)`` drains that session's tail through its own
    single-session path, so end-of-utterance handling is shared code.

    Sessions stay authoritative: the pool stacks their carry state per
    tick and splits the results back, so slots can be flushed/reset
    independently while others keep streaming. Ticks whose ready-set is
    smaller than ``slots`` are padded (rows discarded), keeping ONE
    compiled shape. All three reference caps_type flavors stream: the
    einsum flavor's per-session positional-encoding slice (a fixed-shape
    array whose content tracks the session's absolute stream position,
    reference: tfsr/model/sequence_router_einsum.py:130-131) rides as one
    more vmapped operand.
    """

    def __init__(self, model, variables, blank_id, slots, chunk=8,
                 beam_width=None, lm=None):
        if slots < 1:
            raise ValueError("slots must be >= 1")
        self.sessions = [
            StreamingTranscriber(model, variables, blank_id, chunk=chunk,
                                 beam_width=beam_width, lm=lm)
            for _ in range(slots)
        ]
        self.slots = slots
        self.beam_width = beam_width
        # ONE dispatch per tick: the stack of every session's state, the
        # vmapped step, and the split back into per-session rows all fuse
        # into a single jitted call — host-side jnp.stack/slicing would
        # cost an eager dispatch (a tunnel round trip) each (measured:
        # ~900 ms/tick host-composed vs one fused call). Shared per model
        # across pools; variables ride as an argument.
        self.variables = variables
        self._pstep = _pool_step_fn(model)
        if beam_width:
            self._pfused = _pool_fused_fn(model)

    def push(self, slot, frames):
        """Buffer raw feature frames [n, feat_dim] for ``slot`` (host only;
        device work happens in ``step``)."""
        self.sessions[slot]._append_raw(frames)

    def step(self):
        """One tick: advance every session with a ready block in one
        dispatch. Returns {slot: newly decoded greedy ids}."""
        ready = [
            i for i, s in enumerate(self.sessions) if s._fe_ready()
        ]
        if not ready:
            return {}
        idx = ready + [ready[0]] * (self.slots - len(ready))
        preps = [self.sessions[i]._advance_inputs(None) for i in idx]
        win = np.stack([p[0] for p in preps])
        length = np.asarray([p[1] for p in preps], np.int32)
        lpost = np.asarray([p[2] for p in preps], np.int32)
        offs = np.stack([p[3] for p in preps])
        pos = None
        if self.sessions[0].model.caps_type == "einsum":
            pos = np.stack([np.asarray(p[4]) for p in preps])
        if self.beam_width:
            # fused tick: model block + beam chunk + argmax in ONE
            # dispatch; the tick's host sync is the [n, K] ids fetch
            # (the logits/tape stay on device, as in the single-session
            # fused path — results are bit-identical by vmap)
            from srf_tpu.ops.ctc_beam_jax import _topk_approx_default

            enc = self.sessions[0].model.enc_num
            rpad = self.sessions[0].model.rpad
            K = self.sessions[0].K
            t0s = np.asarray(
                [self.sessions[i]._fe_blocks * K - enc * rpad for i in idx],
                np.int32,
            )
            bounds = np.full((self.slots,), 2**30, np.int32)
            (logits, ids, nb, nv, nstates, parents, syms,
             scores) = self._pfused(
                self.variables, win, length, lpost, offs,
                [self.sessions[i]._bufs for i in idx],
                [self.sessions[i]._vprev for i in idx],
                pos, [self.sessions[i]._beam_state for i in idx],
                t0s, bounds, blank=self.sessions[0].blank_id,
                topk_approx=_topk_approx_default(None),
                **self.sessions[0]._lm_kwargs,
            )
            ids_np = np.asarray(ids)  # the tick's single host sync (tiny)
            out = {}
            for row, i in enumerate(ready):
                s = self.sessions[i]
                s._bufs = nb[row]
                s._vprev = nv[row]
                s._beam_state = nstates[row]
                start = len(s._tokens)
                s._commit_fused(
                    logits[row, 0], ids_np[row], parents[row], syms[row],
                    scores[row], int(t0s[row]), 2**30,
                )
                s._decode_available(limit=None)
                out[i] = s._tokens[start:]
            return out
        logits, nb, nv = self._pstep(
            self.variables, win, length, lpost, offs,
            [self.sessions[i]._bufs for i in idx],
            [self.sessions[i]._vprev for i in idx],
            pos,
        )
        logits_np = np.asarray(logits)  # the tick's single host sync
        out = {}
        for row, i in enumerate(ready):
            s = self.sessions[i]
            s._bufs = nb[row]
            s._vprev = nv[row]
            start = len(s._tokens)
            s._advance_commit(logits_np[row, 0])
            s._decode_available(limit=None)
            out[i] = s._tokens[start:]
        return out

    def drain(self):
        """Tick until no session has a ready block."""
        while self.step():
            pass

    def hypothesis(self, slot, with_frames=False):
        """Current best streamed-beam hypothesis for ``slot``."""
        return self.sessions[slot].hypothesis(with_frames=with_frames)

    def flush(self, slot):
        """End of utterance for ``slot``: drain its tail via the session's
        own single-session path; other slots are untouched. Returns the
        final hypothesis ((ids, score) with beam, ids otherwise) and
        resets the slot for reuse. (No pool-wide drain here: the session's
        own flush advances its remaining front-end blocks AND catches its
        beam up over every unconsumed frame — other slots are untouched and
        none of their pending tokens are silently consumed.)"""
        session = self.sessions[slot]
        result = session.flush()
        session.reset()
        return result
