"""Training / validation / decoding driver.

Epoch loop with the reference's observable behavior
(reference: tfsr/trainer_sr.py:250-299):

- per-epoch train + valid passes, ``STEP`` progress prints every 50 steps,
- early stopping: "better" means the valid loss did not worsen by more than
  1% of the previous loss; a tolerance counter of consecutive non-better
  epochs triggers the stop (reference: trainer_sr.py:269-279),
- per-epoch checkpoint save gated by ``--train-ckpt-saving-per``,
- decode mode (``--train-max-epoch=0``): batch-1 CTC beam search, emitting
  ``UTTID: ["<id>"]`` + a sparse-values line compatible with the reference's
  log2utt scrapers (reference: trainer_sr.py:96-117, log2utt.py:78-93).
"""

import time

import jax
import numpy as np

from srf_tpu.ops.ctc_decode import beam_search_batch

from srf_tpu.utils.metrics import MeanMetric, MetricsWriter, SumMetric

STEP_KEYS = ("feats", "labels", "inp_len", "tar_len")


def device_prefetch(iterator, sharding=None, depth=2):
    """Stage host batches ahead of consumption so the loader's host work
    (shard reads, padding, stacking) overlaps the previous step's compute.

    The worker thread only BUILDS host batches; the ``jax.device_put``
    happens on the consumer thread right before the batch is yielded.
    Device calls must stay on one thread here: a worker-side device_put
    concurrent with the main thread's compile/execute deadlocked the
    remote-TPU (axon) client intermittently (all threads futex-parked,
    one epoll on the tunnel — observed twice on the TIMIT dress corpus),
    and an idle link uploads a bucketed batch in single-digit ms anyway,
    so overlapping the upload buys nothing. The bounded queue keeps at
    most ``depth`` host batches staged."""
    import queue as _queue
    import threading

    q = _queue.Queue(maxsize=depth)
    end = object()
    stop = threading.Event()
    err = []
    timing = device_prefetch.timing  # SRF_LOOP_TIMING phase accumulators

    def put(batch):
        from srf_tpu.parallel.mesh import put_sharded

        return put_sharded({k: batch[k] for k in STEP_KEYS}, sharding)

    def worker():
        try:
            prev = time.perf_counter()
            for batch in iterator:
                if stop.is_set():
                    return
                if timing is not None:
                    now = time.perf_counter()
                    timing["load"] += now - prev
                q.put(batch)
                prev = time.perf_counter()
        except BaseException as exc:  # surfaced in the consumer
            err.append(exc)
        finally:
            q.put(end)

    thread = threading.Thread(
        target=worker, name="host-prefetch", daemon=True
    )
    thread.start()
    try:
        while True:
            if timing is None:
                item = q.get()
            else:
                t0 = time.perf_counter()
                item = q.get()
                timing["wait"] += time.perf_counter() - t0
            if item is end:
                break
            if timing is None:
                yield put(item)
            else:
                t0 = time.perf_counter()
                staged = put(item)
                timing["put"] += time.perf_counter() - t0
                yield staged
        if err:
            raise err[0]
    finally:
        # consumer abandoned the generator mid-epoch (preemption exit,
        # fault injection): drain the WHOLE queue so the worker can always
        # land its in-flight put AND its final end-sentinel put (at most
        # depth + 1 slots needed; one freed slot would deadlock its
        # sentinel on a full queue)
        stop.set()
        while True:
            try:
                q.get_nowait()
            except _queue.Empty:
                break


# SRF_LOOP_TIMING=1: run_training swaps in a dict accumulating host-loop
# phase seconds (load = loader batch build, put = H2D staging, wait =
# consumer starved on the queue) and logs it per epoch
device_prefetch.timing = None


def _drain(pending, train_loss, train_samples, num_feats):
    for fetched in jax.device_get(pending):
        train_loss.update(fetched["loss_sum"], fetched["samples"])
        train_samples.update(fetched["samples"])
        num_feats.update(fetched["frames"])
    return []


def run_training(config, logger, state, train_step, valid_step, train_loader,
                 valid_loader, ckpt_manager, epoch_offset, rng,
                 train_num, schedule_fn=None, metrics_path=None,
                 state_to_save=None, batch_sharding=None, state_from_tree=None):
    """Returns the final state.

    Preemption safety (``--tpu-ckpt-every-steps N``, no reference analog —
    the reference only checkpoints per epoch, trainer_sr.py:280-288): every
    N optimizer steps the full state plus the loop position (epoch, batch
    index within the epoch) and the metric/early-stop accumulators are
    saved under ``$path-ckpt/mid``. A restarted process resumes from the
    freshest of {last epoch checkpoint, last mid checkpoint}: the epoch's
    shuffle order is a pure function of (seed, epoch) via
    ``loader.set_epoch``, the per-step dropout rng is a pure function of
    the restored ``state.step``, and the already-consumed batches are
    skipped — so the resumed run replays the uninterrupted run bit-exactly
    (tests/test_preempt.py kills the process mid-epoch and proves it).
    """
    writer = MetricsWriter(metrics_path)
    train_loss = MeanMetric()
    valid_loss = MeanMetric()
    num_feats = MeanMetric()
    train_samples = SumMetric()

    profile_dir = getattr(config, "tpu_profile_dir", None)
    pre_loss = 1e9
    tolerance = 0

    # ---- mid-epoch (preemption-safe) checkpointing --------------------
    mid_every = int(getattr(config, "tpu_ckpt_every_steps", 0) or 0)
    fault_at = int(getattr(config, "tpu_fault_at_step", 0) or 0)
    mid_mgr = None
    resume_epoch, resume_index = -1, 0
    # batch-geometry signature: ``resume.batch_index`` counts BATCHES, so
    # it only names the same data position if the bucket batch sizes are
    # unchanged. An elastic restart on a different mesh can legally change
    # them (round_batch_sizes to the new replica count) — then the mid
    # checkpoint must be refused (epoch restart), not half-trusted.
    # process count folds in too: the lockstep schedule is stratified by
    # process, so the same LOCAL sizes under a different process count
    # still name different data positions per batch index
    import jax as _jax

    batch_sig = float(sum(
        (i + 1) * int(s) for i, s in enumerate(
            getattr(train_loader, "batch_sizes", None) or [])
    )) + 1e6 * (_jax.process_count() - 1)
    if mid_every > 0 and not (config.path_ckpt and state_to_save is not None):
        logger.warning(
            "--tpu-ckpt-every-steps=%d has nothing to save to (no "
            "--path-ckpt / state serializer); mid-epoch checkpointing "
            "is DISABLED for this run", mid_every,
        )
    if mid_every > 0 and config.path_ckpt and state_to_save is not None:
        import os as _os

        from srf_tpu.utils.checkpoint import CheckpointManager

        mid_mgr = CheckpointManager(
            _os.path.join(config.path_ckpt, "mid"), max_to_keep=2,
            use_async=getattr(config, "tpu_async_ckpt", False),
        )
        last_mid = mid_mgr.latest_step()
        if last_mid is not None:
            template = {
                "state": state_to_save(state),
                "resume": {
                    "epoch": 0, "batch_index": 0,
                    "train_loss_total": 0.0, "train_loss_count": 0.0,
                    "num_feats_total": 0.0, "num_feats_count": 0.0,
                    "train_samples": 0.0,
                    "pre_loss": 0.0, "tolerance": 0,
                    "batch_sig": 0.0,
                },
            }
            try:
                restored = mid_mgr.restore(last_mid, template)
            except Exception as exc:
                # e.g. a mid checkpoint from an older release whose resume
                # schema lacks batch_sig — refuse it rather than crash the
                # restart (the supervisor treats a traceback as fatal)
                logger.warning(
                    "Ignoring mid-epoch checkpoint %s/mid/%d (unreadable "
                    "with this release's resume schema: %s); deleting it",
                    config.path_ckpt, last_mid, exc,
                )
                mid_mgr.purge()
                restored = None
            meta = restored["resume"] if restored is not None else None
            if meta is None:
                pass
            elif float(meta["batch_sig"]) != batch_sig:
                logger.warning(
                    "Ignoring mid-epoch checkpoint %s/mid/%d: it was "
                    "written under a different batch geometry (signature "
                    "%.0f vs %.0f — elastic mesh change rounded the bucket "
                    "batch sizes?); its batch index does not name the same "
                    "data position, so resuming from the last epoch "
                    "checkpoint instead",
                    config.path_ckpt, last_mid,
                    float(meta["batch_sig"]), batch_sig,
                )
                # delete it: the restarted run's global step restarts
                # BELOW this step, and orbax silently drops saves at
                # steps <= the latest existing one — leaving it in place
                # would silently disable mid-epoch checkpointing
                mid_mgr.purge()
            elif int(meta["epoch"]) >= epoch_offset:
                if state_from_tree is None:
                    raise ValueError(
                        "mid-epoch checkpoint found but no state_from_tree "
                        "to rebuild the train state"
                    )
                state = state_from_tree(restored["state"])
                resume_epoch = int(meta["epoch"])
                resume_index = int(meta["batch_index"])
                epoch_offset = resume_epoch
                train_loss.total = float(meta["train_loss_total"])
                train_loss.count = float(meta["train_loss_count"])
                num_feats.total = float(meta["num_feats_total"])
                num_feats.count = float(meta["num_feats_count"])
                train_samples.total = float(meta["train_samples"])
                pre_loss = float(meta["pre_loss"])
                tolerance = int(meta["tolerance"])
                logger.info(
                    "Resuming mid-epoch from %s/mid/%d: epoch %d, batch %d",
                    config.path_ckpt, last_mid, resume_epoch, resume_index,
                )
            else:
                logger.info(
                    "Ignoring stale mid-epoch checkpoint (epoch %d < "
                    "resume offset %d); deleting it",
                    int(meta["epoch"]), epoch_offset,
                )
                mid_mgr.purge()

    def save_mid(epoch, next_index):
        to_save = {
            "state": state_to_save(state),
            "resume": {
                "epoch": epoch, "batch_index": next_index,
                "train_loss_total": train_loss.total,
                "train_loss_count": train_loss.count,
                "num_feats_total": num_feats.total,
                "num_feats_count": num_feats.count,
                "train_samples": train_samples.total,
                "pre_loss": pre_loss, "tolerance": tolerance,
                "batch_sig": batch_sig,
            },
        }
        mid_mgr.save(int(jax.device_get(state.step)), to_save)

    # ---- failure detection -------------------------------------------
    # SIGTERM = the cloud preemption notice: flag it, save a mid
    # checkpoint at the next step boundary, exit 143 (the supervisor
    # restarts and resumes exactly). Installed only when mid-epoch
    # checkpointing gives the handler somewhere to save.
    hang_at = int(getattr(config, "tpu_fault_hang_at_step", 0) or 0)
    sig_at = int(getattr(config, "tpu_fault_signal_at_step", 0) or 0)
    check_step = fault_at > 0 or hang_at > 0 or sig_at > 0
    sigterm_seen = {"flag": False}
    sig_installed = False
    if mid_mgr is not None:
        import signal as _signal

        def _on_sigterm(signum, frame):
            sigterm_seen["flag"] = True

        try:
            _prev_sigterm = _signal.signal(_signal.SIGTERM, _on_sigterm)
            sig_installed = True
        except ValueError:  # not the main thread
            pass

    n_proc = jax.process_count()

    def preemption_agreed():
        """Multi-process: allgather-OR of the per-process SIGTERM flags.

        The mid-checkpoint save is a COLLECTIVE (orbax multi-host), so a
        process that received the preemption notice must not save alone —
        it would deadlock the others. Called only at lockstep-aligned
        points (mid-save boundaries, end of validation, epoch save), so
        every process runs the same collective sequence and all act — or
        none do — together."""
        import numpy as _np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            _np.asarray([1 if sigterm_seen["flag"] else 0], _np.int32)
        )
        return bool(_np.asarray(flags).max())

    def handle_sigterm_if_seen(epoch, index, consensus=False):
        """Act on a pending preemption notice: save a mid checkpoint at
        the current loop position and exit 143. Single-process this runs
        at every progress point — train steps, validation batches, epoch
        boundary — so the grace window is never burned waiting for the
        next train step. Multi-process it acts only at consensus points
        (``consensus=True``): response latency is bounded by
        --tpu-ckpt-every-steps, and the collective save stays aligned."""
        if n_proc > 1:
            if not consensus or mid_mgr is None or not preemption_agreed():
                return
        elif not sigterm_seen["flag"]:
            return
        if mid_mgr is not None:
            save_mid(epoch, index)
            mid_mgr.wait()
            logger.warning(
                "SIGTERM: saved mid-epoch checkpoint at global step "
                "%d (epoch %d, batch %d); exiting 143 — restart "
                "resumes exactly",
                int(jax.device_get(state.step)), epoch, index,
            )
        else:  # pragma: no cover — handler only installed with mid_mgr
            logger.warning("SIGTERM: no mid-epoch checkpointing; "
                           "exiting 143")
        import os as _os

        _os._exit(143)

    # Watchdog (hang -> crash -> restart -> exact resume): armed lazily
    # after the FIRST optimizer step completes, so initial compilation
    # never trips it.
    watchdog_secs = float(getattr(config, "tpu_watchdog_secs", 0) or 0)
    watchdog = None

    def kick_watchdog():
        nonlocal watchdog
        if watchdog_secs <= 0:
            return
        if watchdog is None:
            from srf_tpu.utils.watchdog import Watchdog

            watchdog = Watchdog(watchdog_secs, logger=logger).start()
        watchdog.kick()

    def teardown():
        if watchdog is not None:
            watchdog.stop()
        if sig_installed:
            import signal as _signal

            _signal.signal(_signal.SIGTERM, _prev_sigterm)

    try:
        for epoch in range(epoch_offset, config.train_max_epoch):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            resuming = epoch == resume_epoch and resume_index > 0
            if not resuming:
                train_loss.reset()
                num_feats.reset()
                train_samples.reset()
            valid_loss.reset()

            prev = time.time()
            index = 0
            pending = []  # device metrics, fetched lazily so steps pipeline
            import os as _tos

            if _tos.environ.get("SRF_LOOP_TIMING"):
                device_prefetch.timing = {
                    "load": 0.0, "put": 0.0, "wait": 0.0, "dispatch": 0.0,
                }
            tracing = bool(profile_dir) and epoch == epoch_offset
            if tracing:
                # profile the first trained epoch (TensorBoard-loadable)
                from srf_tpu.utils.profiler import trace as profiler_trace

                trace_cm = profiler_trace(profile_dir)
                trace_cm.__enter__()
                logger.info("Profiler trace -> %s", profile_dir)
            batches = iter(train_loader)
            if resuming:
                import itertools

                batches = itertools.islice(batches, resume_index, None)
                index = resume_index
            for batch in device_prefetch(batches, batch_sharding):
                if device_prefetch.timing is None:
                    state, metrics = train_step(state, batch, rng)
                else:
                    t_disp = time.perf_counter()
                    state, metrics = train_step(state, batch, rng)
                    device_prefetch.timing["dispatch"] += (
                        time.perf_counter() - t_disp)
                pending.append(metrics)
                index += 1
                kick_watchdog()
                if mid_mgr is not None and index % mid_every == 0:
                    pending = _drain(pending, train_loss, train_samples, num_feats)
                    # multi-process consensus point: if ANY process holds
                    # a preemption notice, all save this mid and exit 143
                    handle_sigterm_if_seen(epoch, index, consensus=True)
                    save_mid(epoch, index)
                if check_step:
                    # exact-equality triggers: a supervised restart resumes
                    # PAST the fault step, so the injection fires once per
                    # job, not once per restart (tools/supervise.py e2e)
                    gstep = int(jax.device_get(state.step))
                    if fault_at > 0 and gstep == fault_at:
                        if mid_mgr is not None:
                            mid_mgr.wait()
                        logger.warning(
                            "FAULT INJECTION: hard-exit at global step %d "
                            "(--tpu-fault-at-step)", fault_at,
                        )
                        import os as _os

                        _os._exit(42)
                    if hang_at > 0 and gstep == hang_at:
                        logger.warning(
                            "FAULT INJECTION: hanging the host loop at global "
                            "step %d (--tpu-fault-hang-at-step)", hang_at,
                        )
                        while True:
                            time.sleep(60)
                    sig_proc = int(getattr(
                        config, "tpu_fault_signal_process", -1) or -1)
                    if (sig_at > 0 and gstep == sig_at
                            and sig_proc in (-1, jax.process_index())):
                        import os as _os
                        import signal as _signal

                        logger.warning(
                            "FAULT INJECTION: raising SIGTERM to self at "
                            "global step %d (--tpu-fault-signal-at-step)",
                            sig_at,
                        )
                        sig_at = 0  # once
                        _os.kill(_os.getpid(), _signal.SIGTERM)
                if sigterm_seen["flag"]:
                    pending = _drain(pending, train_loss, train_samples, num_feats)
                    handle_sigterm_if_seen(epoch, index)
                if (index - 1) % 50 == 0 and (index - 1) > 0:
                    pending = _drain(pending, train_loss, train_samples, num_feats)
                    step_i = int(jax.device_get(state.step))
                    lr = float(schedule_fn(step_i)) if schedule_fn else float(
                        config.train_lr_param_k or 0.0
                    )
                    print(
                        "STEP %d %.6f %.6f %.8f"
                        % (
                            step_i,
                            train_samples.result() / max(train_num, 1) * 100.0,
                            train_loss.result(),
                            lr,
                        ),
                        flush=True,
                    )
            _drain(pending, train_loss, train_samples, num_feats)
            if index == 0:
                # every bucket starved (corpus smaller than the bucket
                # batch sizes, or — multi-process — some process never
                # fills a bucket, which starves it globally): an epoch
                # that trains nothing must be loud, not a 0.0000-loss line
                logger.warning(
                    "Train epoch %03d yielded NO batches — corpus too "
                    "small for the bucket batch sizes (every global "
                    "bucket batch needs %s examples%s)?",
                    epoch + 1,
                    getattr(train_loader, "batch_sizes", "?"),
                    " per process" if jax.process_count() > 1 else "",
                )
            if tracing:
                trace_cm.__exit__(None, None, None)
            train_secs = time.time() - prev
            step_i = int(jax.device_get(state.step))
            logger.info(
                "Epoch %03d Train Loss %.4f, %.3f secs, %d feats/step, %d/%d steps",
                epoch + 1, train_loss.result(), train_secs,
                int(num_feats.result()), step_i, config.train_max_step,
            )
            writer.write(
                {"kind": "train_epoch", "epoch": epoch + 1,
                 "loss": train_loss.result(), "secs": train_secs, "step": step_i,
                 "samples": train_samples.result()}
            )
            if device_prefetch.timing is not None:
                tdict = device_prefetch.timing
                logger.info(
                    "Loop timing: load %.1fs  put %.1fs  wait %.1fs  "
                    "dispatch %.1fs  (of %.1fs epoch)",
                    tdict.get("load", 0.0), tdict.get("put", 0.0),
                    tdict.get("wait", 0.0), tdict.get("dispatch", 0.0),
                    train_secs,
                )

            prev = time.time()
            pending = []
            for batch in device_prefetch(iter(valid_loader), batch_sharding):
                pending.append(valid_step(state, batch))
                kick_watchdog()
                handle_sigterm_if_seen(epoch, index)
            # drain INCREMENTALLY: each fetch blocks only for one batch's
            # compute, so the watchdog sees progress per batch instead of
            # one device_get spanning the whole validation pass, and a
            # preemption notice is acted on between batches
            for p in pending:
                metrics = jax.device_get(p)
                valid_loss.update(metrics["loss_sum"], metrics["samples"])
                kick_watchdog()
                handle_sigterm_if_seen(epoch, index)
            # end-of-validation consensus point (multi-process)
            handle_sigterm_if_seen(epoch, index, consensus=True)
            valid_secs = time.time() - prev
            if valid_loss.count == 0:
                # every bucket's remainder was dropped (valid set smaller than
                # the smallest bucket batch — reference drop_remainder=True,
                # load_speech_data.py:174): a 0.0000 valid loss would silently
                # disable early stopping, so say it out loud
                logger.warning(
                    "Validation yielded NO batches (valid set smaller than the "
                    "bucket batch sizes?); early stopping is inert this epoch")
            better = valid_loss.result() - pre_loss <= (pre_loss * 0.01)
            tolerance = 0 if better else tolerance + 1
            logger.info(
                "Epoch %03d Valid Loss %.4f, %.3f secs%s",
                epoch + 1, valid_loss.result(), valid_secs,
                ", improved" if better else ", tolerance %d" % tolerance,
            )
            writer.write(
                {"kind": "valid_epoch", "epoch": epoch + 1,
                 "loss": valid_loss.result(), "secs": valid_secs,
                 "better": bool(better), "tolerance": tolerance}
            )
            pre_loss = valid_loss.result()

            # early stop BEFORE saving: the regressed final epoch gets no
            # checkpoint, so checkpoint averaging sees the same last-N set as
            # the reference (reference: tfsr/trainer_sr.py:277-288)
            if 0 < config.train_es_tolerance <= tolerance:
                logger.info("early stopped!")
                break
            if config.train_ckpt_saving_per > 0:
                to_save = state_to_save(state) if state_to_save else state
                path = ckpt_manager.save(epoch + 1, to_save)
                logger.info("Saving a ckpt for the last epoch at %s", path)
                kick_watchdog()
                # a notice during valid/save: the mid written here is
                # older than the epoch ckpt just saved, so the restart
                # ignores it (stale) and resumes at epoch+1 cleanly
                # (epoch-boundary consensus point in multi-process mode)
                handle_sigterm_if_seen(epoch, index, consensus=True)
            else:
                logger.warning(
                    "Not saved since train-ckpt-saving-per is %d, it needs to be "
                    "bigger than 0 if you want save checkpoints",
                    config.train_ckpt_saving_per,
                )

    finally:
        teardown()
    writer.close()
    if mid_mgr is not None:
        mid_mgr.wait()
        mid_mgr.close()
    if hasattr(ckpt_manager, "wait"):
        ckpt_manager.wait()  # async saves must be durable before decode/avg
    return state


def run_decoding(config, logger, state, logits_fn, test_loader, in_len_div,
                 beam_width=None, decode_impl=None):
    """Decode and print hypotheses in the reference's scrape-able format.

    ``decode_impl``: "device" (on-chip jittable beam scan — the default:
    ~2x the host beam's RTF since the sort-free rewrite, identical
    hypotheses), "host" (C++/python prefix beam), or "greedy".
    """
    beam_width = beam_width or config.decoding_beam_width or 100
    decode_impl = decode_impl or getattr(config, "tpu_decode_impl", "device")
    from srf_tpu.ops.ngram_lm import load_lm_from_config

    lm = load_lm_from_config(config, logger)
    if lm is not None and decode_impl == "greedy":
        logger.warning(
            "--tpu-lm-path is ignored by greedy decoding; use the device "
            "or host beam (--tpu-decode-impl)"
        )
    prev = time.time()
    for batch in test_loader:
        logits = np.asarray(
            logits_fn(
                state,
                {k: batch[k] for k in ("feats", "labels", "inp_len", "tar_len")},
            )
        )
        # reference uses floor division for decode lengths
        # (trainer_sr.py:110), unlike the ceil used in the loss
        dec_lens = np.asarray(batch["inp_len"]) // in_len_div
        dec_lens = np.minimum(np.maximum(dec_lens, 1), logits.shape[1])
        if decode_impl == "greedy":
            from srf_tpu.ops.ctc_decode import greedy_decode

            ids, lens = greedy_decode(logits, dec_lens)
            ids, lens = np.asarray(ids), np.asarray(lens)
            hyps = [list(ids[i, : lens[i]]) for i in range(ids.shape[0])]
        elif decode_impl == "device":
            from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_batch_jax

            hyps = [
                ids for ids, _ in ctc_beam_search_batch_jax(
                    logits, dec_lens, beam_width, lm=lm
                )
            ]
        else:
            hyps = beam_search_batch(logits, dec_lens, beam_width, lm=lm)
        for i, utt_id in enumerate(batch.get("utt_ids", [])):
            values = " ".join(str(int(x)) for x in hyps[i])
            n = len(hyps[i])
            print('UTTID: ["%s"]' % utt_id, flush=True)
            # two lines shaped like tf.print's SparseTensor dump; the line
            # containing "values" has exactly one '[' before the values list
            # so the reference scraper's line.split("[")[2] lands on it
            # (reference: log2utt.py:86-88)
            print("SparseTensor(indices=[[0 0]", flush=True)
            print(
                " [0 %d]], values=[%s], shape=[1 %d])" % (max(n - 1, 0), values, n),
                flush=True,
            )
    logger.info("%.3f secs elapsed", time.time() - prev)
