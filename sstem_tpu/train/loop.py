"""Shared training loop: logging, previews, periodic validation, checkpoints.

Reproduces the reference loop surface (main_ms.py:138-288): per-step loss
logging to console + ``loss.txt`` + tensorboard; PNG preview collages at
``display_freq``; validation at ``save_freq`` (scores to ``valid.txt`` and
tensorboard); ``model-%06d.ckpt`` saves. The hot path is a single compiled
train step; host work happens only at the periodic boundaries.
"""

import logging
import os
import time

import numpy as np


def to_uint8(img01):
    img = np.asarray(img01)
    img = np.clip(img, 0.0, 1.0)
    return (img * 255).astype(np.uint8)


def save_collage(path, rows):
    """rows: list of lists of 2-D uint8 arrays -> one PNG grid."""
    from PIL import Image

    grid = np.concatenate(
        [np.concatenate(r, axis=1) for r in rows], axis=0
    )
    Image.fromarray(grid).save(path)


def run_training(*, provider, train_step, state, total_iters,
                 cache_path, save_path, valid_path=None,
                 display_freq=100, valid_freq=100, save_freq=1000,
                 valid_fn=None, preview_fn=None, writer=None,
                 logger=None, start_iter=0, save_optimizer=False,
                 schedule=None, batch_stats_in_ckpt=True):
    """Run the training loop. Returns the final state.

    valid_fn(state, iters) -> (scalar, name) or None
    preview_fn(state, batch, iters) -> None (writes collages to cache_path)
    schedule: optional python fn step -> lr, logged only.
    """
    from sstem_tpu.train.checkpoint import save_checkpoint

    logger = logger or logging.getLogger("sstem_tpu")
    os.makedirs(cache_path, exist_ok=True)
    os.makedirs(save_path, exist_ok=True)
    if valid_path:
        os.makedirs(valid_path, exist_ok=True)
    f_loss = open(os.path.join(cache_path, "loss.txt"), "a")
    f_valid = open(os.path.join(cache_path, "valid.txt"), "a")

    iters = start_iter
    sum_loss = 0.0
    sum_time = 0.0
    # in-flight throttle: without it the host enqueues steps far faster
    # than the device retires them (the loop only syncs at display
    # boundaries) and the dispatch queue pins every pending batch — on the
    # tunneled runtime that grows host memory without bound (observed
    # OOM-kill after ~3k steps). Blocking on the step from 8 iterations
    # ago keeps the pipeline full at bounded memory.
    from collections import deque

    inflight = deque()
    while iters < total_iters:
        iters += 1
        t1 = time.time()
        batch = provider.next()
        state, metrics = train_step(state, batch)
        inflight.append(metrics["loss"])
        if len(inflight) > 8:
            inflight.popleft().block_until_ready()
        if iters % display_freq == 0 or iters == 1:
            loss = float(metrics["loss"])  # device sync at display boundary
            sum_loss += loss
            sum_time += time.time() - t1
            lr = float(schedule(iters)) if schedule else float("nan")
            denom = display_freq if iters > 1 else 1
            per_step = sum_time / max(denom, 1)
            line = (
                "step %d, loss = %.6f (lr: %.8f, et: %.2f sec, "
                "rd: %.2f min)" % (
                    iters, loss, lr, sum_time,
                    (total_iters - iters) * per_step / 60,
                )
            )
            logger.info(line)
            f_loss.write(line + "\n")
            f_loss.flush()
            if writer is not None:
                writer.add_scalar("loss", loss, iters)
            sum_loss = 0.0
            sum_time = 0.0
            if preview_fn is not None:
                preview_fn(state, batch, iters)

        if valid_fn is not None and (iters % save_freq == 0 or iters == 1):
            score, name = valid_fn(state, iters)
            line = "model-%d, valid-%s=%.6f" % (iters, name, score)
            logger.info(line)
            f_valid.write(line + "\n")
            f_valid.flush()
            if writer is not None:
                writer.add_scalar(name, score, iters)

        # always checkpoint the final iteration, even off the save_freq
        # grid (e.g. total 10000 with 4k-boundary saves; ADVICE r4)
        if iters % save_freq == 0 or iters == total_iters:
            save_checkpoint(
                save_path, iters, state.params,
                batch_stats=state.batch_stats if batch_stats_in_ckpt else None,
                opt_state=state.opt_state if save_optimizer else None,
            )
            logger.info("saved checkpoint at iters = %d", iters)

    f_loss.close()
    f_valid.close()
    return state
