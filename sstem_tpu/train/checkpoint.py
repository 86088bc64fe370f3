"""Checkpointing — orbax-backed, reference-shaped payloads.

Payload keys match the reference torch.save dicts
({'current_iter', 'valid_result', 'model_weights'[, 'optimizer_weights']},
SURVEY §2.8) so tooling that reasons about checkpoints carries over.
Directory naming keeps the ``model-%06d.ckpt`` pattern; ``latest_step``
re-creates the SP trainers' regex-max auto-resume
(sp_scripts_train/main_correction.py:62-76). Orbax checkpoints are
sharding-agnostic, which subsumes the reference's DataParallel-prefix
munging (SURVEY §2.7 P2).
"""

import os
import re

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(save_path, step):
    return os.path.join(os.path.abspath(save_path), "model-%06d.ckpt" % step)


def save_checkpoint(save_path, step, params, batch_stats=None,
                    opt_state=None, valid_result=None):
    payload = {
        "current_iter": step,
        "model_weights": {"params": params},
    }
    if batch_stats is not None:
        payload["model_weights"]["batch_stats"] = batch_stats
    if opt_state is not None:
        payload["optimizer_weights"] = opt_state
    if valid_result is not None:
        payload["valid_result"] = valid_result
    path = _ckpt_dir(save_path, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(save_path, step=None, template=None):
    """Restore a checkpoint; step=None picks the latest."""
    if step is None:
        step = latest_step(save_path)
        if step is None:
            return None
    path = _ckpt_dir(save_path, step)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, target=template)
    return ckptr.restore(path)


def latest_step(save_path):
    """Max step among model-NNNNNN.ckpt entries (auto-resume)."""
    if not os.path.isdir(save_path):
        return None
    steps = []
    for name in os.listdir(save_path):
        m = re.fullmatch(r"model-(\d+)\.ckpt", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None
