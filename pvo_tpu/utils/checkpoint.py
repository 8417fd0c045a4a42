"""Checkpoint / resume via orbax.

Rebuild of the reference's checkpointing (VO: torch.save every 2000
steps + --ckpt restore, train.py:301-311; VPS: DetectionCheckpointer
resume_or_load): orbax-backed save/restore of param/optimizer pytrees
with a resume-or-load helper, plus torch-checkpoint import through the
converters.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _manager(directory):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(os.path.abspath(directory))


def save(directory, step, tree):
    import orbax.checkpoint as ocp
    mngr = _manager(directory)
    mngr.save(step, args=ocp.args.StandardSave(tree))
    mngr.wait_until_finished()


def load(directory, step=None, template=None):
    import orbax.checkpoint as ocp
    mngr = _manager(directory)
    step = step if step is not None else mngr.latest_step()
    if step is None:
        return None
    if template is not None:
        return mngr.restore(step,
                            args=ocp.args.StandardRestore(template))
    return mngr.restore(step)


def resume_or_load(directory, init_tree, torch_path: Optional[str] = None,
                   convert=None) -> Any:
    """detectron2-style resume_or_load: prefer the latest orbax
    checkpoint; else import a torch checkpoint via ``convert``;
    else return the initializer tree."""
    restored = load(directory, template=init_tree)
    if restored is not None:
        return restored
    if torch_path and os.path.exists(torch_path) and convert:
        return convert(torch_path)
    return init_tree
