"""Checkpoint/resume utilities (SURVEY.md section 5).

Frame-loop temporal state uses plain npz (frameloop.save_state); model
parameters (the learned upscaler) use orbax so sharded/multi-host saves
work unchanged later.
"""
from __future__ import annotations

import os


def save_params(path: str, params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, target=template)
    return ckptr.restore(path)
