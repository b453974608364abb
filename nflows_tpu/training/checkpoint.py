"""Checkpoint / resume subsystem (orbax-backed).

The reference has no checkpoint subsystem — persistence is the torch
``state_dict`` convention (SURVEY.md §5). Here the whole ``TrainState``
(params + buffers + optimizer state + step) is one pytree; statics
(masks' degrees, configs, callables) live in the treedef and are
reconstructed from a template at restore time, so a checkpoint is exactly
the array leaves.

ActNorm's ``initialized`` flag and BatchNorm running stats are ordinary
pytree content and round-trip automatically (the reference must remember
to register such buffers, e.g. normalization.py:157).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "CheckpointManager"]



def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree (TrainState, flow, params...) to ``path`` (a directory)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` is a pytree with the same structure (e.g. a freshly
    constructed TrainState); its array leaves provide shapes/dtypes and its
    treedef provides all statics.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, _abstract_like(template))


def _abstract_like(template):
    """ShapeDtypeStructs carrying the template's shardings, so a restore
    onto a mesh (DP/TP-sharded TrainState) lands each leaf already laid out
    across the devices instead of replicated on host."""

    def leaf(x):
        if not hasattr(x, "shape"):
            return x
        sharding = getattr(x, "sharding", None)
        if isinstance(sharding, jax.sharding.NamedSharding):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    return jax.tree_util.tree_map(leaf, template)


class CheckpointManager:
    """Step-indexed checkpoint rotation for long trainings (resume support).

    Thin wrapper over orbax CheckpointManager: ``save(step, state)`` /
    ``restore(template, step=None)`` / ``latest_step()``.

    Saves are ASYNC by default: ``save`` snapshots the arrays to host and
    returns while serialization/writes proceed on a background thread, so
    checkpointing overlaps the next training dispatches instead of
    stalling the step loop (the snapshot is taken before ``save`` returns,
    so donated/updated buffers cannot corrupt it). ``restore``/``close``
    barrier on any in-flight write; call ``wait_until_finished()`` to
    barrier explicitly (e.g. before reading the checkpoint directory from
    another process). ``async_save=False`` restores write-through saves.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        import orbax.checkpoint as ocp
        self._async = async_save
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if not self._async:
            self._mgr.wait_until_finished()

    def wait_until_finished(self) -> None:
        """Barrier on any in-flight async save."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp
        self._mgr.wait_until_finished()
        if step is None:
            step = self._mgr.latest_step()
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(_abstract_like(template)))

    def close(self):
        self._mgr.close()
