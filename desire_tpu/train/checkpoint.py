"""Orbax checkpoint / resume (SURVEY §5 checkpoint row).

The reference half-implemented this: a tf.train.Saver wrote
save/social_model.ckpt every 400 steps (train.py:197-205) but **no restore
path existed anywhere** — training always restarted from scratch. Here:
full state (params, optimizer, step, PRNG key, data-pipeline position) with
keep-latest-N, plus the config serialized alongside (the reference pickled
argparse args to save/config.pkl, train.py:102-103 — we write JSON).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from desire_tpu.config import DesireConfig
from desire_tpu.data.loader import LoaderState
from desire_tpu.train.state import TrainState


def _replicated_to_host(x):
    """Materialize a (possibly multi-host-replicated) array on this host."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_shards[0].data)
    return x


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3,
                 keep_best_metric: str | None = None):
        """keep_best_metric: when set, retention keeps the `keep` BEST
        checkpoints by this (minimized) metric key instead of the latest
        `keep` — the candidate pool for the end-of-training full-split
        selection (train.py --final_select_top; VERDICT r4 item 8)."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        opts = dict(max_to_keep=keep, create=True)
        if keep_best_metric is not None:
            opts.update(best_fn=lambda m: m[keep_best_metric],
                        best_mode="min")
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(**opts),
        )

    def all_steps(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    def restore_step(self, step: int, template_state: TrainState
                     ) -> tuple[TrainState, LoaderState] | None:
        return self._restore_at(step, template_state)

    def save(self, state: TrainState, loader_state: LoaderState,
             cfg: DesireConfig, wait: bool = False,
             metrics: dict | None = None) -> None:
        if jax.process_count() > 1:
            # multi-host: train state is replicated (trainer out_shardings),
            # so process 0 alone writes; other hosts' data is identical.
            # Replicated-but-not-fully-addressable arrays are materialized
            # from a local shard (every device holds the full array).
            if jax.process_index() != 0:
                return
            state = jax.tree_util.tree_map(_replicated_to_host, state)
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "key": np.asarray(jax.random.key_data(state.key))
            if jax.dtypes.issubdtype(state.key.dtype, jax.dtypes.prng_key)
            else np.asarray(state.key),
            "loader_epoch": np.asarray(loader_state.epoch),
            "loader_batch": np.asarray(loader_state.batch_index),
        }
        self._mgr.save(int(state.step), args=ocp.args.StandardSave(payload),
                       metrics=metrics)
        with open(os.path.join(self.directory, "config.json"), "w") as f:
            f.write(cfg.to_json())
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template_state: TrainState
                ) -> tuple[TrainState, LoaderState] | None:
        return self._restore_at(self._mgr.latest_step(), template_state)

    def _restore_at(self, step: int | None, template_state: TrainState
                    ) -> tuple[TrainState, LoaderState] | None:
        if step is None:
            return None
        template = {
            "params": template_state.params,
            "opt_state": template_state.opt_state,
            "step": np.asarray(template_state.step),
            "key": np.asarray(jax.random.key_data(template_state.key))
            if jax.dtypes.issubdtype(template_state.key.dtype,
                                     jax.dtypes.prng_key)
            else np.asarray(template_state.key),
            "loader_epoch": np.asarray(0),
            "loader_batch": np.asarray(0),
        }
        got = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        key = got["key"]
        key = jax.random.wrap_key_data(np.asarray(key))
        state = TrainState(step=jax.numpy.asarray(got["step"]),
                           params=got["params"],
                           opt_state=got["opt_state"], key=key)
        loader_state = LoaderState(epoch=int(got["loader_epoch"]),
                                   batch_index=int(got["loader_batch"]))
        return state, loader_state

    def wait(self):
        self._mgr.wait_until_finished()


def load_config(directory: str) -> DesireConfig | None:
    path = os.path.join(directory, "config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return DesireConfig.from_json(f.read())


# Model-geometry fields: the config entries that shape the forward pass or
# the parameter pytree. Anything that restores a checkpoint (evaluate.py,
# serve.Predictor) must take these from the SAVED config, not the caller's
# defaults — e.g. input_norm changes the embed width (shape mismatch),
# vel_scale/speed_norm silently rescale every residual, social_freeze
# changes inference semantics.
GEOMETRY_FIELDS = (
    "d_dim", "latent_size", "embedding_size", "rnn_size", "num_layers",
    "channel_multiplier", "scene_grid", "scene_channels", "use_ioc",
    "use_scf", "use_social", "num_refine", "vel_scale", "speed_norm",
    "vel_gain", "vel_floor", "cond_prior", "learn_bound", "aniso_bound",
    "vae_dec", "input_norm", "pace_range", "pace_lanes", "social_freeze",
    "scene_image_channels", "scene_image_source", "z_temp_learn",
    "rank_blend_fit",
    "obs_len", "pred_len", "subsample", "max_num_obj", "protocol")


def overlay_geometry(cfg: DesireConfig, saved_cfg: DesireConfig,
                     skip: tuple | frozenset = ()) -> DesireConfig:
    """Overlay the saved checkpoint's geometry onto cfg (minus `skip` —
    fields the caller explicitly set, e.g. --num_refine 0 to eval the raw
    SGM hypotheses)."""
    return cfg.replace(**{f: getattr(saved_cfg, f) for f in GEOMETRY_FIELDS
                          if f not in skip})
