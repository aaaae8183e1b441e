"""Checkpoint / resume.

The reference has no persistence at all — pause/resume is runtime-only
(Q/E keys, `main.cpp:163-164`) and state lives solely in GPU memory.  Here
the full simulation state is the FluidState pytree (SURVEY.md §2.3's 12
images + particle buffer collapse into its 9 arrays), so checkpointing is a
single npz write; the config is stored alongside so a checkpoint is
self-describing and restart-safe.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import FluidState

_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: FluidState, cfg: FluidConfig) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {name: np.asarray(jax.device_get(leaf))
              for name, leaf in zip(state._fields, state)}
    meta = json.dumps({"version": _FORMAT_VERSION,
                       "config": dataclasses.asdict(cfg)})
    tmp = path + ".tmp"
    np.savez_compressed(tmp if tmp.endswith(".npz") else tmp,
                        __meta__=np.frombuffer(meta.encode(), dtype=np.uint8),
                        **arrays)
    # numpy appends .npz to names without it
    written = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(written, path)


def load_checkpoint(path: str):
    """Returns (state, cfg).  Arrays land on the default device."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unknown checkpoint version {meta['version']}")
        cfg_dict = meta["config"]
        # tuples serialize as lists; restore at EVERY nesting level, or a
        # restored config with solid_boxes/extra_forces stays unhashable and
        # jit_step rejects it as a static argument
        from tpu_fluid.core.config import deep_tuple
        cfg_dict = {k: deep_tuple(v) if isinstance(v, list) else v
                    for k, v in cfg_dict.items()}
        cfg = FluidConfig(**cfg_dict)
        # fields added after a checkpoint was written load as their initial
        # value (additive format evolution: `dropped` arrived in round 4)
        defaults = {"dropped": np.zeros((), np.int32)}
        # inertia narrowed from int32 to cfg.inertia_dtype in round 4;
        # values are clamped to max_inertia, so the cast is lossless
        casts = {"inertia": cfg.inertia_dtype}
        leaves = [jax.device_put(
            np.asarray(data[name]).astype(casts[name])
            if name in data.files and name in casts
            else data[name] if name in data.files
            else defaults[name])
            for name in FluidState._fields]
    return FluidState(*leaves), cfg
