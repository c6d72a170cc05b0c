"""Checkpoint / resume: params + optimizer state + Elo + RNG + (optionally)
the replay buffer, per generation.

The reference saves only a CPU copy of the network per generation (JLD2,
selfplay.jl:86-99) and resume is manual (uncommenting @load lines,
main4IARow.jl:121-122); optimizer state and buffer are lost on crash
(SURVEY.md section 5).  Here a crash loses at most one generation: every
piece of training state round-trips through one ``.npz`` per generation
plus a JSON manifest.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path: str, tree) -> None:
    np.savez_compressed(path, **_flatten(tree))


def load_pytree_like(path: str, template):
    """Load arrays saved by :func:`save_pytree` into the structure of
    ``template`` (leaf order/paths must match)."""
    with np.load(path) as data:
        flat = dict(data)
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in leaves_paths:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
        arr = flat[key]
        leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    ckpt_dir: str,
    generation: int,
    *,
    best_params,
    train_params,
    opt_state,
    elo: float,
    best_generation: int,
    rng,
    buffer=None,
    sp_carry=None,
) -> str:
    """``sp_carry`` (continuous-selfplay EpisodeCarry) is serialized with
    the buffer, making a resume exact: in-flight episodes continue instead
    of restarting, so nothing the search paid for is ever dropped
    (selfplay.EpisodeCarry invariant) even across a crash."""
    os.makedirs(ckpt_dir, exist_ok=True)
    # index wraps at 1000 like the reference's reseau$index (selfplay.jl:53)
    index = (generation - 1) % 1000 + 1
    base = os.path.join(ckpt_dir, f"net{index}")
    save_pytree(base + ".npz", {
        "best": best_params,
        "train": train_params,
        "opt": opt_state,
        "rng": rng,
    })
    if buffer is not None:
        save_pytree(os.path.join(ckpt_dir, "buffer.npz"), buffer)
    if sp_carry is not None:
        save_pytree(os.path.join(ckpt_dir, "carry.npz"), sp_carry)
    manifest = {
        "generation": generation,
        "index": index,
        "elo": float(elo),
        "best_generation": int(best_generation),
        "has_buffer": buffer is not None,
        "has_carry": sp_carry is not None,
    }
    with open(os.path.join(ckpt_dir, "latest.json"), "w") as f:
        json.dump(manifest, f)
    return base + ".npz"


def load_checkpoint(
    ckpt_dir: str, *, best_params, train_params, opt_state, rng, buffer=None,
    sp_carry=None,
) -> Tuple[Dict[str, Any], Any]:
    """Resume from the latest manifest; templates give structure/dtypes.
    Returns (manifest, state-dict with the same keys as save)."""
    with open(os.path.join(ckpt_dir, "latest.json")) as f:
        manifest = json.load(f)
    base = os.path.join(ckpt_dir, f"net{manifest['index']}.npz")
    state = load_pytree_like(base, {
        "best": best_params,
        "train": train_params,
        "opt": opt_state,
        "rng": rng,
    })
    if buffer is not None and manifest.get("has_buffer"):
        state["buffer"] = load_pytree_like(
            os.path.join(ckpt_dir, "buffer.npz"), buffer
        )
    if sp_carry is not None and manifest.get("has_carry"):
        state["sp_carry"] = load_pytree_like(
            os.path.join(ckpt_dir, "carry.npz"), sp_carry
        )
    return manifest, state
