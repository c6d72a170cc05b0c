"""Generation orchestrator: selfplay -> SGD -> gating duel -> Elo ->
checkpoint.

Reference equivalent: `trainingPipeline` (selfplay.jl:1-109) plus the outer
generation loop of the entry scripts (main4IARow.jl:120-143).  Semantics
kept:
* the *best* network generates selfplay data (selfplay.jl:34),
* the training network keeps training from itself across generations and
  replaces the best one only when the duel Elo improves (selfplay.jl:72-77),
* duel: 32 rollouts, 1024 games, half with each starter (selfplay.jl:56).

Multi-chip execution (``devices != 1`` - the reference is single-GPU,
SURVEY.md section 2.2): the exact same generation protocol routes through
:mod:`alphatpu.parallel` - selfplay lanes, the replay buffer and duel games
shard over a 1-axis ``dp`` mesh with zero cross-chip traffic during search;
the learner runs data-parallel with psum'd gradients; params stay
replicated, so the per-generation weight "broadcast" is free.  Multi-host
needs only ``jax.distributed.initialize()`` (the CLI's ``--multihost``)
before the pipeline is built.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from . import checkpoint as ckpt
from .buffer import create_buffer, global_buffer_size
from .duel import DuelConfig, duel_network, elo_update
from .nets.mlp import apply_inference, config_for_game, init_params
from .selfplay import SelfplayConfig, selfplay_continuous, selfplay_generation
from .train import TrainConfig, make_optimizer, train_epoch

# Module-level jit wrappers so repeated generations hit the compile cache
# (static args: game object, net apply fn, config NamedTuples, optimizer).
_selfplay_jit = jax.jit(selfplay_generation, static_argnums=(0, 1, 5))
_selfplay_cont_jit = jax.jit(selfplay_continuous, static_argnums=(0, 1, 5))
_train_jit = jax.jit(train_epoch, static_argnums=(4, 5))


@dataclass
class PipelineConfig:
    selfplay: SelfplayConfig = field(default_factory=SelfplayConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    duel: DuelConfig = field(default_factory=DuelConfig)
    buffer_capacity: int = 2_000_000  # main4IARow.jl:126
    generations: int = 100
    seed: int = 0
    width: int = 512
    depth: Optional[int] = None  # per-game default (nets.config_for_game)
    ckpt_dir: Optional[str] = None
    save_buffer: bool = False
    net_apply: Callable = apply_inference
    devices: int = 1  # 0 = all available; 1 = single-device path
    log: Callable[[str], None] = print

    def num_devices(self) -> int:
        return self.devices if self.devices else len(jax.devices())


@lru_cache(maxsize=None)
def _sharded_exec(game, net_apply, sp_cfg: SelfplayConfig,
                  tr_cfg: TrainConfig, duel_cfg: DuelConfig, optimizer,
                  num_devices: int):
    """Build (mesh, selfplay, train, duel) sharded executors once per
    configuration - each wraps a cached jit, so generations reuse the
    compiled programs."""
    from .parallel import (
        make_mesh,
        sharded_duel_network,
        sharded_selfplay_fn,
        sharded_train_fn,
    )

    mesh = make_mesh(num_devices)
    D = mesh.devices.size
    if sp_cfg.num_games % D:
        raise ValueError(
            f"--samples ({sp_cfg.num_games}) must divide the device count {D}"
        )
    if tr_cfg.batch_size % D:
        raise ValueError(
            f"--batchsize ({tr_cfg.batch_size}) must divide the device count {D}"
        )
    if duel_cfg.num_games % (2 * D):
        raise ValueError(
            f"--duel-games ({duel_cfg.num_games}) must divide 2x the device "
            f"count {D}"
        )
    return (
        mesh,
        sharded_selfplay_fn(game, net_apply, sp_cfg, mesh),
        sharded_train_fn(game, tr_cfg, optimizer, mesh),
        sharded_duel_network(game, net_apply, duel_cfg, mesh),
    )


@dataclass
class PipelineState:
    best_params: Any
    train_params: Any
    opt_state: Any
    buffer: Any
    rng: Any
    elo: float = -1000.0  # main4IARow.jl:127
    generation: int = 0
    best_generation: int = 0
    # continuous mode: in-flight episodes persist across generations (zero
    # dropped search compute).  None = start fresh.  Checkpointed together
    # with the buffer (--save-buffer) so a resume continues the in-flight
    # episodes exactly - on a device mesh too (the rng leaf is the [D]
    # per-device key stack; resume requires the same --devices count,
    # tests/test_parallel.py::test_sharded_carry_resume_exact).  Without
    # --save-buffer a resume restarts lanes on fresh episodes (bounded
    # one-generation loss).
    sp_carry: Any = None


def init_pipeline(game, cfg: PipelineConfig) -> PipelineState:
    key = jax.random.key(cfg.seed)
    k_net, k_run = jax.random.split(key)
    net_cfg = config_for_game(game, width=cfg.width, depth=cfg.depth)
    params = init_params(k_net, net_cfg)
    optimizer = make_optimizer(cfg.train)
    return PipelineState(
        best_params=params,
        train_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
        buffer=create_buffer(game, cfg.buffer_capacity,
                             shards=cfg.num_devices()),
        rng=k_run,
    )


def run_generation(game, state: PipelineState, cfg: PipelineConfig):
    """One generation. Mutates and returns ``state`` plus a stats dict."""
    log = cfg.log
    gen = state.generation + 1
    state.rng, k_sp, k_tr, k_duel = jax.random.split(state.rng, 4)
    optimizer = make_optimizer(cfg.train)
    D = cfg.num_devices()
    if D > 1:
        mesh, sp_fn, tr_fn, duel_fn = _sharded_exec(
            game, cfg.net_apply, cfg.selfplay, cfg.train, cfg.duel,
            optimizer, D,
        )
        from .parallel import device_keys

    t0 = time.time()
    if D > 1:
        if cfg.selfplay.continuous:
            keys = device_keys(k_sp, mesh)
            if state.sp_carry is None:
                from .selfplay import make_carry

                state.sp_carry = make_carry(
                    game, cfg.selfplay.num_games, k_sp
                )._replace(rng=keys)
            state.buffer, sp_stats, state.sp_carry = sp_fn(
                state.best_params, state.buffer, keys, state.sp_carry,
            )
        else:
            state.buffer, sp_stats = sp_fn(
                state.best_params, state.buffer, device_keys(k_sp, mesh)
            )
    elif cfg.selfplay.continuous:
        state.buffer, sp_stats, state.sp_carry = _selfplay_cont_jit(
            game, cfg.net_apply, state.best_params, state.buffer, k_sp,
            cfg.selfplay, state.sp_carry,
        )
    else:
        state.buffer, sp_stats = _selfplay_jit(
            game, cfg.net_apply, state.best_params, state.buffer, k_sp,
            cfg.selfplay,
        )
    sp_stats = jax.device_get(sp_stats)
    t_sp = time.time() - t0
    log(
        f"[gen {gen}] selfplay: {t_sp:.1f}s  "
        f"w/d/l={int(sp_stats['wins'])}/{int(sp_stats['draws'])}/"
        f"{int(sp_stats['losses'])}  mean_len={float(sp_stats['mean_length']):.1f}  "
        f"buffer={int(global_buffer_size(state.buffer))}"
    )
    if int(sp_stats["illegal_moves"]):
        log(f"[gen {gen}] WARNING illegal moves: {int(sp_stats['illegal_moves'])}")
    if not cfg.selfplay.continuous and int(sp_stats["unfinished"]):
        log(f"[gen {gen}] note: {int(sp_stats['unfinished'])} unfinished games")

    t0 = time.time()
    loss = None
    for epoch in range(cfg.train.epochs):
        k_ep = jax.random.fold_in(k_tr, epoch)
        if D > 1:
            state.train_params, state.opt_state, loss = tr_fn(
                state.train_params, state.opt_state, state.buffer, k_ep
            )
        else:
            state.train_params, state.opt_state, loss = _train_jit(
                state.train_params, state.opt_state, state.buffer, k_ep,
                cfg.train, optimizer,
            )
    loss = float(loss)
    t_tr = time.time() - t0
    log(f"[gen {gen}] train: {t_tr:.1f}s  loss={loss:.4f}")

    t0 = time.time()
    if D > 1:
        w, d, l, du_unfinished = duel_fn(
            state.train_params, state.best_params, k_duel
        )
    else:
        w, d, l, du_unfinished = duel_network(
            game, cfg.net_apply, state.train_params, state.best_params,
            k_duel, cfg.duel,
        )
    t_du = time.time() - t0
    new_elo = elo_update(w, d, l, state.elo)
    passed = new_elo > state.elo
    log(
        f"[gen {gen}] duel: {t_du:.1f}s  candidate w/d/l={w}/{d}/{l}  "
        f"elo {state.elo:.1f} -> {new_elo:.1f}  {'PROMOTED' if passed else 'kept'}"
    )
    if du_unfinished:
        log(f"[gen {gen}] note: {du_unfinished} duel games unfinished at the "
            f"move bound (excluded from the tally)")
    if passed:
        state.elo = new_elo
        state.best_params = jax.tree.map(jnp.copy, state.train_params)
        state.best_generation = gen

    state.generation = gen
    if cfg.ckpt_dir:
        ckpt.save_checkpoint(
            cfg.ckpt_dir,
            gen,
            best_params=state.best_params,
            train_params=state.train_params,
            opt_state=state.opt_state,
            elo=state.elo,
            best_generation=state.best_generation,
            rng=jax.random.key_data(state.rng),
            buffer=state.buffer if cfg.save_buffer else None,
            sp_carry=(
                state.sp_carry._replace(
                    rng=jax.random.key_data(state.sp_carry.rng))
                if cfg.save_buffer and state.sp_carry is not None else None
            ),
        )
    stats = {
        "generation": gen,
        "selfplay_s": t_sp,
        "train_s": t_tr,
        "duel_s": t_du,
        "loss": loss,
        "duel": (w, d, l),
        "duel_unfinished": du_unfinished,
        "elo": state.elo,
        "promoted": passed,
        **{k: int(v) if hasattr(v, "item") else v for k, v in sp_stats.items()},
    }
    return state, stats


def run_training(game, cfg: PipelineConfig, state: PipelineState | None = None):
    if state is None:
        state = init_pipeline(game, cfg)
    history = []
    for _ in range(cfg.generations - state.generation):
        state, stats = run_generation(game, state, cfg)
        history.append(stats)
        cfg.log(
            f"[gen {stats['generation']}] best so far: generation "
            f"{state.best_generation}, elo {state.elo:.1f}"
        )
    return state, history
