"""On-device circular replay for vectorized actors.

The reference feeds a C++ Reverb server / Dopamine's host-RAM
OutOfGraphReplayBuffer over RPC (SURVEY.md 2.6); here replay is a pytree
of device arrays laid out (envs, time_ring, ...): every env writes its
transition each step at the same ring cursor (lockstep episodes), and
n-step returns are computed at sample time from the stored reward/terminal
lanes -- no host round-trips, no serialization, compatible with sharding
the env axis across chips.

Capacity = num_envs * ring_len (the reference uses 2M transitions,
e.g. 4096 envs x 512 slots).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayConfig:
  ring_len: int = 512
  n_step: int = 5
  gamma: float = 0.993
  batch_size: int = 32
  # Prioritized replay (reference quantile.gin uses Dopamine's prioritized
  # buffer). TPU-ified scheme: envs are drawn uniformly, the time slot
  # within each drawn env is drawn by priority via Gumbel-max -- a global
  # sum-tree would serialize; this keeps sampling one fused pass over a
  # (B, ring_len) tile. Loss weights and priority updates follow
  # Dopamine's sqrt scheme.
  prioritized: bool = False
  priority_epsilon: float = 1e-3


@struct.dataclass
class ReplayState:
  obs: jnp.ndarray  # (E, T, obs_dim)
  action: jnp.ndarray  # (E, T) int32
  reward: jnp.ndarray  # (E, T) float32
  terminal: jnp.ndarray  # (E, T) bool: episode ended AT this step.
  valid: jnp.ndarray  # (E, T) bool: transition written and pre-terminal.
  episode_step: jnp.ndarray  # (E, T) int32: step index within episode.
  priority: jnp.ndarray  # (E, T) float32 sampling priorities.
  total: jnp.ndarray  # int32, global steps written (shared cursor).
  # Optional recurrent-actor state at the START of each stored step
  # (R2D2 stored-state replay, Kapturowski et al. 2019): (E, T, S)
  # flattened carries, or None for feedforward agents.
  actor_state: Optional[jnp.ndarray] = None


def init(num_envs: int, obs_dim: int, config: ReplayConfig,
         obs_dtype=jnp.float32, actor_state_dim: int = 0) -> ReplayState:
  t = config.ring_len
  return ReplayState(
      obs=jnp.zeros((num_envs, t, obs_dim), obs_dtype),
      action=jnp.zeros((num_envs, t), jnp.int32),
      reward=jnp.zeros((num_envs, t), jnp.float32),
      terminal=jnp.zeros((num_envs, t), jnp.bool_),
      valid=jnp.zeros((num_envs, t), jnp.bool_),
      episode_step=jnp.zeros((num_envs, t), jnp.int32),
      priority=jnp.zeros((num_envs, t), jnp.float32),
      total=jnp.int32(0),
      actor_state=(jnp.zeros((num_envs, t, actor_state_dim), jnp.float32)
                   if actor_state_dim else None))


def add(state: ReplayState, config: ReplayConfig, obs, action, reward,
        terminal, active, episode_step, actor_state=None) -> ReplayState:
  """Writes one lockstep batch of transitions (obs_t, a_t, r_t).

  Args:
    obs: (E, obs_dim) observations BEFORE the action.
    action, reward, terminal: (E,) transition data.
    active: (E,) whether the env was still live at this step (frozen
      post-terminal balloons write invalid slots).
    episode_step: (E,) step index within the current episode.
    actor_state: (E, S) flattened recurrent-actor carries at this step
      (required iff the buffer was initialized with actor_state_dim).
  """
  slot = state.total % config.ring_len
  upd = lambda buf, new: buf.at[:, slot].set(new)
  # New transitions get the current max priority (Dopamine convention) so
  # they are sampled at least once.
  max_priority = jnp.maximum(jnp.max(state.priority), 1.0)
  new_priority = jnp.where(active, max_priority, 0.0)
  return ReplayState(
      obs=upd(state.obs, obs.astype(state.obs.dtype)),
      action=upd(state.action, action.astype(jnp.int32)),
      reward=upd(state.reward, reward),
      terminal=upd(state.terminal, terminal),
      valid=upd(state.valid, active),
      episode_step=upd(state.episode_step, episode_step),
      priority=upd(state.priority, new_priority),
      total=state.total + 1,
      actor_state=(upd(state.actor_state, actor_state)
                   if state.actor_state is not None else None))


def sample(state: ReplayState, config: ReplayConfig, key: jax.Array):
  """Uniform n-step sample (Dopamine update_horizon semantics).

  Returns a dict with (B, ...) leaves:
    obs, action, n_step_return-free pieces: `rewards` already discounted and
    summed, `bootstrap_discount` (gamma^n or 0 if the horizon hit a
    terminal), `next_obs` (at t+n, clamped), and `weight` in {0, 1}
    zeroing incoherent samples (episode boundary / unwritten slots).
  """
  n = config.n_step
  t_ring = config.ring_len
  env_key, time_key = jax.random.split(key)

  num_envs = state.obs.shape[0]
  env_idx = jax.random.randint(env_key, (config.batch_size,), 0, num_envs)

  # Valid base steps: the window uses g..g+n, so
  # g in [max(0, total - t_ring), total - n - 1].
  oldest = jnp.maximum(0, state.total - t_ring)
  hi = jnp.maximum(oldest + 1, state.total - n)

  if config.prioritized:
    # Per drawn env, Gumbel-max over log-priorities of eligible slots.
    prio = state.priority[env_idx]  # (B, T)
    cursor_prev = (state.total - 1) % t_ring
    s_iota = jnp.arange(t_ring)
    g_of_s = state.total - 1 - ((cursor_prev - s_iota) % t_ring)  # (T,)
    eligible = jnp.logical_and(g_of_s >= oldest,
                               g_of_s <= state.total - 1 - n)
    logits = jnp.log(jnp.maximum(prio, 1e-20))
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(time_key, prio.shape, minval=1e-10, maxval=1.0)))
    masked = jnp.where(jnp.logical_and(eligible[None, :], prio > 0),
                       logits + gumbel, -jnp.inf)
    slot0 = jnp.argmax(masked, axis=-1)  # (B,)
    g = g_of_s[slot0]
    prio_sum = jnp.sum(jnp.where(eligible[None, :], prio, 0.0), axis=-1)
    probability = (jnp.take_along_axis(prio, slot0[:, None], -1)[:, 0] /
                   jnp.maximum(prio_sum, 1e-20))
  else:
    g = oldest + (jax.random.randint(time_key, (config.batch_size,), 0,
                                     jnp.iinfo(jnp.int32).max) %
                  jnp.maximum(hi - oldest, 1))
    probability = jnp.ones((config.batch_size,))

  slots = (g[:, None] + jnp.arange(n + 1)[None, :]) % t_ring  # (B, n+1)

  def gather(buf):
    return buf[env_idx[:, None], slots]

  rewards = gather(state.reward)[:, :n]  # (B, n)
  terminals = gather(state.terminal)[:, :n]
  valids = gather(state.valid)
  ep_steps = gather(state.episode_step)

  # Mask rewards after the first terminal inside the window.
  not_term_before = jnp.cumprod(
      jnp.concatenate([jnp.ones_like(terminals[:, :1]),
                       1 - terminals[:, :-1].astype(jnp.int32)], axis=1),
      axis=1).astype(jnp.float32)  # (B, n): 1 until (incl.) first terminal.
  discounts = config.gamma ** jnp.arange(n)
  n_step_reward = jnp.sum(rewards * discounts * not_term_before, axis=1)

  hit_terminal = jnp.any(terminals, axis=1)
  bootstrap = jnp.where(hit_terminal, 0.0, config.gamma ** n)

  obs = gather(state.obs)[:, 0].astype(jnp.float32)
  next_obs = gather(state.obs)[:, n].astype(jnp.float32)
  action = gather(state.action)[:, 0]

  # Coherence: base slot valid, and the window stays within one episode up
  # to the first terminal (episode_step increments by 1 per slot).
  expected = ep_steps[:, :1] + jnp.arange(n + 1)[None, :]
  coherent_steps = ep_steps == expected
  # Only slots up to the bootstrap target need coherence; slots after a
  # terminal contribute nothing (rewards masked, bootstrap zeroed).
  need = jnp.concatenate([not_term_before > 0,
                          jnp.logical_not(hit_terminal)[:, None]], axis=1)
  coherent = jnp.all(jnp.logical_or(coherent_steps, ~need), axis=1)
  base_ok = valids[:, 0]
  # Numerical quarantine: a transition containing a non-finite value (e.g.
  # a physics edge case that slipped through) must not reach the gradient
  # -- one inf/NaN sample permanently destroys the params. Costs one
  # fused reduction over the (B, obs_dim) gather already in registers.
  finite = jnp.logical_and(
      jnp.all(jnp.isfinite(obs), axis=-1),
      jnp.logical_and(jnp.all(jnp.isfinite(next_obs), axis=-1),
                      jnp.isfinite(n_step_reward)))
  weight = (jnp.logical_and(jnp.logical_and(coherent, base_ok), finite)
            .astype(jnp.float32))

  if config.prioritized:
    # Dopamine scheme: importance weights 1/sqrt(prob), normalized by max.
    iw = 1.0 / jnp.sqrt(probability + config.priority_epsilon)
    iw = iw / jnp.maximum(jnp.max(iw), 1e-20)
    weight = weight * iw

  return {
      'obs': obs,
      'action': action,
      'n_step_reward': n_step_reward,
      'bootstrap_discount': bootstrap,
      'next_obs': next_obs,
      'weight': weight,
      'env_idx': env_idx,
      'slot': slots[:, 0],
  }


def update_priorities(state: ReplayState, config: ReplayConfig, env_idx,
                      slot, per_sample_loss) -> ReplayState:
  """Sets sampled slots' priorities to sqrt(loss + eps) (Dopamine).

  Non-finite losses are replaced by priority 1.0: `add` seeds new slots
  with max(priority), so one NaN here would otherwise poison the whole
  priority lane permanently.
  """
  new_p = jnp.sqrt(per_sample_loss + config.priority_epsilon)
  new_p = jnp.where(jnp.isfinite(new_p), new_p, 1.0)
  return state.replace(
      priority=state.priority.at[env_idx, slot].set(new_p))


def can_sample(state: ReplayState, config: ReplayConfig,
               min_history: int) -> jnp.ndarray:
  return state.total > (min_history // max(state.obs.shape[0], 1) +
                        config.n_step)


def sample_sequence(state: ReplayState, config: ReplayConfig,
                    key: jax.Array, seq_len: int):
  """Contiguous-window sample for recurrent (R2D2-style) learners.

  The reference's recurrent variant replays fixed-length sequences
  through an Acme/Reverb sequence adder (reference acme_utils.py:100-157,
  280-285); here a window of `seq_len + 1` consecutive ring slots is
  gathered per sampled (env, start) pair — the ring already stores
  time-ordered per-env lanes, so a sequence is one strided gather, no
  separate sequence buffer.

  Returns a dict of (B, L+1, ...) leaves plus a per-step loss mask:
    obs (B, L+1, D), action/reward/terminal (B, L+1),
    step_weight (B, L): 1 where the 1-step transition t -> t+1 is
      written, inside one episode, finite, and pre-terminal.
  """
  t_ring = config.ring_len
  env_key, time_key = jax.random.split(key)
  num_envs = state.obs.shape[0]
  batch = config.batch_size

  env_idx = jax.random.randint(env_key, (batch,), 0, num_envs)
  oldest = jnp.maximum(0, state.total - t_ring)
  hi = jnp.maximum(oldest + 1, state.total - seq_len)
  g = oldest + (jax.random.randint(time_key, (batch,), 0,
                                   jnp.iinfo(jnp.int32).max) %
                jnp.maximum(hi - oldest, 1))
  slots = (g[:, None] + jnp.arange(seq_len + 1)[None, :]) % t_ring

  def gather(buf):
    return buf[env_idx[:, None], slots]

  obs = gather(state.obs).astype(jnp.float32)  # (B, L+1, D)
  action = gather(state.action)
  reward = gather(state.reward)
  terminal = gather(state.terminal)
  valid = gather(state.valid)
  ep_steps = gather(state.episode_step)

  # Step t's transition (t -> t+1) is trainable iff both slots were
  # written, they belong to the same episode (episode_step increments),
  # no terminal occurred strictly before t inside the window, and the
  # values are finite (same quarantine as `sample`).
  coherent = ep_steps == (ep_steps[:, :1] + jnp.arange(seq_len + 1)[None])
  pair_ok = jnp.logical_and(valid[:, :-1], coherent[:, 1:])
  no_term_before = jnp.cumprod(
      jnp.concatenate([jnp.ones_like(terminal[:, :1], jnp.int32),
                       1 - terminal[:, :-1].astype(jnp.int32)], axis=1),
      axis=1)[:, :-1]  # (B, L): 1 through the first terminal step.
  finite = jnp.all(jnp.isfinite(obs), axis=-1)
  step_weight = (pair_ok.astype(jnp.float32) *
                 no_term_before.astype(jnp.float32) *
                 finite[:, :-1].astype(jnp.float32) *
                 finite[:, 1:].astype(jnp.float32) *
                 jnp.isfinite(reward[:, :-1]).astype(jnp.float32))

  out = {
      'obs': obs,
      'action': action,
      'reward': reward,
      'terminal': terminal,
      'step_weight': step_weight,
      'env_idx': env_idx,
      'slot': slots[:, 0],
  }
  if state.actor_state is not None:
    # Stored-state replay: the recurrent carry at the window's first step
    # initializes the learner unroll (instead of burn-in from zeros).
    out['start_state'] = state.actor_state[env_idx, slots[:, 0]]
  return out
