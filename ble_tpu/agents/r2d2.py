"""Recurrent quantile learner (R2D2-style sequence replay + unroll).

The reference's recurrent variant wires an LSTM quantile network into an
Acme R2D2-like learner fed by a Reverb sequence adder (reference
acme_utils.py:100-157, 280-285: torso MLP -> LSTM -> quantile head,
unroll-based updates). The TPU-native counterpart:

  * sequences come straight out of the on-device replay ring as strided
    gathers (replay.sample_sequence) — no separate sequence buffer or
    RPC adder;
  * the learner unrolls online and target networks over the whole
    (B, L+1) window with one lax.scan, computing a 1-step double-DQN
    quantile-regression loss at every trainable step; the first
    `burn_in` steps only warm the LSTM state (zero start state + burn-in,
    the standard R2D2 recipe for stored-state-free replay);
  * the actor carries a per-env LSTM state in the TrainState and resets
    the lanes of re-initialized envs (learner.AgentCore.on_reset).
"""

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ble_tpu.agents import networks


@struct.dataclass
class R2d2Config:
  num_actions: int = 3
  num_atoms: int = 51
  torso_layers: int = 2
  hidden_units: int = 600
  lstm_units: int = 256
  # Duelling value/advantage head, the reference's R2D2 head shape
  # (acme_utils.py:126-142 DuellingMLP).
  duelling: bool = True
  gamma: float = 0.993
  # The reference's R2D2 variant inherits Acme's R2D2 defaults (lr
  # ~1e-3); the round-3 run at the QR-DQN-style 1e-5 did ~32x fewer
  # grad steps per env step than the feedforward run (sequence SPI
  # accounting) and stayed flat (results/r2d2_run). 5e-5 plus a raised
  # SPI is the round-4 recipe (results/r2d2_run_r4).
  learning_rate: float = 5e-5
  adam_eps: float = 0.00002
  target_update_period: int = 100
  min_replay_history: int = 500
  kappa: float = 1.0
  # Total replayed window length; the first `burn_in` steps only warm the
  # LSTM state (no loss), leaving seq_len - burn_in trainable steps.
  seq_len: int = 24
  burn_in: int = 8
  # Sequence-priority mix: eta*max_t + (1-eta)*mean_t of the per-step
  # losses (the R2D2 recipe; Kapturowski et al. 2019, and the reference's
  # Acme R2D2 variant at acme_utils.py:100-157).
  priority_eta: float = 0.9
  # Stored-state replay: initialize the learner unroll from the actor's
  # recurrent carry recorded WITH each transition (R2D2's best-performing
  # variant) instead of zeros; burn-in then recovers from staleness
  # rather than from nothing. Costs 2*lstm_units f32 per replay slot.
  stored_state: bool = False


@struct.dataclass
class LearnerState:
  params: Any
  target_params: Any
  opt_state: Any
  train_steps: jnp.ndarray


def make_network(config: R2d2Config) -> networks.LstmQuantileNetwork:
  return networks.LstmQuantileNetwork(
      num_actions=config.num_actions, num_atoms=config.num_atoms,
      torso_layers=config.torso_layers, hidden_units=config.hidden_units,
      lstm_units=config.lstm_units, duelling=config.duelling)


def make_optimizer(config: R2d2Config):
  return optax.adam(config.learning_rate, eps=config.adam_eps)


def init(key: jax.Array, config: R2d2Config, obs_dim: int) -> LearnerState:
  net = make_network(config)
  carry = net.initial_state(None)
  params = net.init(key, carry, jnp.zeros((obs_dim,)))
  return LearnerState(params=params, target_params=params,
                      opt_state=make_optimizer(config).init(params),
                      train_steps=jnp.int32(0))


def actor_init(config: R2d2Config, batch_shape):
  """LSTM carry, zeros at episode start (acme_utils zero state).

  batch_shape: (num_envs,) for the vectorized actor, () for single-env
  eval policies.
  """
  if isinstance(batch_shape, int):
    batch_shape = (batch_shape,)
  return make_network(config).initial_state(None, tuple(batch_shape))


def carry_to_vec(carry):
  """(c, h) LSTM carry -> (..., 2*units) flat vector (replay storage)."""
  c, h = carry
  return jnp.concatenate([c, h], axis=-1)


def vec_to_carry(vec):
  units = vec.shape[-1] // 2
  return (vec[..., :units], vec[..., units:])


def actor_reset(carry, mask):
  """Zeroes the carry lanes of envs that were just re-initialized."""
  return jax.tree.map(
      lambda c: jnp.where(mask.reshape((-1,) + (1,) * (c.ndim - 1)), 0.0, c),
      carry)


def actor_select(config: R2d2Config, params, carry, obs, key, epsilon=0.0):
  """One recurrent policy step over the (E, D) batch."""
  new_carry, (q, _) = make_network(config).apply(params, carry, obs)
  greedy = jnp.argmax(q, axis=-1)
  if isinstance(epsilon, float) and epsilon == 0.0:
    return new_carry, greedy
  explore_key, action_key = jax.random.split(key)
  random_actions = jax.random.randint(action_key, greedy.shape, 0,
                                      config.num_actions)
  explore = jax.random.uniform(explore_key, greedy.shape) < epsilon
  return new_carry, jnp.where(explore, random_actions, greedy)


def _unroll(net, params, obs_seq, carry0=None):
  """Scans the network over (B, L+1, D).

  carry0: initial LSTM carry; None -> zeros (zero-state burn-in). With
  stored-state replay it is the carry recorded with the window's first
  transition.

  Returns (q (B, L+1, A), logits (B, L+1, A, N)).
  """
  batch = obs_seq.shape[0]
  if carry0 is None:
    carry0 = net.initial_state(None, (batch,))

  def body(carry, x_t):
    carry, (q, logits) = net.apply(params, carry, x_t)
    return carry, (q, logits)

  _, (q, logits) = jax.lax.scan(body, carry0,
                                jnp.swapaxes(obs_seq, 0, 1))
  return jnp.swapaxes(q, 0, 1), jnp.swapaxes(logits, 0, 1)


def sequence_loss(config: R2d2Config, params, target_params,
                  batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray,
                                                          Dict]:
  """Per-step 1-step double-DQN quantile regression over the unroll.

  batch: obs (B, L+1, D), action/reward/terminal (B, L+1),
  step_weight (B, L). Steps < burn_in contribute no loss (LSTM warm-up).
  """
  net = make_network(config)
  obs = batch['obs']
  seq_len = obs.shape[1] - 1

  carry0 = None
  if config.stored_state and 'start_state' in batch:
    carry0 = vec_to_carry(jax.lax.stop_gradient(batch['start_state']))
  q_online, logits_online = _unroll(net, params, obs, carry0)
  q_target, logits_target = _unroll(net, target_params, obs, carry0)

  # theta(s_t, a_t) for t in [0, L).
  theta = jnp.take_along_axis(
      logits_online[:, :-1],
      batch['action'][:, :-1, None, None], axis=2)[:, :, 0, :]  # (B,L,N)

  # Double DQN target: a* from the ONLINE net at t+1, value from target.
  best = jnp.argmax(q_online[:, 1:], axis=-1)  # (B, L)
  target_theta = jnp.take_along_axis(
      logits_target[:, 1:], best[:, :, None, None], axis=2)[:, :, 0, :]
  not_done = 1.0 - batch['terminal'][:, :-1].astype(jnp.float32)
  target = (batch['reward'][:, :-1, None] +
            config.gamma * not_done[:, :, None] * target_theta)
  target = jax.lax.stop_gradient(target)

  u = target[..., None, :] - theta[..., :, None]  # (B, L, N, N)
  abs_u = jnp.abs(u)
  kappa = config.kappa
  huber = jnp.where(abs_u <= kappa, 0.5 * u ** 2,
                    kappa * (abs_u - 0.5 * kappa))
  tau = (jnp.arange(config.num_atoms, dtype=jnp.float32) + 0.5
         ) / config.num_atoms
  qr_weight = jnp.abs(tau[None, None, :, None] -
                      (u < 0).astype(jnp.float32))
  per_step = jnp.sum(jnp.mean(qr_weight * huber / kappa, axis=3),
                     axis=2)  # (B, L)

  w = batch['step_weight']
  if config.burn_in:
    w = w * (jnp.arange(seq_len) >= config.burn_in).astype(jnp.float32)
  loss = (jnp.sum(jnp.where(w > 0, per_step * w, 0.0)) /
          jnp.maximum(jnp.sum(w), 1.0))
  metrics = {
      'loss': loss,
      'mean_q': jnp.mean(q_online),
      'valid_frac': jnp.mean((w > 0).astype(jnp.float32)),
      # Sequence priority: eta*max + (1-eta)*mean of the per-step losses
      # over the trainable (post-burn-in) window -- the R2D2 recipe.
      'per_sample_loss': jax.lax.stop_gradient(
          config.priority_eta * jnp.max(
              jnp.where(w > 0, per_step, 0.0), axis=1) +
          (1.0 - config.priority_eta) *
          jnp.sum(jnp.where(w > 0, per_step, 0.0), axis=1) /
          jnp.maximum(jnp.sum(w > 0, axis=1), 1.0)),
  }
  return loss, metrics


def train_step(config: R2d2Config, state: LearnerState,
               batch: Dict[str, jnp.ndarray],
               grad_transform=None) -> Tuple[LearnerState, Dict]:
  grads, metrics = jax.grad(
      lambda p: sequence_loss(config, p, state.target_params, batch),
      has_aux=True)(state.params)
  if grad_transform is not None:
    grads = grad_transform(grads)
  updates, opt_state = make_optimizer(config).update(grads, state.opt_state,
                                                     state.params)
  params = optax.apply_updates(state.params, updates)
  train_steps = state.train_steps + 1
  sync = (train_steps % config.target_update_period) == 0
  target_params = jax.lax.cond(sync, lambda: params,
                               lambda: state.target_params)
  return LearnerState(params=params, target_params=target_params,
                      opt_state=opt_state, train_steps=train_steps), metrics
