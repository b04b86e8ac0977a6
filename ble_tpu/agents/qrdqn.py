"""QR-DQN learner: quantile-regression loss, Adam, target network.

On-device counterpart of the reference's Dopamine `JaxQuantileAgent`
wrapper (``agents/quantile_agent.py:40-159``) with the Nature-paper
hyperparameters (agents/configs/quantile.gin): 8x600 MLP, 51 atoms,
gamma=0.993, n-step 5, Adam lr 2e-6 eps 2e-5, update/target periods 4/100.
The same module doubles as the DQN learner (quantile_loss -> mse) --
see dqn.py.
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ble_tpu.agents import networks


@struct.dataclass
class QrDqnConfig:
  num_actions: int = 3
  num_atoms: int = networks.NUM_ATOMS
  num_layers: int = networks.NUM_LAYERS
  hidden_units: int = networks.HIDDEN_UNITS
  gamma: float = 0.993
  learning_rate: float = 2e-6
  adam_eps: float = 2e-5
  target_update_period: int = 100
  update_period: int = 4
  min_replay_history: int = 500
  kappa: float = 1.0  # Huber threshold.
  # Optional warmup+cosine LR schedule (both 0 -> constant learning_rate,
  # the reference setting). The schedule is indexed by learner train_steps.
  lr_warmup_steps: int = 0
  lr_decay_steps: int = 0
  lr_final_scale: float = 1.0


@struct.dataclass
class LearnerState:
  params: Any
  target_params: Any
  opt_state: Any
  train_steps: jnp.ndarray  # int32


def make_network(config: QrDqnConfig) -> networks.QuantileNetwork:
  return networks.QuantileNetwork(
      num_actions=config.num_actions, num_layers=config.num_layers,
      hidden_units=config.hidden_units, num_atoms=config.num_atoms)


def make_optimizer(config: QrDqnConfig):
  lr = config.learning_rate
  if config.lr_warmup_steps or config.lr_decay_steps:
    lr = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=config.learning_rate,
        warmup_steps=max(int(config.lr_warmup_steps), 1),
        decay_steps=max(int(config.lr_decay_steps),
                        int(config.lr_warmup_steps) + 1),
        end_value=config.learning_rate * config.lr_final_scale)
  return optax.adam(lr, eps=config.adam_eps)


def init(key: jax.Array, config: QrDqnConfig, obs_dim: int) -> LearnerState:
  net = make_network(config)
  params = net.init(key, jnp.zeros((obs_dim,)))
  opt_state = make_optimizer(config).init(params)
  return LearnerState(params=params, target_params=params,
                      opt_state=opt_state, train_steps=jnp.int32(0))


def q_values(config: QrDqnConfig, params, obs) -> jnp.ndarray:
  q, _ = make_network(config).apply(params, obs)
  return q


def select_action(config: QrDqnConfig, params, obs, key, epsilon=0.0):
  """Epsilon-greedy argmax over mean quantile values (batched)."""
  q = q_values(config, params, obs)
  greedy = jnp.argmax(q, axis=-1)
  if isinstance(epsilon, float) and epsilon == 0.0:
    return greedy
  explore_key, action_key = jax.random.split(key)
  random_actions = jax.random.randint(action_key, greedy.shape, 0,
                                      config.num_actions)
  explore = jax.random.uniform(explore_key, greedy.shape) < epsilon
  return jnp.where(explore, random_actions, greedy)


def quantile_loss(config: QrDqnConfig, params, target_params,
                  batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
  """Dopamine-style quantile regression Huber loss."""
  net = make_network(config)
  n_atoms = config.num_atoms

  # Target: r^n + gamma^n * theta_target(s', a*), a* greedy under the
  # TARGET network (Dopamine JaxQuantileAgent.target_distribution).
  tq, tlogits = net.apply(target_params, batch['next_obs'])
  best = jnp.argmax(tq, axis=-1)  # (B,)
  target_theta = jnp.take_along_axis(
      tlogits, best[:, None, None], axis=1)[:, 0, :]  # (B, N)
  target = (batch['n_step_reward'][:, None] +
            batch['bootstrap_discount'][:, None] * target_theta)
  target = jax.lax.stop_gradient(target)

  _, logits = net.apply(params, batch['obs'])
  theta = jnp.take_along_axis(
      logits, batch['action'][:, None, None], axis=1)[:, 0, :]  # (B, N)

  # Pairwise TD errors: target sample j vs predicted quantile i.
  u = target[:, None, :] - theta[:, :, None]  # (B, N_pred, N_target)
  kappa = config.kappa
  abs_u = jnp.abs(u)
  huber = jnp.where(abs_u <= kappa, 0.5 * u ** 2,
                    kappa * (abs_u - 0.5 * kappa))
  tau = (jnp.arange(n_atoms, dtype=jnp.float32) + 0.5) / n_atoms  # (N_pred,)
  weight = jnp.abs(tau[None, :, None] - (u < 0).astype(jnp.float32))
  per_sample = jnp.sum(jnp.mean(weight * huber / kappa, axis=2), axis=1)

  w = batch.get('weight', jnp.ones_like(per_sample))
  # Select-then-sum (not per_sample * w): a quarantined sample (w == 0) may
  # carry inf/NaN per-sample loss, and 0 * inf = NaN would defeat the mask.
  loss = (jnp.sum(jnp.where(w > 0, per_sample * w, 0.0)) /
          jnp.maximum(jnp.sum(w), 1.0))
  metrics = {'loss': loss,
             'mean_q': jnp.mean(jnp.mean(theta, axis=-1)),
             'valid_frac': jnp.mean(w),
             # Unweighted per-sample losses for prioritized-replay updates.
             'per_sample_loss': jax.lax.stop_gradient(per_sample)}
  return loss, metrics


def train_step(config: QrDqnConfig, state: LearnerState,
               batch: Dict[str, jnp.ndarray],
               grad_transform=None) -> Tuple[LearnerState, Dict]:
  """One SGD step + periodic target sync.

  `grad_transform` hooks cross-device gradient reduction (e.g.
  jax.lax.pmean over a mesh axis) for the data-parallel learner.
  """
  grads, metrics = jax.grad(
      lambda p: quantile_loss(config, p, state.target_params, batch),
      has_aux=True)(state.params)
  if grad_transform is not None:
    grads = grad_transform(grads)
  updates, opt_state = make_optimizer(config).update(grads, state.opt_state,
                                                     state.params)
  params = optax.apply_updates(state.params, updates)
  train_steps = state.train_steps + 1
  sync = (train_steps % config.target_update_period) == 0
  # lax.cond expresses the periodic sync directly (measured equivalent to
  # a per-leaf select on TPU -- XLA fuses either into the loop body).
  target_params = jax.lax.cond(sync, lambda: params,
                               lambda: state.target_params)
  return LearnerState(params=params, target_params=target_params,
                      opt_state=opt_state, train_steps=train_steps), metrics
