"""sigma-VAE trainer for the wind-field generator.

Counterpart of the reference ``generative/learn_wind_field_generator.py``:
same sigma-VAE objective (MSE / 2 sigma^2 + log(sigma sqrt(2 pi)) +
kl_weight * KLD, learn_wind_field_generator.py:118-135), KL-weight
schedules (:59-93), and per-epoch evaluation including the mean-wind-speed
drift diagnostic (:153-200). Differences are TPU-idiomatic: batch-first
network application instead of per-example vmap of grads (identical
mean-gradient semantics), optax instead of flax.optim, and orbax
checkpoints.

Run: python -m ble_tpu.generative.train_vae --epochs 10 --synthetic
"""

import argparse
import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ble_tpu.generative import reservoir as reservoir_lib
from ble_tpu.generative import vae


def constant_schedule(value: float) -> Callable[[int], float]:
  return lambda idx: value


def step_schedule(start_value: float, increment: float, frequency: int,
                  max_val: float) -> Callable[[int], float]:
  return lambda idx: min(start_value * (increment ** (idx // frequency)),
                         max_val)


def kl_divergence(mean, logvar):
  return -0.5 * jnp.sum(1 + logvar - jnp.square(mean) - jnp.exp(logvar),
                        axis=-1)


def make_train_step(optimizer):
  @jax.jit
  def train_step(params, opt_state, batch, rng, kl_weight):
    def loss_fn(params):
      recon, (mean, logvar), sigma = vae.WindFieldVAE().apply(
          params, batch, rng)
      mse = jnp.sum((recon - batch) ** 2, axis=(1, 2, 3, 4, 5)
                    if recon.ndim == 6 else tuple(range(1, recon.ndim)))
      kld = kl_divergence(mean, logvar)
      combined = (0.5 / sigma ** 2 * mse +
                  jnp.log(sigma * jnp.sqrt(2 * jnp.pi)) + kl_weight * kld)
      return jnp.mean(combined), (jnp.mean(mse), jnp.mean(kld), sigma)

    (loss, (mse, kld, sigma)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {'loss': loss, 'mse': mse, 'kld': kld,
                               'sigma': sigma}
  return train_step


@functools.partial(jax.jit, static_argnames=())
def evaluate(params, fields, key):
  """Reconstruction + generation diagnostics
  (learn_wind_field_generator.py:153-200)."""
  model = vae.WindFieldVAE(reparameterize=False)
  recon, (mean, logvar), sigma = model.apply(params, fields, key)
  mse = jnp.mean(jnp.sum((recon - fields) ** 2,
                         axis=tuple(range(1, recon.ndim))))
  kld = jnp.mean(kl_divergence(mean, logvar))

  # Mean-wind-speed drift of free generations vs the dataset.
  z = jax.random.normal(key, (fields.shape[0], vae.NUM_LATENTS))
  generated = vae.Decoder().apply(
      {'params': params['params']['decoder']}, z)
  gen_speed = jnp.mean(jnp.sqrt(jnp.sum(generated ** 2, axis=-1)))
  data_speed = jnp.mean(jnp.sqrt(jnp.sum(fields ** 2, axis=-1)))
  return {'eval_mse': mse, 'eval_kld': kld,
          'gen_mean_speed': gen_speed, 'data_mean_speed': data_speed,
          'sigma': sigma}


def train(reservoir: reservoir_lib.WindFieldReservoir,
          num_epochs: int = 10,
          batches_per_epoch: int = 200,
          batch_size: int = 16,
          learning_rate: float = 1e-4,
          kl_schedule: Callable[[int], float] = constant_schedule(512.0),
          checkpoint_dir: str = None,
          seed: int = 0):
  key = jax.random.PRNGKey(seed)
  init_key, key = jax.random.split(key)
  params = vae.WindFieldVAE().init(
      init_key, reservoir.get_eval_batch(1)[0], jax.random.PRNGKey(0))

  optimizer = optax.adam(learning_rate)
  opt_state = optimizer.init(params)
  train_step = make_train_step(optimizer)

  for epoch in range(num_epochs):
    kl_weight = jnp.float32(kl_schedule(epoch))
    for _ in range(batches_per_epoch):
      key, batch_key, step_key = jax.random.split(key, 3)
      batch = reservoir.get_batch(batch_size, batch_key)
      params, opt_state, metrics = train_step(params, opt_state, batch,
                                              step_key, kl_weight)
    key, eval_key = jax.random.split(key)
    eval_metrics = evaluate(params, reservoir.get_eval_batch(batch_size),
                            eval_key)
    print(f'epoch {epoch}: ' + ' '.join(
        f'{k}={float(v):.4f}' for k, v in {**metrics, **eval_metrics}.items()))
    if checkpoint_dir:
      import orbax.checkpoint as ocp
      path = os.path.join(os.path.abspath(checkpoint_dir), f'vae_{epoch}')
      ocp.StandardCheckpointer().save(path, params, force=True)

  return params


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--epochs', type=int, default=10)
  parser.add_argument('--batches_per_epoch', type=int, default=200)
  parser.add_argument('--batch_size', type=int, default=16)
  parser.add_argument('--learning_rate', type=float, default=1e-4)
  parser.add_argument('--dataset_path', type=str, default=None)
  parser.add_argument('--synthetic', action='store_true')
  parser.add_argument('--checkpoint_dir', type=str, default=None)
  args = parser.parse_args()

  if args.synthetic or not args.dataset_path:
    reservoir = reservoir_lib.SyntheticWindFieldReservoir()
  else:
    reservoir = reservoir_lib.DatasetWindFieldReservoir(args.dataset_path)

  train(reservoir, num_epochs=args.epochs,
        batches_per_epoch=args.batches_per_epoch,
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        checkpoint_dir=args.checkpoint_dir)


if __name__ == '__main__':
  main()
