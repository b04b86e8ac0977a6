"""Example: evaluate StationSeeker and visualize a flight path.

Script equivalent of the reference's colab notebooks (wind-field
visualization, eval summarizer, flight-path viewer; SURVEY.md 2.5
"Colabs / media"). Produces PNGs under --output_dir.

  python -m examples.evaluate_and_visualize --output_dir /tmp/ble_viz
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.env import env as env_lib
from ble_tpu.train import eval_lib


def plot_wind_field(field, path):
  import matplotlib
  matplotlib.use('Agg')
  import matplotlib.pyplot as plt
  fig, axes = plt.subplots(2, 5, figsize=(18, 7))
  f = np.asarray(field)
  for p in range(10):
    ax = axes[p // 5, p % 5]
    u, v = f[:, :, p, 0, 0], f[:, :, p, 0, 1]
    ax.quiver(u.T, v.T, scale=40)
    ax.set_title(f'pressure level {p} (t=0)')
    ax.set_xticks([])
    ax.set_yticks([])
  fig.suptitle('Wind field slices (u, v) by pressure level')
  fig.tight_layout()
  fig.savefig(path, dpi=100)
  plt.close(fig)


def plot_flight_path(flight_path, radius_km, path):
  import matplotlib
  matplotlib.use('Agg')
  import matplotlib.pyplot as plt
  xs = [p['x'] for p in flight_path]
  ys = [p['y'] for p in flight_path]
  socs = [p['power'] for p in flight_path]
  pressures = [p['pressure'] for p in flight_path]
  fig = plt.figure(figsize=(12, 5))
  ax = fig.add_subplot(1, 2, 1)
  ax.plot(xs, ys, lw=0.8)
  theta = np.linspace(0, 2 * np.pi, 100)
  ax.plot(radius_km * np.cos(theta), radius_km * np.sin(theta), 'r--')
  ax.set_aspect('equal')
  ax.set_title('Top-down flight path')
  ax.set_xlabel('x [km]')
  ax.set_ylabel('y [km]')
  ax2 = fig.add_subplot(2, 2, 2)
  ax2.plot(pressures)
  ax2.invert_yaxis()
  ax2.set_ylabel('pressure [Pa]')
  ax3 = fig.add_subplot(2, 2, 4)
  ax3.plot(socs)
  ax3.set_ylabel('battery soc')
  ax3.set_xlabel('step')
  fig.tight_layout()
  fig.savefig(path, dpi=100)
  plt.close(fig)


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--output_dir', type=str, default='/tmp/ble_viz')
  parser.add_argument('--wind_field', type=str, default='generative')
  parser.add_argument('--steps', type=int, default=240)
  args = parser.parse_args()
  os.makedirs(args.output_dir, exist_ok=True)

  env_params = env_lib.EnvParams()
  if args.wind_field == 'generative':
    from ble_tpu.models import loader
    field_fn = env_lib.make_field_fn('generative',
                                     loader.load_offlineskies22())
  else:
    field_fn = env_lib.make_field_fn('static')

  plot_wind_field(field_fn(jax.random.PRNGKey(1)),
                  os.path.join(args.output_dir, 'wind_field.png'))

  from ble_tpu.agents import station_seeker
  eval_fn = eval_lib.build_eval_fn(
      env_params, field_fn, lambda key: (),
      lambda state, obs, key: (state, station_seeker.pick_action(obs)),
      max_steps=args.steps, record_flight_path=True)
  results = eval_lib.evaluate(eval_fn, [0, 1, 2, 3])
  for r in results:
    print(r)
    plot_flight_path(r.flight_path, env_params.station_keeping_radius_km,
                     os.path.join(args.output_dir, f'flight_{r.seed}.png'))
  print(eval_lib.summarize(results))


if __name__ == '__main__':
  main()
