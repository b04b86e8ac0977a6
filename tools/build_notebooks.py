"""Builds + executes the wind-field and flight-path notebooks.

Counterparts of the reference colabs
(`balloon_learning_environment/colab/BLE_Generative_Wind_Field.ipynb`
and `BLE_view_flight_paths.ipynb`); the executed notebooks land in
colab/ with real figures, and the animations are written to generated/
(the reference ships `generated/wind_field.mp4`, `multi_balloon.mp4`,
and `docs/imgs/station_keeping.gif`; no ffmpeg in this container, so
both animations are GIFs via PillowWriter).

  PYTHONPATH= JAX_PLATFORMS=cpu python tools/build_notebooks.py
"""

import nbformat as nbf
from nbclient import NotebookClient

MD = nbf.v4.new_markdown_cell
CODE = nbf.v4.new_code_cell


def wind_field_nb():
  nb = nbf.v4.new_notebook()
  nb.cells = [
      MD("# Generative wind-field visualization\n\n"
         "Samples the wind-field VAE, shows every pressure level's flow, "
         "animates the field over its 48-hour time axis, and plots the "
         "simplex noise that perturbs forecasts into ground truth.\n\n"
         "Notebook equivalent of the reference "
         "`colab/BLE_Generative_Wind_Field.ipynb`; the animation is "
         "saved to `generated/wind_field.gif` (the reference ships "
         "`generated/wind_field.mp4`)."),
      CODE(
          "%matplotlib inline\n"
          "import os, sys\n"
          "if not os.path.exists('ble_tpu'):\n"
          "    os.chdir('..')  # Run from colab/ or the repo root.\n"
          "sys.path.insert(0, os.getcwd())\n"
          "import jax, jax.numpy as jnp, numpy as np\n"
          "import matplotlib.pyplot as plt\n"
          "from matplotlib import animation\n\n"
          "from ble_tpu.env import wind_field\n"
          "from ble_tpu.generative import vae\n"
          "from ble_tpu.models import loader\n\n"
          "decoder_params = loader.load_offlineskies22()\n"
          "field = np.asarray(vae.sample_field(decoder_params, "
          "jax.random.PRNGKey(0)))\n"
          "print('field', field.shape, "
          "'(lat, lng, pressure, time, components)')\n"
          "print('speed range m/s:', float(np.hypot(field[..., 0], "
          "field[..., 1]).min()),\n"
          "      float(np.hypot(field[..., 0], field[..., 1]).max()))"),
      MD("## All 10 pressure levels at t = 0\n\n"
         "Flow arrows over the ±500 km domain; color = wind speed. The "
         "VAE decoder is curl-based, so each level is incompressible by "
         "construction (`ble_tpu/generative/vae.py`, reference "
         "`generative/vae.py:160-186`)."),
      CODE(
          "levels_kpa = np.linspace(5, 14, 10)\n"
          "coords = np.linspace(-500, 500, 21)\n"
          "fig, axes = plt.subplots(2, 5, figsize=(18, 7), sharex=True, "
          "sharey=True)\n"
          "for p in range(10):\n"
          "    ax = axes[p // 5, p % 5]\n"
          "    u, v = field[:, :, p, 0, 0].T, field[:, :, p, 0, 1].T\n"
          "    speed = np.hypot(u, v)\n"
          "    ax.quiver(coords, coords, u, v, speed, cmap='viridis', "
          "scale=160)\n"
          "    ax.set_title(f'{levels_kpa[p]:.0f} kPa')\n"
          "fig.suptitle('Decoded wind field, all pressure levels (t=0)')\n"
          "fig.tight_layout(); plt.show()"),
      MD("## 48-hour animation at one pressure level\n\n"
         "The field's 9 time slices span 0–48 h; queries between slices "
         "interpolate linearly and reflect (\"boomerang\") past the "
         "horizon (reference `grid_based_wind_field.py:134-186`)."),
      CODE(
          "level = 5\n"
          "fig, ax = plt.subplots(figsize=(6, 6))\n"
          "u0, v0 = field[:, :, level, 0, 0].T, field[:, :, level, 0, 1].T\n"
          "q = ax.quiver(coords, coords, u0, v0, np.hypot(u0, v0), "
          "cmap='viridis', scale=160)\n"
          "title = ax.set_title('t = 0 h')\n"
          "ax.set_xlabel('x [km]'); ax.set_ylabel('y [km]')\n\n"
          "def frame(i):\n"
          "    t = i / 2.0  # 0.5 h per frame over 0..48 h.\n"
          "    ti = t / 6.0  # slice coordinate (6 h per slice)\n"
          "    lo = min(int(ti), 7); w = ti - lo\n"
          "    u = (1-w)*field[:, :, level, lo, 0].T + "
          "w*field[:, :, level, lo+1, 0].T\n"
          "    v = (1-w)*field[:, :, level, lo, 1].T + "
          "w*field[:, :, level, lo+1, 1].T\n"
          "    q.set_UVC(u, v, np.hypot(u, v))\n"
          "    title.set_text(f't = {t:.1f} h')\n"
          "    return q,\n\n"
          "anim = animation.FuncAnimation(fig, frame, frames=96, "
          "interval=80)\n"
          "os.makedirs('generated', exist_ok=True)\n"
          "anim.save('generated/wind_field.gif', "
          "writer=animation.PillowWriter(fps=12))\n"
          "print('saved generated/wind_field.gif')\n"
          "plt.show()"),
      MD("## Simplex wind noise\n\n"
         "Ground truth = forecast + OpenSimplex-4D noise (2 components × "
         "5 harmonics; reference `env/simplex_wind_noise.py`). Left: a "
         "3000 km transect of both components. Right: a 2-D slice of "
         "the u-noise."),
      CODE(
          "state = wind_field.make_state(jnp.asarray(field), "
          "jax.random.PRNGKey(3))\n"
          "xs = np.arange(0.0, 3000.0, 10.0)\n"
          "nu, nv = jax.vmap(lambda x: wind_field.get_noise(\n"
          "    state, x * 1000.0, 0.0, 9000.0, 0.0))(jnp.asarray(xs))\n"
          "g = np.linspace(-1500, 1500, 60)\n"
          "nn = jax.vmap(jax.vmap(lambda x, y: wind_field.get_noise(\n"
          "    state, x * 1000.0, y * 1000.0, 9000.0, 0.0)[0]))(\n"
          "    *jnp.meshgrid(jnp.asarray(g), jnp.asarray(g)))\n"
          "fig, (a1, a2) = plt.subplots(1, 2, figsize=(13, 4))\n"
          "a1.plot(xs, np.asarray(nu), label='u noise')\n"
          "a1.plot(xs, np.asarray(nv), label='v noise')\n"
          "a1.set_xlabel('x [km]'); a1.set_ylabel('m/s'); a1.legend()\n"
          "a1.set_title(f'transect; std u = {float(np.std(nu)):.3f} m/s')\n"
          "im = a2.imshow(np.asarray(nn), extent=[-1500, 1500, -1500, "
          "1500], origin='lower', cmap='RdBu_r')\n"
          "a2.set_title('u-noise slice @ 9 kPa, t=0')\n"
          "fig.colorbar(im, ax=a2, label='m/s')\n"
          "plt.show()"),
  ]
  return nb


def flight_path_nb():
  nb = nbf.v4.new_notebook()
  nb.cells = [
      MD("# Flight path viewer\n\n"
         "Rolls out full episodes for several agents on the same seeds "
         "(flight paths recorded on-device by the vectorized evaluator), "
         "renders 3-D trajectories / top-down tracks / altitude & "
         "battery, and animates a station-keeping episode.\n\n"
         "Notebook equivalent of the reference "
         "`colab/BLE_view_flight_paths.ipynb`; the animation is saved "
         "to `generated/station_keeping.gif` (the reference ships "
         "`docs/imgs/station_keeping.gif`)."),
      CODE(
          "%matplotlib inline\n"
          "import os, sys\n"
          "if not os.path.exists('ble_tpu'):\n"
          "    os.chdir('..')  # Run from colab/ or the repo root.\n"
          "sys.path.insert(0, os.getcwd())\n"
          "import jax, jax.numpy as jnp, numpy as np\n"
          "import matplotlib.pyplot as plt\n"
          "from matplotlib import animation\n\n"
          "from ble_tpu.env import env as env_lib\n"
          "from ble_tpu.generative import vae\n"
          "from ble_tpu.models import loader\n"
          "from ble_tpu.train import eval_lib\n"
          "from ble_tpu.train.eval import make_policy_fns\n\n"
          "env_params = env_lib.EnvParams()\n"
          "field_fn = env_lib.make_field_fn(\n"
          "    'generative', loader.load_offlineskies22())\n"
          "seeds = jnp.asarray([0, 1, 2], jnp.int32)\n"
          "runs = {}\n"
          "for agent in ['station_seeker', 'random_walk']:\n"
          "    pinit, pstep = make_policy_fns(agent)\n"
          "    fn = eval_lib.build_eval_fn(env_params, field_fn, pinit, "
          "pstep,\n"
          "                                max_steps=960, "
          "record_flight_path=True)\n"
          "    runs[agent] = jax.tree.map(np.asarray, fn(seeds))\n"
          "    print(agent, 'TWR per seed:', "
          "runs[agent]['time_within_radius'].round(3))"),
      MD("## 3-D trajectories + top-down tracks (seed 0)\n\n"
         "The dashed circle is the 50 km station-keeping radius; flight "
         "path columns are [x km, y km, pressure Pa, superpressure Pa, "
         "elapsed s, battery SOC]."),
      CODE(
          "fig = plt.figure(figsize=(15, 5))\n"
          "colors = {'station_seeker': 'tab:blue', "
          "'random_walk': 'tab:orange'}\n"
          "ax = fig.add_subplot(1, 3, 1, projection='3d')\n"
          "for agent, out in runs.items():\n"
          "    p = out['flight_path'][0]\n"
          "    ax.plot(p[:, 0], p[:, 1], -p[:, 2] / 1000.0, lw=0.8,\n"
          "            color=colors[agent], label=agent)\n"
          "ax.set_xlabel('x [km]'); ax.set_ylabel('y [km]')\n"
          "ax.set_zlabel('-pressure [kPa]'); ax.legend()\n"
          "ax2 = fig.add_subplot(1, 3, 2)\n"
          "th = np.linspace(0, 2 * np.pi, 100)\n"
          "ax2.plot(50 * np.cos(th), 50 * np.sin(th), 'k--', lw=1)\n"
          "for agent, out in runs.items():\n"
          "    p = out['flight_path'][0]\n"
          "    ax2.plot(p[:, 0], p[:, 1], lw=0.8, color=colors[agent])\n"
          "    ax2.plot(p[-1, 0], p[-1, 1], 'o', color=colors[agent])\n"
          "ax2.set_aspect('equal'); ax2.set_title('top-down')\n"
          "ax2.set_xlabel('x [km]'); ax2.set_ylabel('y [km]')\n"
          "ax3 = fig.add_subplot(1, 3, 3)\n"
          "for agent, out in runs.items():\n"
          "    p = out['flight_path'][0]\n"
          "    hours = p[:, 4] / 3600.0\n"
          "    ax3.plot(hours, p[:, 5] * 100.0, color=colors[agent])\n"
          "ax3.set_xlabel('hours'); ax3.set_ylabel('battery SOC [%]')\n"
          "ax3.set_title('power')\n"
          "fig.tight_layout(); plt.show()"),
      MD("## Station-keeping animation (StationSeeker, seed 0)"),
      CODE(
          "p = runs['station_seeker']['flight_path'][0]\n"
          "fig, ax = plt.subplots(figsize=(6, 6))\n"
          "ax.plot(50 * np.cos(th), 50 * np.sin(th), 'k--', lw=1)\n"
          "lim = max(60.0, np.abs(p[:, :2]).max() * 1.05)\n"
          "ax.set_xlim(-lim, lim); ax.set_ylim(-lim, lim)\n"
          "ax.set_xlabel('x [km]'); ax.set_ylabel('y [km]')\n"
          "trail, = ax.plot([], [], lw=1, color='tab:blue')\n"
          "dot, = ax.plot([], [], 'o', color='tab:red')\n"
          "title = ax.set_title('')\n\n"
          "def frame(i):\n"
          "    k = min((i + 1) * 8, len(p))\n"
          "    trail.set_data(p[:k, 0], p[:k, 1])\n"
          "    dot.set_data([p[k - 1, 0]], [p[k - 1, 1]])\n"
          "    title.set_text(f'{p[k - 1, 4] / 3600.0:.1f} h  "
          "SOC {p[k - 1, 5] * 100:.0f}%')\n"
          "    return trail, dot\n\n"
          "anim = animation.FuncAnimation(fig, frame, "
          "frames=len(p) // 8, interval=60)\n"
          "os.makedirs('generated', exist_ok=True)\n"
          "anim.save('generated/station_keeping.gif', "
          "writer=animation.PillowWriter(fps=15))\n"
          "print('saved generated/station_keeping.gif')\n"
          "plt.show()"),
      MD("## Summary"),
      CODE(
          "import pandas as pd\n"
          "rows = []\n"
          "for agent, out in runs.items():\n"
          "    for i, s in enumerate(np.asarray(seeds)):\n"
          "        rows.append({'agent': agent, 'seed': int(s),\n"
          "                     'TWR': round(float("
          "out['time_within_radius'][i]), 3),\n"
          "                     'reward': round(float("
          "out['cumulative_reward'][i]), 1),\n"
          "                     'steps': int(out['final_timestep'][i])})\n"
          "pd.DataFrame(rows)"),
  ]
  return nb


def main():
  import os
  os.environ.setdefault('MPLBACKEND', 'Agg')
  for name, builder in [('wind_field_visualization', wind_field_nb),
                        ('flight_path_viewer', flight_path_nb)]:
    nb = builder()
    client = NotebookClient(nb, timeout=1800, kernel_name='python3',
                            resources={'metadata': {'path': 'colab/'}})
    client.execute()
    path = f'colab/{name}.ipynb'
    nbf.write(nb, path)
    print('executed + wrote', path, flush=True)


if __name__ == '__main__':
  main()
