"""Flight-path rendering (host side).

Counterpart of the reference ``env/rendering/renderer.py:26-62`` +
``matplotlib_renderer.py:35-207``: a Renderer ABC and a matplotlib
implementation drawing the 3-D flight path, battery SOC trace, and a 2-D
top-down inset with the station-keeping radius. The renderer consumes
host-fetched `EnvState` snapshots (one balloon; pick an index out of a
batch first), so it never touches the device hot path.
"""

import abc
from typing import Optional, Sequence, Union

import numpy as np


class Renderer(abc.ABC):
  """Render lifecycle (reference renderer.py:26-62)."""

  @abc.abstractmethod
  def reset(self) -> None:
    ...

  @abc.abstractmethod
  def step(self, env_state) -> None:
    ...

  @abc.abstractmethod
  def render(self, mode: str):
    ...

  @property
  @abc.abstractmethod
  def render_modes(self) -> Sequence[str]:
    ...


class MatplotlibRenderer(Renderer):
  """3-D path + power + top-down inset (matplotlib_renderer.py:35-207)."""

  def __init__(self, station_keeping_radius_km: float = 50.0):
    self._radius_km = station_keeping_radius_km
    self.reset()

  def reset(self) -> None:
    self._xs, self._ys, self._pressures, self._socs = [], [], [], []

  def step(self, env_state) -> None:
    b = env_state.balloon
    self.add_point(float(np.asarray(b.x_m)) / 1000.0,
                   float(np.asarray(b.y_m)) / 1000.0,
                   float(np.asarray(b.pressure_pa)),
                   float(np.asarray(b.battery_charge_j)) / (3058.56 * 3600.0))

  def add_point(self, x_km: float, y_km: float, pressure_pa: float,
                soc: float) -> None:
    """Appends one already-extracted track point (used by the training
    harness, which streams env 0's track out of the device scan)."""
    self._xs.append(x_km)
    self._ys.append(y_km)
    self._pressures.append(pressure_pa)
    self._socs.append(soc)

  @property
  def render_modes(self) -> Sequence[str]:
    # 'tensorboard' mirrors the reference's summary-image mode
    # (matplotlib_renderer.py:109-121): a (1, H, W, 3) float batch in
    # [0, 1] ready for a summary writer's image() call.
    return ['human', 'rgb_array', 'tensorboard']

  def render(self, mode: str = 'human') -> Optional[np.ndarray]:
    if mode not in self.render_modes:
      raise ValueError(f'Unsupported render mode {mode}')
    import matplotlib
    if mode != 'human':
      matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 5))
    ax3d = fig.add_subplot(1, 2, 1, projection='3d')
    # Altitude proxy: negated pressure so up means up.
    ax3d.plot(self._xs, self._ys, [-p for p in self._pressures])
    ax3d.set_xlabel('x [km]')
    ax3d.set_ylabel('y [km]')
    ax3d.set_zlabel('-pressure [Pa]')

    ax2d = fig.add_subplot(2, 2, 2)
    ax2d.plot(self._xs, self._ys, lw=0.8)
    theta = np.linspace(0, 2 * np.pi, 100)
    ax2d.plot(self._radius_km * np.cos(theta),
              self._radius_km * np.sin(theta), 'r--', lw=0.8)
    ax2d.set_aspect('equal')
    ax2d.set_xlabel('x [km]')
    ax2d.set_ylabel('y [km]')

    ax_p = fig.add_subplot(2, 2, 4)
    ax_p.plot(self._socs)
    ax_p.set_ylim(0, 1)
    ax_p.set_xlabel('step')
    ax_p.set_ylabel('battery soc')
    fig.tight_layout()

    if mode == 'human':
      plt.show()
      plt.close(fig)
      return None
    fig.canvas.draw()
    buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    image = buf.reshape(h, w, 4)[:, :, :3].copy()
    plt.close(fig)
    if mode == 'tensorboard':
      return image[np.newaxis].astype(np.float32) / 255.0
    return image
