"""Round-trip tests for the trained-model converters (VERDICT item 10).

The real blobs (perciatelli44.pb, offlineskies22_decoder.msgpack) are not
available in this environment, so these tests construct synthetic
artifacts with the exact upstream layouts and prove the converters/loaders
reproduce the source model's outputs:

  * perciatelli44: build a frozen TF1 GraphDef with the reference's
    variable naming (Online/fully_connected[_k]/{weights,biases},
    reference agents/quantile_agent.py:216-252), run
    convert_perciatelli44, load the msgpack, and compare the flax
    QuantileNetwork forward pass against the TF session to float
    tolerance.
  * offlineskies22: initialize the REFERENCE flax Decoder
    (reference generative/vae.py:134-190, imported via ble_tpu.compat),
    serialize its params with flax msgpack exactly like the upstream blob,
    load through ble_tpu.models.loader, and compare ble_tpu's decode
    against the reference decode on the same latent.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from ble_tpu.agents import networks
from ble_tpu.models import convert_perciatelli44
from ble_tpu.models import loader


def _build_frozen_quantile_graph(obs_dim, hidden, num_layers, out_dim,
                                 seed=0):
  """Frozen TF1 graph mirroring perciatelli44's Online tower naming."""
  tf1 = tf.compat.v1
  rng = np.random.RandomState(seed)
  graph = tf1.Graph()
  with graph.as_default():
    x = tf1.placeholder(tf.float32, [None, obs_dim], name='observation')
    h = x
    with tf1.variable_scope('Online'):
      dims = [obs_dim] + [hidden] * (num_layers - 1) + [out_dim]
      for i in range(num_layers):
        scope = 'fully_connected' + ('' if i == 0 else f'_{i}')
        with tf1.variable_scope(scope):
          w = tf1.get_variable(
              'weights', initializer=rng.randn(
                  dims[i], dims[i + 1]).astype(np.float32) * 0.1)
          b = tf1.get_variable(
              'biases', initializer=rng.randn(
                  dims[i + 1]).astype(np.float32) * 0.1)
        h = tf1.matmul(h, w) + b
        if i < num_layers - 1:
          h = tf.nn.relu(h)
      out = tf1.identity(h, name='q_values')

    with tf1.Session(graph=graph) as sess:
      sess.run(tf1.global_variables_initializer())
      frozen = tf1.graph_util.convert_variables_to_constants(
          sess, graph.as_graph_def(), ['Online/q_values'])
      probe = rng.randn(4, obs_dim).astype(np.float32)
      expected = sess.run(out, {x: probe})
  return frozen, probe, expected


def test_perciatelli_converter_roundtrip():
  num_layers, hidden, num_atoms, num_actions = 8, 32, 5, 3
  obs_dim = 24
  frozen, probe, expected = _build_frozen_quantile_graph(
      obs_dim, hidden, num_layers, num_actions * num_atoms)

  with tempfile.TemporaryDirectory() as tmp:
    pb = os.path.join(tmp, 'perciatelli44.pb')
    out = os.path.join(tmp, 'perciatelli44.msgpack')
    with open(pb, 'wb') as f:
      f.write(frozen.SerializeToString())

    convert_perciatelli44.convert(pb, out)
    params = loader.load_perciatelli44(out)

  net = networks.QuantileNetwork(num_actions=num_actions,
                                 num_layers=num_layers,
                                 hidden_units=hidden, num_atoms=num_atoms)
  q_values, logits = net.apply(params, jnp.asarray(probe))
  got = np.asarray(logits).reshape(probe.shape[0], -1)
  np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
  # q_values are the atom means of the same logits.
  np.testing.assert_allclose(
      np.asarray(q_values),
      expected.reshape(-1, num_actions, num_atoms).mean(-1),
      rtol=1e-5, atol=1e-5)


def test_offlineskies_msgpack_layout_and_decode():
  from ble_tpu import compat
  if not compat.reference_available():
    pytest.skip('reference checkout unavailable')
  compat.enable_reference_imports()
  import flax
  from balloon_learning_environment.generative import vae as ref_vae
  from ble_tpu.generative import vae as my_vae

  key = jax.random.PRNGKey(4)
  ref_decoder = ref_vae.Decoder()
  ref_params = ref_decoder.init(key, jnp.zeros((64,)))

  with tempfile.TemporaryDirectory() as tmp:
    path = os.path.join(tmp, 'offlineskies22_decoder.msgpack')
    with open(path, 'wb') as f:
      f.write(flax.serialization.msgpack_serialize(
          flax.serialization.to_state_dict(ref_params)))
    loaded = loader.load_offlineskies22(path)

  z = jax.random.normal(jax.random.PRNGKey(9), (64,))
  ref_field = np.asarray(ref_decoder.apply(ref_params, z))
  my_field = np.asarray(my_vae.Decoder().apply(loaded, z))

  assert my_field.shape == ref_field.shape, (my_field.shape,
                                             ref_field.shape)
  np.testing.assert_allclose(my_field, ref_field, rtol=1e-4, atol=1e-4)
