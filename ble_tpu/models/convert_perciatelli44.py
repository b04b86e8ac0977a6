"""Offline converter: perciatelli44.pb (frozen TF1 graph) -> flax msgpack.

The reference runs the frozen TF1 session at inference time
(``agents/perciatelli44.py:26-40``) or reloads its weights into flax
per-process (``agents/quantile_agent.py:202-254``). Here conversion is a
one-time offline step producing a msgpack our flax QuantileNetwork loads
directly, so the runtime has no TF dependency.

Usage:
  python -m ble_tpu.models.convert_perciatelli44 perciatelli44.pb out.msgpack
"""

import sys


def convert(pb_path: str, out_path: str) -> None:
  import flax
  import numpy as np
  import tensorflow as tf

  with open(pb_path, 'rb') as f:
    serialized = f.read()

  graph_def = tf.compat.v1.GraphDef()
  graph_def.ParseFromString(serialized)
  # Import into an explicit Graph: under TF2 eager semantics,
  # import_graph_def after Session() lands in a different default graph
  # and every tensor lookup KeyErrors.
  graph = tf.compat.v1.Graph()
  with graph.as_default():
    tf.compat.v1.import_graph_def(graph_def, name='')

  # The frozen graph stores the online tower as
  # Online/fully_connected[_k]/{weights,biases} (quantile_agent.py:216-252).
  params = {}
  with tf.compat.v1.Session(graph=graph) as sess:
    for i in range(8):
      suffix = '' if i == 0 else f'_{i}'
      scope = f'Online/fully_connected{suffix}'
      kernel = sess.run(graph.get_tensor_by_name(f'{scope}/weights:0'))
      bias = sess.run(graph.get_tensor_by_name(f'{scope}/biases:0'))
      params[f'Dense_{i}'] = {'kernel': np.asarray(kernel),
                              'bias': np.asarray(bias)}

  tree = {'params': params}
  with open(out_path, 'wb') as f:
    f.write(flax.serialization.msgpack_serialize(tree))
  print(f'Wrote {out_path}')


if __name__ == '__main__':
  if len(sys.argv) != 3:
    print(__doc__)
    sys.exit(1)
  convert(sys.argv[1], sys.argv[2])
