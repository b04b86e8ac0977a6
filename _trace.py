import functools, glob, gzip, json, collections
import jax, jax.numpy as jnp
from ble_tpu.env import env as env_lib
from ble_tpu.generative import vae

n, steps = 4096, 32
env_params = env_lib.EnvParams()
field_fn = env_lib.make_field_fn('generative', vae.init_decoder_params(jax.random.PRNGKey(0)))
reset_b = jax.jit(jax.vmap(functools.partial(env_lib.reset, params=env_params, field_fn=field_fn)))
state, _ = reset_b(jax.random.split(jax.random.PRNGKey(42), n))
jax.block_until_ready(state.steps)

def rollout(state, key):
    def body(carry, k):
        actions = jax.random.randint(k, (n,), 0, 3)
        out = env_lib.step_batched(env_params, carry, actions)
        return out.state, out.reward.mean()
    _, r = jax.lax.scan(body, state, jax.random.split(key, steps))
    return r.sum()

fn = jax.jit(rollout)
fn(state, jax.random.PRNGKey(0)).block_until_ready()  # compile
import shutil, os
shutil.rmtree('/tmp/jaxtrace', ignore_errors=True)
with jax.profiler.trace('/tmp/jaxtrace', create_perfetto_trace=True):
    fn(state, jax.random.PRNGKey(1)).block_until_ready()

files = glob.glob('/tmp/jaxtrace/**/*perfetto*', recursive=True)
print('perfetto files:', files)
for f in files:
    opener = gzip.open if f.endswith('.gz') else open
    with opener(f, 'rt') as fh:
        data = json.load(fh)
    events = data if isinstance(data, list) else data.get('traceEvents', [])
    dur = collections.Counter()
    for e in events:
        if e.get('ph') == 'X' and 'dur' in e:
            dur[e.get('name', '?')[:60]] += e['dur']
    total = sum(dur.values())
    print('total traced us:', total)
    for name, d in dur.most_common(25):
        print(f'  {d/1000:9.2f} ms  {name}')
