import time, functools
import jax, jax.numpy as jnp

def run_variant(variant):
    import importlib
    import ble_tpu.env.env, ble_tpu.env.features, ble_tpu.env.wind_gp, ble_tpu.env.wind_field, ble_tpu.env.balloon, ble_tpu.env.pressure_range
    for m in [ble_tpu.env.wind_gp, ble_tpu.env.wind_field, ble_tpu.env.pressure_range, ble_tpu.env.features, ble_tpu.env.balloon, ble_tpu.env.env]:
        importlib.reload(m)
    from ble_tpu.env import env as env_lib, features as features_lib, wind_gp, wind_field as wf, balloon as balloon_lib, pressure_range
    E, T = 4096, 32
    if variant == "nofeat":
        features_lib.get_features = lambda *a, **k: jnp.zeros((features_lib.NUM_FEATURES,))
        importlib.reload(ble_tpu.env.env); from ble_tpu.env import env as env_lib
    elif variant == "noprange":
        pressure_range.compute_pressure_range = lambda *a, **k: (jnp.float32(5000.0), jnp.float32(14000.0))
        importlib.reload(ble_tpu.env.features); importlib.reload(ble_tpu.env.env)
        from ble_tpu.env import env as env_lib
    elif variant == "nogpquery":
        wind_gp.query = lambda s, q: (jnp.zeros((q.shape[0], 2)), jnp.zeros((q.shape[0],)))
        importlib.reload(ble_tpu.env.features); importlib.reload(ble_tpu.env.env)
        from ble_tpu.env import env as env_lib
    elif variant == "nonoise":
        wf.get_noise = lambda s, *a: (jnp.float32(0.0), jnp.float32(0.0))
        importlib.reload(ble_tpu.env.env); from ble_tpu.env import env as env_lib
    elif variant == "nophys":
        balloon_lib.simulate_step = lambda p, a, s, u, v, act, **k: s.replace(time_s=s.time_s+180, time_elapsed_s=s.time_elapsed_s+180)
        importlib.reload(ble_tpu.env.env); from ble_tpu.env import env as env_lib
    elif variant == "noambient":
        features_lib.ambient_features = lambda *a: jnp.zeros((16,))
        importlib.reload(ble_tpu.env.env); from ble_tpu.env import env as env_lib

    params = env_lib.EnvParams()
    field_fn = env_lib.make_field_fn('static')
    reset_b = jax.jit(jax.vmap(functools.partial(env_lib.reset, params=params, field_fn=field_fn)))
    parts=[]
    for i in range(0, E, 512):
        parts.append(reset_b(jax.random.split(jax.random.PRNGKey(i), 512)))
    state0 = jax.tree.map(lambda *xs: jnp.concatenate(xs), *[p[0] for p in parts])
    def rollout(state, keys):
        def body(carry, key):
            actions = jax.random.randint(key, (E,), 0, 3)
            out = jax.vmap(functools.partial(env_lib.step, params))(carry, actions)
            return out.state, out.reward
        state, rewards = jax.lax.scan(body, state, keys)
        return rewards.sum()
    ro = jax.jit(rollout)
    keys = jax.random.split(jax.random.PRNGKey(7), T)
    float(ro(state0, keys))
    t0 = time.perf_counter()
    float(ro(state0, keys)); float(ro(state0, keys))
    dt = (time.perf_counter()-t0)/2/T*1000
    print(f"VARIANT {variant}: {dt:.2f} ms/step -> {E/dt*1000:.0f} steps/s", flush=True)

import sys
for v in ["base", "nofeat", "nophys", "nonoise", "nogpquery", "noprange", "noambient"]:
    run_variant(v)
