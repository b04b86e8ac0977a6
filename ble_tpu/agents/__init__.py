"""Agent registry: importing this package registers all built-in agents
(reference agents/agent_registry.py:40-75)."""

from ble_tpu.agents import base
from ble_tpu.agents import mlp_agent  # noqa: F401
from ble_tpu.agents import perciatelli44  # noqa: F401
from ble_tpu.agents import quantile_agent  # noqa: F401
from ble_tpu.agents import random_walk  # noqa: F401
from ble_tpu.agents import station_seeker  # noqa: F401

available_agents = base.available_agents
create_agent = base.create_agent
