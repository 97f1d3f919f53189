"""GUARD environment suite: engine, world building, task registry."""

from guardx_tpu.envs.engine import Engine, EnvState
from guardx_tpu.envs.world import World, Robot

__all__ = ["Engine", "EnvState", "World", "Robot"]
