"""Workflow / parallelism engines (reference core/workflow.py:35-326).

The reference's render engines farm picklable pixel tasks to forked
processes; here the same ``RenderEngine`` contract is kept for API parity
while the real parallel axis is the ray/tile batch sharded over a
``jax.sharding.Mesh`` (SURVEY.md §2.12).
"""

from .engine import (
    MulticoreEngine,
    RenderEngine,
    SerialEngine,
    ShardedEngine,
    default_mesh,
    render_batch,
    render_loss_and_grads,
)

__all__ = [
    "RenderEngine",
    "SerialEngine",
    "MulticoreEngine",
    "ShardedEngine",
    "default_mesh",
    "render_batch",
    "render_loss_and_grads",
]
