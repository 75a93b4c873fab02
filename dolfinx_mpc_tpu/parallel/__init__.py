"""Distributed (multi-device) execution: SPMD sharded assembly + solve.

See spmd.py for the mapping from the reference's MPI domain decomposition
(SURVEY.md §2.3) to jax.sharding collectives.
"""

from .spmd import ShardedLinearProblem, make_device_mesh

__all__ = ["ShardedLinearProblem", "make_device_mesh"]
