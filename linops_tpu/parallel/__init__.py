"""Distributed operator layer: device meshes, sharded operators, and
partitioned apply (SURVEY.md §2.3 — new first-class component with no
reference counterpart)."""

from .mesh import make_mesh, replicated, row_sharding, P, NamedSharding, Mesh
from .sharded import shard_operator, operator_sharding_rule
from .init import initialize_distributed, runtime_info
from .halo import HaloPartitionedOperator, banded_partition
from .halo2d import HaloStencil2DOperator, stencil_partition_2d, make_mesh2d
from .introspect import collective_counts, hlo_collective_counts
from .scaling_bench import scaling_report

__all__ = [
    "make_mesh",
    "make_mesh2d",
    "HaloStencil2DOperator",
    "stencil_partition_2d",
    "replicated",
    "row_sharding",
    "P",
    "NamedSharding",
    "Mesh",
    "shard_operator",
    "operator_sharding_rule",
    "initialize_distributed",
    "runtime_info",
    "HaloPartitionedOperator",
    "banded_partition",
    "collective_counts",
    "hlo_collective_counts",
    "scaling_report",
]
