"""Public re-export of the edge-sharding axis context.

Lives in ``.._axis_context`` (a dependency-free root module) so that
``data.graph`` / ``ops.segment`` can import it without triggering this
package's heavier imports.  See that module's docstring for the design.
"""
from .._axis_context import (  # noqa: F401
    cross_shard_max,
    cross_shard_min,
    cross_shard_sum,
    edge_axis,
    edge_shard_offset,
    edge_sharding,
)
