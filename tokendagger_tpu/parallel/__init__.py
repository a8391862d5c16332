"""Distribution layer: device meshes, sharded tokenization, psum counters.

The reference's only parallelism is thread-level data parallelism over
independent texts (/root/reference/tokendagger/wrapper.py:234-235 +
GIL release at /root/reference/src/py_binding.cpp:26,32,41). The TPU-native
equivalent designed here is SPMD data parallelism over a `jax.sharding.Mesh`:

* packed pretoken buffers are sharded row-wise across the ``data`` axis,
* rank/pair tables are replicated on every device (a few MB),
* each device runs the merge loop independently via ``shard_map`` (no
  cross-device sync inside the hot loop),
* aggregate statistics (bytes, tokens) are reduced with ``psum`` over ICI.
"""

from .mesh import (  # noqa: F401
    get_mesh,
    get_mesh_2d,
    shard_merge_rows,
    sharded_encode_step,
    sharded_encode_step_2d,
)
