from .mesh import (  # noqa: F401
    MESH_AXES,
    batch_sharding,
    make_mesh,
    shard_batch,
    snapshot_sharding,
    tm_snapshot_sharding,
)
from .runner import enhance_files, enhance_files_pipelined, run_batch  # noqa: F401
