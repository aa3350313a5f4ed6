from raft_tpu.parallel.mesh import (make_mesh, shard_bucket,
                                    sharded_device_step)

__all__ = ["make_mesh", "shard_bucket", "sharded_device_step"]
