"""Worker process for the real multi-process jax.distributed test.

Usage: dist_worker.py <coordinator> <nproc> <pid> <reads> <paf> <prefix>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")


def main():
    coordinator, nproc, pid, reads, paf, prefix = sys.argv[1:7]
    import jax
    jax.config.update("jax_platforms", "cpu")

    from raft_tpu.params import AlgoParams
    from raft_tpu.parallel.distributed import run_distributed

    params = AlgoParams(est_cov=10, cov_mul=1.3, repeat_length=2000,
                        interval_length=2000, read_length=4000,
                        flanking_length=300, overlap_length=200,
                        outputfilename=prefix)
    run_distributed(reads, paf, params, coordinator=coordinator,
                    num_processes=int(nproc), process_id=int(pid))
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
