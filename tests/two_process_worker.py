"""One rank of a 2-process CPU ``jax.distributed`` training run.

Launched as a subprocess by tests/test_two_process.py: initialises the
distributed runtime via the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID env contract (hello_tpu.train.cli --distributed reads the
same variables — the reference's MASTER_ADDR/RANK rendezvous,
reference python/MixtureOfExpertsDNNFastDistributed.py:928-930) and drives
the real training CLI over this rank's shard files with gloo cross-process
collectives.
"""

import os
import sys


def main():
    # exactly one CPU device per process, set before jax initialises
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax
    # the axon plugin registers via sitecustomize and overrides the platform
    # in-config; env vars alone do not switch backends
    jax.config.update("jax_platforms", "cpu")
    # a PRIVATE compile cache: the shared /tmp/jax_test_cache can hold AOT
    # entries compiled for a different machine (observed when other
    # processes in the session compile through the remote-TPU tunnel's
    # service) — loading those in a subprocess risks SIGILL, and this test
    # must not skip because of cache pollution
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_two_process_cache")
    from hello_tpu.train import cli
    cli.main(sys.argv[1:])


if __name__ == "__main__":
    main()
